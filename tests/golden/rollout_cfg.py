"""Shared tiny config for the end-to-end rollout-slots CLI parity golden.

Used by BOTH sides of the seam:
  * tests/golden/gen_rollout_golden.py executes the reference
    rollout_clevrer_slots.py ``rollout_video_slots`` flow (torch, offset
    interleaving) on the committed input slots with the testvp golden
    SlotFormer weights;
  * tests/test_rollout_e2e_parity.py runs cli.convert_reference_ckpt +
    cli.rollout_slots --task clevrer on this config and asserts the saved
    pickle matches per video.

frame_offset=3 exercises the reference's phase-interleaved rollout
(rollout_clevrer_slots.py:43-57): three offset streams rolled separately
then re-interleaved. The model is the testvp golden's SlotFormer
(tests/golden/testvp_golden.npz) so no second reference checkpoint needs
committing.
"""

import os

from slotformer_tpu.runtime import BaseParams

_HERE = os.path.dirname(os.path.abspath(__file__))


class SlotFormerParams(BaseParams):
    project = 'golden'
    model = 'SlotFormer'

    dataset = 'synthetic_slots'
    slots_root = os.path.join(_HERE, 'rollout_slots_in.pkl')
    resolution = (16, 16)
    n_sample_frames = 10
    input_frames = 4
    frame_offset = 3
    num_workers = 0
    train_batch_size = 8
    val_batch_size = 8

    slot_dict = dict(num_slots=5, slot_size=16)
    rollout_dict = dict(num_slots=5, slot_size=16, history_len=4, t_pe='sin',
                        slots_pe='', d_model=16, num_layers=2, num_heads=2,
                        ffn_dim=32, norm_first=True)
    dec_dict = dict(dec_channels=(16, 8, 8), dec_resolution=(4, 4), dec_ks=3,
                    dec_norm='', dec_ckp_path='')
    loss_dict = dict(rollout_len=6, use_img_recon_loss=False)
    slot_recon_loss_w = 1.

    optimizer = 'Adam'
    lr = 1e-3
    warmup_steps_pct = 0.1
    max_epochs = 1
