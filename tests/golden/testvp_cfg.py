"""Shared tiny SlotFormer config for the end-to-end test_vp parity golden.

Used by BOTH sides of the seam (VERDICT r4 next-round #4):
  * tests/golden/gen_testvp_golden.py feeds our val loader's batches through
    the reference torch SlotFormer + reference vp_utils metrics;
  * tests/test_testvp_e2e_parity.py runs cli.convert_reference_ckpt +
    cli.test_vp on the same config and asserts the saved per-step metrics
    match the reference flow metric-for-metric.
The synthetic dataset is deterministic given (split, index), so both sides
see identical data without committing video files; the slots live in the
committed tests/golden/testvp_slots.pkl.
"""

import os

from slotformer_tpu.runtime import BaseParams

_HERE = os.path.dirname(os.path.abspath(__file__))


class SlotFormerParams(BaseParams):
    project = 'golden'
    model = 'SlotFormer'

    dataset = 'synthetic_slots'
    slots_root = os.path.join(_HERE, 'testvp_slots.pkl')
    num_videos_val = 10
    num_videos_train = 2
    video_len = 10
    resolution = (16, 16)
    num_objects = 3
    n_sample_frames = 10
    input_frames = 4
    frame_offset = 1
    load_img = True
    load_mask = True
    num_workers = 0
    train_batch_size = 8
    val_batch_size = 8

    slot_dict = dict(num_slots=5, slot_size=16)
    rollout_dict = dict(num_slots=5, slot_size=16, history_len=4, t_pe='sin',
                        slots_pe='', d_model=16, num_layers=2, num_heads=2,
                        ffn_dim=32, norm_first=True)
    dec_dict = dict(dec_channels=(16, 8, 8), dec_resolution=(4, 4), dec_ks=3,
                    dec_norm='', dec_ckp_path='')
    loss_dict = dict(rollout_len=6, use_img_recon_loss=True)
    slot_recon_loss_w = 1.
    img_recon_loss_w = 1.

    optimizer = 'Adam'
    lr = 1e-3
    warmup_steps_pct = 0.1
    max_epochs = 1
