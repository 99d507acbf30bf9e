"""Shared tiny Physion readout config for the end-to-end VQA parity golden.

Used by BOTH sides of the seam:
  * tests/golden/gen_physion_vqa_golden.py runs the reference flow in torch
    (PhysionSlotsLabelDataset + PhysionReadout + the test_physion_vqa
    checkpoint x threshold sweep) on the committed fixture;
  * tests/test_physion_vqa_e2e_parity.py runs cli.convert_reference_ckpt +
    cli.test_physion_vqa on this config and asserts the sweep matches
    cell-for-cell.

cli.test_physion_vqa itself rewrites ``dataset`` to
``physion_slots_label_test`` and ``slots_root`` to
``<dir>/test_slots.pkl`` (mirroring the reference test_physion_vqa.py
__main__), so the values here are the pre-rewrite readout-training ones.
"""

import os

from slotformer_tpu.runtime import BaseParams

_HERE = os.path.dirname(os.path.abspath(__file__))


class SlotFormerParams(BaseParams):
    project = 'golden'
    model = 'PhysionReadout'

    dataset = 'physion_slots_label_readout'
    data_root = os.path.join(_HERE, 'physion_fixture')
    slots_root = os.path.join(_HERE, 'physion_fixture', 'readout_slots.pkl')
    tasks = ['all']
    n_sample_frames = 6
    frame_offset = 1
    video_len = 6
    resolution = (64, 64)
    num_workers = 0
    train_batch_size = 8
    val_batch_size = 8

    readout_dict = dict(num_slots=6, slot_size=16, agg_func='max',
                        feats_dim=16)
    loss_dict = dict(use_img_recon_loss=False)

    optimizer = 'Adam'
    lr = 1e-3
    warmup_steps_pct = 0.1
    max_epochs = 1
