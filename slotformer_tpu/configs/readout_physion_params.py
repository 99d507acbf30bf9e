"""Physion VQA readout (reference physion_vqa/configs/readout_physion_params.py)."""

from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    project = 'SlotFormer-TPU'

    max_epochs = 50
    eval_interval = 5
    n_samples = 8

    optimizer = 'Adam'
    lr = 1e-3
    warmup_steps_pct = 0.  # no warmup

    dataset = 'physion_slots_label_readout'
    data_root = './data/Physion'
    slots_root = 'checkpoints/slotformer_physion_params/readout_slots.pkl'
    tasks = ['all']
    n_sample_frames = 6  # unused for whole-video label items
    frame_offset = 1
    # only the first 75 frames: later rollout frames accumulate artifacts
    video_len = 75
    train_batch_size = 64  # GLOBAL
    val_batch_size = 128
    num_workers = 8

    model = 'PhysionReadout'
    resolution = (128, 128)

    slot_size = 192
    readout_dict = dict(
        num_slots=6,
        slot_size=slot_size,
        agg_func='max',
        feats_dim=slot_size,
    )

    vqa_loss_w = 1.
