"""PHYRE task-success readout, fold 0 (reference phyre_planning/configs/readout_phyre_params-fold0.py)."""

from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    project = 'SlotFormer-TPU'

    max_epochs = 50
    eval_interval = 2
    n_samples = 25

    optimizer = 'Adam'
    lr = 1e-3
    warmup_steps_pct = 0.1

    dataset = 'phyre_rollout_slots'
    data_root = './data/PHYRE'
    slot_root = 'checkpoints/slotformer_phyre_params-fold0/{}_slots'
    frame_offset = 1
    fps = 1
    n_sample_frames = 11 * fps
    video_len = 11 * fps
    phyre_protocal = 'within'
    phyre_fold = 0
    data_ratio = 0.1
    pos_ratio = 0.2
    reverse_color = True

    train_batch_size = 256  # GLOBAL
    val_batch_size = 512
    num_workers = 8

    model = 'PHYREReadout'
    resolution = (128, 128)

    slot_size = 128
    readout_dict = dict(
        num_slots=8,
        slot_size=slot_size,
        t_pe='sin',
        d_model=slot_size,
        num_layers=4,
        num_heads=8,
        ffn_dim=slot_size * 4,
        norm_first=True,
        sel_slots=[0, 3],
    )

    vqa_loss_w = 1.
