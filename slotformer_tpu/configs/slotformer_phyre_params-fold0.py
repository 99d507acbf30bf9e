"""SingleStepSlotFormer on PHYRE fold 0 (reference video_prediction/configs/slotformer_phyre_params-fold0.py)."""

from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    project = 'SlotFormer-TPU'

    max_epochs = 50  # ~300k steps
    save_interval = 0.2
    eval_interval = 5
    n_samples = 25

    optimizer = 'Adam'
    lr = 2e-4
    warmup_steps_pct = 0.05

    dataset = 'phyre_slots'
    data_root = './data/PHYRE'
    slots_root = 'checkpoints/savi_phyre_params-fold0/{}_slots'  # a folder
    frame_offset = 1
    fps = 1
    n_sample_frames = (1 + 10) * fps  # 1 burn-in + 10 rollout
    video_len = 11 * fps
    phyre_protocal = 'within'
    phyre_fold = 0
    data_ratio = 0.1
    pos_ratio = 0.2
    reverse_color = True

    train_batch_size = 64  # GLOBAL
    val_batch_size = 8  # img recon in eval
    num_workers = 8

    model = 'SingleStepSlotFormer'
    resolution = (128, 128)
    input_frames = 1  # condition on the first frame only

    num_slots = 8
    slot_size = 128
    slot_dict = dict(num_slots=num_slots, slot_size=slot_size)
    rollout_dict = dict(
        num_slots=num_slots,
        slot_size=slot_size,
        history_len=input_frames,
        cond_len=6,  # the effective context length
        t_pe='sin',
        slots_pe='',
        d_model=slot_size * 2,
        num_layers=8,
        num_heads=8,
        ffn_dim=slot_size * 2 * 4,
        norm_first=True,
    )
    dec_dict = dict(
        dec_channels=(128, 64, 64, 64, 64),
        dec_resolution=(16, 16),
        dec_ks=5,
        dec_norm='',
        dec_ckp_path='pretrained/savi_phyre_params-fold0/model.ckpt.pkl',
    )
    loss_dict = dict(
        rollout_len=10,
        use_img_recon_loss=False,  # dec_res 16 decoding is memory-intensive
    )

    # RPIN-style temporal loss decay (fold-dependent benefit)
    use_loss_decay = False
    loss_decay_pct = 0.8

    slot_recon_loss_w = 1.
    img_recon_loss_w = 0.1
