"""SlotFormer on OBJ3D slots (reference video_prediction/configs/slotformer_obj3d_params.py)."""

from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    project = 'SlotFormer-TPU'

    max_epochs = 200  # ~160k steps
    save_interval = 0.25
    eval_interval = 5
    n_samples = 5

    optimizer = 'Adam'
    lr = 2e-4
    warmup_steps_pct = 0.05

    dataset = 'obj3d_slots'
    data_root = './data/OBJ3D'
    slots_root = './data/OBJ3D/obj3d_slots.pkl'
    n_sample_frames = 6 + 10
    frame_offset = 1
    video_len = 50
    train_batch_size = 128  # GLOBAL
    val_batch_size = 256
    num_workers = 8

    model = 'SlotFormer'
    resolution = (64, 64)
    input_frames = 6

    num_slots = 6
    slot_size = 128
    slot_dict = dict(num_slots=num_slots, slot_size=slot_size)
    rollout_dict = dict(
        num_slots=num_slots,
        slot_size=slot_size,
        history_len=input_frames,
        t_pe='sin',
        slots_pe='',
        d_model=slot_size,
        num_layers=4,
        num_heads=8,
        ffn_dim=slot_size * 4,
        norm_first=True,
    )
    dec_dict = dict(
        dec_channels=(128, 64, 64, 64, 64),
        dec_resolution=(8, 8),
        dec_ks=5,
        dec_norm='',
        dec_ckp_path='pretrained/savi_obj3d_params/model.ckpt.pkl',
    )
    loss_dict = dict(
        rollout_len=10,
        use_img_recon_loss=True,
    )

    slot_recon_loss_w = 1.
    img_recon_loss_w = 1.
