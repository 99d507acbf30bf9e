"""STEVE on Physion (reference base_slots/configs/steve_physion_params.py)."""

from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    project = 'SlotFormer-TPU'

    max_epochs = 10  # ~460k steps; training is slow so save often
    save_interval = 0.05
    eval_interval = 1
    n_samples = 8

    optimizer = 'Adam'
    lr = 1e-4        # main STEVE model
    dec_lr = 3e-4    # Transformer decoder group (dual-LR optimizer)
    dec_lr_prefixes = ('trans_decoder',)
    clip_grad = 0.05
    warmup_steps_pct = 0.05

    dataset = 'physion_training'
    data_root = './data/Physion'
    tasks = ['all']
    n_sample_frames = 6
    frame_offset = 1
    video_len = 150
    train_batch_size = 48  # GLOBAL
    val_batch_size = 96
    num_workers = 8

    model = 'STEVE'
    resolution = (128, 128)
    input_frames = n_sample_frames

    slot_size = 192
    slot_dict = dict(
        num_slots=6,  # reasonable scene decomposition on Physion
        slot_size=slot_size,
        slot_mlp_size=slot_size * 2,
        num_iterations=2,
    )
    dvae_dict = dict(
        down_factor=4,
        vocab_size=4096,
        dvae_ckp_path='pretrained/dvae_physion_params/model.ckpt.pkl',
    )
    enc_dict = dict(
        enc_channels=(3, 64, 64, 64, 64),
        enc_ks=5,
        enc_out_channels=slot_size,
        enc_norm='',
    )
    dec_dict = dict(
        dec_num_layers=4,
        dec_num_heads=4,
        dec_d_model=slot_size,
    )
    pred_dict = dict(
        pred_type='transformer',
        pred_rnn=True,
        pred_norm_first=True,
        pred_num_layers=2,
        pred_num_heads=4,
        pred_ffn_dim=slot_size * 4,
        pred_sg_every=None,
    )
    loss_dict = dict(
        use_img_recon_loss=False,  # optional dVAE-decoded img recon loss
    )

    token_recon_loss_w = 1.
    img_recon_loss_w = 1.
