"""Real-TPU convergence check: STEVE slot encoder on synthetic 64x64."""

from slotformer_tpu.runtime import BaseParams

SLOT_SIZE = 128


class SlotFormerParams(BaseParams):
    project = 'SlotFormer-TPU'
    model = 'STEVE'

    dataset = 'synthetic'
    num_videos_train = 200
    num_videos_val = 16
    video_len = 20
    resolution = (64, 64)
    obj_size_range = (0.2, 0.35)
    n_sample_frames = 6
    input_frames = 6
    frame_offset = 1
    num_workers = 8
    train_batch_size = 16   # token CE over T*hw*vocab is memory-heavy
    val_batch_size = 16

    slot_dict = dict(num_slots=7, slot_size=SLOT_SIZE,
                     slot_mlp_size=SLOT_SIZE * 2, num_iterations=2)
    enc_dict = dict(enc_channels=(3, 64, 64, 64, 64), enc_ks=5,
                    enc_out_channels=SLOT_SIZE, enc_norm='')
    dvae_dict = dict(down_factor=4, vocab_size=256,
                     dvae_ckp_path='experiments/out_steve64/dvae/latest.ckpt.pkl')
    dec_dict = dict(dec_num_layers=4, dec_num_heads=4, dec_d_model=SLOT_SIZE)
    pred_dict = dict(pred_type='transformer', pred_rnn=True,
                     pred_norm_first=True, pred_num_layers=1,
                     pred_num_heads=4, pred_ffn_dim=SLOT_SIZE * 4,
                     pred_sg_every=None)
    loss_dict = dict(use_img_recon_loss=False)
    token_recon_loss_w = 1.0

    optimizer = 'Adam'
    lr = 1e-4
    dec_lr = 3e-4  # dual LR: token decoder learns faster (reference)
    dec_lr_prefixes = ('trans_decoder',)
    clip_grad = 0.05
    warmup_steps_pct = 0.05
    max_epochs = 60
    save_interval = 1.0
    eval_interval = 10
    print_iter = 20
    n_samples = 0
