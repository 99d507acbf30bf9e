"""Real-TPU convergence check: STEVESlotFormer on extracted STEVE slots."""

from slotformer_tpu.runtime import BaseParams

SLOT_SIZE = 128


class SlotFormerParams(BaseParams):
    project = 'SlotFormer-TPU'
    model = 'STEVESlotFormer'

    dataset = 'synthetic_slots'
    slots_root = 'experiments/out_steve64/steve_slots.pkl'
    num_videos_train = 200
    num_videos_val = 16
    video_len = 20
    resolution = (64, 64)
    obj_size_range = (0.2, 0.35)
    n_sample_frames = 6 + 10
    input_frames = 6
    frame_offset = 1
    load_img = True  # token recon reads gt frames
    num_workers = 8
    train_batch_size = 16
    val_batch_size = 16

    slot_dict = dict(num_slots=7, slot_size=SLOT_SIZE)
    dvae_dict = dict(down_factor=4, vocab_size=256,
                     dvae_ckp_path='experiments/out_steve64/dvae/latest.ckpt.pkl')
    dec_dict = dict(dec_num_layers=4, dec_num_heads=4, dec_d_model=SLOT_SIZE,
                    dec_ckp_path='experiments/out_steve64/steve/latest.ckpt.pkl')
    rollout_dict = dict(num_slots=7, slot_size=SLOT_SIZE, history_len=6,
                        t_pe='sin', slots_pe='', d_model=256, num_layers=4,
                        num_heads=8, ffn_dim=1024, norm_first=True)
    loss_dict = dict(rollout_len=10, use_img_recon_loss=True)
    slot_recon_loss_w = 1.0
    img_recon_loss_w = 1.0  # token CE through frozen dvae+trans_decoder

    optimizer = 'Adam'
    lr = 2e-4
    warmup_steps_pct = 0.05
    max_epochs = 30
    save_interval = 1.0
    eval_interval = 10
    print_iter = 20
    n_samples = 0
