"""Real-TPU convergence check: StoSAVi at CLEVRER scale on synthetic videos."""

from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    project = 'SlotFormer-TPU'
    model = 'StoSAVi'

    dataset = 'synthetic'
    num_videos_train = 2000
    num_videos_val = 128
    video_len = 20
    resolution = (64, 64)
    # larger, more salient objects (13-22 px at 64 res): at this training
    # budget (~9k steps vs the reference's 230k) the default 5-10 px movers
    # leave slot attention in its spatial-tiling regime (ARI ~ 0); object
    # discovery needs the foreground to carry reconstruction loss
    obj_size_range = (0.2, 0.35)
    n_sample_frames = 6
    input_frames = 6
    frame_offset = 1
    num_workers = 8
    train_batch_size = 64
    val_batch_size = 64

    slot_dict = dict(num_slots=7, slot_size=128, slot_mlp_size=256,
                     num_iterations=2, kernel_mlp=False)
    enc_dict = dict(enc_channels=(3, 64, 64, 64, 64), enc_ks=5,
                    enc_out_channels=128, enc_norm='')
    dec_dict = dict(dec_channels=(128, 64, 64, 64, 64), dec_resolution=(8, 8),
                    dec_ks=5, dec_norm='')
    pred_dict = dict(pred_type='mlp', pred_rnn=False, pred_norm_first=True)
    # deterministic at this budget: the stochastic kernel path (reference
    # kld_method='var-0.01') needs far more steps before slots bind to
    # objects — swept on hardware (experiments/synth64_savi_sweep.py):
    # det/lr4e-4/2000vids ARI 0.389 vs stochastic ARI -0.03 at 1.9k steps
    loss_dict = dict(use_post_recon_loss=True, kld_method='none')
    post_recon_loss_w = 1.
    kld_loss_w = 0.0

    optimizer = 'Adam'
    lr = 4e-4
    clip_grad = 0.05
    warmup_steps_pct = 0.05
    max_epochs = 12
    save_interval = 1.0
    eval_interval = 4
    print_iter = 20
    n_samples = 0  # video writing off during the timing run
