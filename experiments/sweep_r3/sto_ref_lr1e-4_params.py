"""Round-3 extended stochastic sweep (VERDICT r2 next-round #2a):
the reference's STOCHASTIC StoSAVi recipe (kld_method='var-0.01',
kld_loss_w=1e-4 — reference stosavi_clevrer_params.py:21-28,79) at the reference's
EXACT LR (1e-4, stosavi_clevrer_params.py:24), with a ~4x budget
(51 epochs ~ 24k steps vs the deterministic run's ~6k)."""

from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    project = 'SlotFormer-TPU'
    model = 'StoSAVi'

    dataset = 'synthetic'
    num_videos_train = 2000
    num_videos_val = 16
    video_len = 20
    resolution = (64, 64)
    obj_size_range = (0.2, 0.35)
    n_sample_frames = 6
    input_frames = 6
    frame_offset = 1
    num_workers = 8
    train_batch_size = 64
    val_batch_size = 64
    # uint8 host->device wire: 4x smaller transfers; 4x less tunnel-client
    # host-memory leak per step (fewer watchdog restarts over 24k steps)
    wire_uint8 = True

    slot_dict = dict(num_slots=7, slot_size=128, slot_mlp_size=256,
                     num_iterations=2, kernel_mlp=False)
    enc_dict = dict(enc_channels=(3, 64, 64, 64, 64), enc_ks=5,
                    enc_out_channels=128, enc_norm='')
    dec_dict = dict(dec_channels=(128, 64, 64, 64, 64), dec_resolution=(8, 8),
                    dec_ks=5, dec_norm='')
    pred_dict = dict(pred_type='mlp', pred_rnn=False, pred_norm_first=True)
    loss_dict = dict(use_post_recon_loss=True, kld_method='var-0.01')
    post_recon_loss_w = 1.
    kld_loss_w = 1e-4

    optimizer = 'Adam'
    lr = 1e-4
    clip_grad = 0.05
    warmup_steps_pct = 0.05
    max_epochs = 51
    save_interval = 1.0
    eval_interval = 4
    print_iter = 50
    n_samples = 0
