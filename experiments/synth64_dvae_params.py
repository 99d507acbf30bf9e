"""Real-TPU convergence check: dVAE tokenizer on synthetic 64x64 frames."""

from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    project = 'SlotFormer-TPU'
    model = 'dVAE'

    dataset = 'synthetic'
    num_videos_train = 200
    num_videos_val = 16
    video_len = 20
    resolution = (64, 64)
    obj_size_range = (0.2, 0.35)
    n_sample_frames = 1  # single frames (reference dvae_physion_params)
    input_frames = 1
    frame_offset = 1
    num_workers = 8
    train_batch_size = 64
    val_batch_size = 64

    vocab_size = 256
    down_factor = 4

    # gumbel-tau cosine anneal (reference steve_utils.cosine_anneal)
    init_tau = 1.0
    final_tau = 0.1
    tau_decay_pct = 0.3

    optimizer = 'Adam'
    lr = 3e-4
    warmup_steps_pct = 0.05
    max_epochs = 40
    save_interval = 1.0
    eval_interval = 10
    print_iter = 50
    n_samples = 0
