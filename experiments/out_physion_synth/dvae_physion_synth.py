
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'dVAE'
    dataset = 'physion_training'
    data_root = 'data/Physion'
    tasks = ['all']
    resolution = (64, 64)
    n_sample_frames = 1
    input_frames = 1
    frame_offset = 1
    video_len = 24
    num_workers = 8
    train_batch_size = 64
    val_batch_size = 64
    vocab_size = 256
    down_factor = 4
    init_tau = 1.0
    final_tau = 0.1
    tau_decay_pct = 0.3
    optimizer = 'Adam'
    lr = 3e-4
    warmup_steps_pct = 0.05
    max_epochs = 40
    save_interval = 2.0
    eval_interval = 10
    print_iter = 20
    n_samples = 0
    max_rss_gb = 110
