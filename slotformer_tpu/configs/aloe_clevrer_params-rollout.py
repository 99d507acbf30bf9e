"""Aloe VQA on CLEVRER ROLLOUT slots (reference clevrer_vqa/configs/aloe_clevrer_params-rollout.py)."""

import os

from slotformer_tpu.runtime import BaseParams

_CUR_DIR = os.path.dirname(os.path.realpath(__file__))


class SlotFormerParams(BaseParams):
    project = 'SlotFormer-TPU'

    max_epochs = 400  # ~240k steps
    eval_interval = 20
    n_samples = 5

    optimizer = 'Adam'
    lr = 1e-3
    warmup_steps_pct = 0.1

    dataset = 'clevrer_vqa'
    data_root = './data/CLEVRER'
    slots_root = './data/CLEVRER/rollout_clevrer_slots.pkl'
    vocab_file = os.path.join(_CUR_DIR, '../datasets/cache/CLEVRER_vocab.json')
    n_sample_frames = 25
    slot_size = 128
    max_n_objects = 6
    max_question_len = 20
    max_choice_len = 12
    shuffle_obj = False  # SAVi slots are temporally consistent
    train_batch_size = 256  # GLOBAL (rows, see datasets/clevrer_vqa.py)
    val_batch_size = 512
    num_workers = 8

    model = 'CLEVRERAloe'
    transformer_dict = dict(
        input_len=(max_n_objects + 1) * n_sample_frames + max_question_len +
        max_choice_len,
        input_dim=16,
        pos_enc='learnable',
        num_layers=12,
        num_heads=8,
        ffn_dim=512,
        norm_first=True,
        cls_mlp_size=128,
    )
    vision_dict = dict(vision_dim=slot_size)
    loss_dict = dict(use_mask_obj_loss=False)

    cls_answer_loss_w = 1.
    mc_answer_loss_w = 1.
    mask_obj_loss_w = 0.01
