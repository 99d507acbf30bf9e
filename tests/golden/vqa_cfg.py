"""Shared tiny CLEVRER-VQA config for the end-to-end pipeline parity golden.

Used by BOTH sides of the seam (extends VERDICT r4 next-round #4 from
test_vp to the VQA pipeline):
  * tests/golden/gen_vqa_golden.py runs the REFERENCE's own flow in torch —
    CLEVRERSlotsVQADataset + clevrer_collate_fn + CLEVRERTransformerModel +
    the test_clevrer_vqa submission grouping and the aloe.py question-level
    val accuracies — on this fixture;
  * tests/test_vqa_e2e_parity.py runs cli.convert_reference_ckpt +
    cli.test_clevrer_vqa on the same config and asserts the CLEVRER.json
    submission and every question-level accuracy match.

Determinism across both frameworks: video_len=4 with n_sample_frames=4
makes the per-question start-index range exactly {0}, so the reference's
``np.random.choice`` (clevrer_vqa/datasets/clevrer.py:102,194) and our
seeded eval rng necessarily agree; the scene-0 slots are stored unrolled
(T=160 > 150) so predictive questions exercise the rollout-tail shift
(clevrer.py:365-374) on both sides.
"""

import os

from slotformer_tpu.runtime import BaseParams

_HERE = os.path.dirname(os.path.abspath(__file__))


class SlotFormerParams(BaseParams):
    project = 'golden'
    model = 'CLEVRERAloe'

    dataset = 'clevrer_vqa'
    data_root = os.path.join(_HERE, 'vqa_fixture')
    slots_root = os.path.join(_HERE, 'vqa_slots.pkl')
    vocab_file = os.path.join(_HERE, 'vqa_fixture', 'vocab.json')

    video_len = 4
    n_sample_frames = 4
    max_n_objects = 2            # N = max_n_objects + 1 = 3 slots
    slot_size = 16
    max_question_len = 6
    max_choice_len = 4
    shuffle_obj = False
    num_workers = 0
    train_batch_size = 8
    val_batch_size = 8

    # d_model = (input_dim + 2) * num_heads = 36 (Aloe convention)
    transformer_dict = dict(
        input_len=4 * 3 + 10, input_dim=16, pos_enc='learnable',
        num_layers=2, num_heads=2, ffn_dim=32, norm_first=True,
        cls_mlp_size=16,
    )
    vision_dict = dict(vision_dim=16)
    loss_dict = dict(use_mask_obj_loss=False)

    optimizer = 'Adam'
    lr = 1e-3
    warmup_steps_pct = 0.1
    max_epochs = 1
