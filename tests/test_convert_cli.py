"""convert_reference_ckpt CLI: reference torch .pth -> framework ckpt.

Fabricates reference-format checkpoints from the golden fixtures' state
dicts (tests/golden/model_goldens.npz — captured from the actual reference
modules) and drives the conversion CLI end-to-end, asserting the converted
checkpoint reproduces the reference outputs through the public model API.
"""

import pytest

import numpy as np
import torch

from slotformer_tpu.cli.convert_reference_ckpt import main as convert_main
from slotformer_tpu.runtime import load_state_dict

GOLDEN = "tests/golden/model_goldens.npz"


def _golden(tag):
    z = np.load(GOLDEN)
    sd = {k.split("/sd/", 1)[1]: z[k] for k in z if k.startswith(f"{tag}/sd/")}
    ins = {k.split("/in/", 1)[1]: z[k] for k in z if k.startswith(f"{tag}/in/")}
    outs = {k.split("/out/", 1)[1]: z[k]
            for k in z if k.startswith(f"{tag}/out/")}
    return sd, ins, outs


def _ref_pth(tmp_path, sd, name="ref.pth"):
    p = str(tmp_path / name)
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, p)
    return p


STEVE_CFG = """
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'STEVE'
    resolution = (64, 64)
    input_frames = 2
    slot_dict = dict(num_slots=3, slot_size=16, slot_mlp_size=32,
                     num_iterations=2)
    dvae_dict = dict(down_factor=4, vocab_size=16, dvae_ckp_path='')
    enc_dict = dict(enc_channels=(3, 8, 8), enc_ks=5, enc_norm='',
                    enc_out_channels=16)
    dec_dict = dict(dec_num_layers=1, dec_num_heads=2, dec_d_model=16)
    pred_dict = dict(pred_type='transformer', pred_rnn=True,
                     pred_norm_first=True, pred_num_layers=1,
                     pred_num_heads=2, pred_ffn_dim=32, pred_sg_every=None)
    loss_dict = dict(use_img_recon_loss=False)
"""

PHYS_RO_CFG = """
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'PhysionReadout'
    n_sample_frames = 4
    readout_dict = dict(num_slots=5, slot_size=16, agg_func='max',
                        feats_dim=24)
"""


@pytest.mark.slow
def test_convert_steve_ckpt(tmp_path):
    import jax

    sd, ins, outs = _golden("g_stevefull")
    ref = _ref_pth(tmp_path, sd)
    cfg = str(tmp_path / "steve_cfg.py")
    with open(cfg, "w") as f:
        f.write(STEVE_CFG)
    out_ckp = str(tmp_path / "steve.ckpt.pkl")
    convert_main(["--params", cfg, "--ref_ckpt", ref,
                  "--save_path", out_ckp])

    from slotformer_tpu.models import build_model
    from slotformer_tpu.runtime import load_params

    params_tree = load_state_dict(out_ckp)
    model = build_model(load_params(cfg))
    img = np.transpose(ins["img"], (0, 1, 3, 4, 2))
    slots, masks, feats, _ = model.apply(
        {"params": params_tree}, img, method="encode")
    np.testing.assert_allclose(np.asarray(slots), outs["slots"],
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(masks), outs["masks"],
                               rtol=5e-3, atol=5e-4)


def test_convert_physion_readout_ckpt(tmp_path, capsys):
    sd, ins, outs = _golden("g_physro")
    ref = _ref_pth(tmp_path, sd)
    cfg = str(tmp_path / "ro_cfg.py")
    with open(cfg, "w") as f:
        f.write(PHYS_RO_CFG)
    out_ckp = str(tmp_path / "ro.ckpt.pkl")
    convert_main(["--params", cfg, "--ref_ckpt", ref,
                  "--save_path", out_ckp])
    out = capsys.readouterr().out
    assert "WARNING" not in out  # every leaf mapped

    from slotformer_tpu.models import build_model
    from slotformer_tpu.runtime import load_params

    params_tree = load_state_dict(out_ckp)
    model = build_model(load_params(cfg))
    got = model.apply({"params": params_tree}, {"slots": ins["slots"]})
    np.testing.assert_allclose(np.asarray(got["logits"]), outs["logits"],
                               rtol=2e-3, atol=2e-4)


ALOE_CFG = """
import json
from slotformer_tpu.runtime import BaseParams


class SlotFormerParams(BaseParams):
    model = 'CLEVRERAloe'
    vocab_file = {vocab_file!r}
    slot_size = 16
    n_sample_frames = 2
    max_n_objects = 2
    max_question_len = 4
    max_choice_len = 3
    transformer_dict = dict(
        input_len=2 * 3 + 7, input_dim=16, pos_enc='learnable',
        num_layers=2, num_heads=2, ffn_dim=32, norm_first=True,
        cls_mlp_size=8)
    vision_dict = dict(vision_dim=16)
    loss_dict = dict(use_mask_obj_loss=False)
"""


def test_convert_aloe_ckpt(tmp_path, capsys):
    """Every reference CLEVRERAloe parameter converts; the converted ckpt
    reproduces the reference cls/mc logits through the public model API."""
    import json

    sd, ins, outs = _golden("g_aloe")
    ref = _ref_pth(tmp_path, sd)
    vocab_file = str(tmp_path / "vocab.json")
    with open(vocab_file, "w") as f:
        json.dump({"q_vocab": [f"w{i}" for i in range(20)],
                   "a_vocab": [f"a{i}" for i in range(5)]}, f)
    cfg = str(tmp_path / "aloe_cfg.py")
    with open(cfg, "w") as f:
        f.write(ALOE_CFG.format(vocab_file=vocab_file))
    out_ckp = str(tmp_path / "aloe.ckpt.pkl")
    convert_main(["--params", cfg, "--ref_ckpt", ref,
                  "--save_path", out_ckp])
    out = capsys.readouterr().out
    assert "WARNING" not in out  # every leaf mapped

    from slotformer_tpu.models import build_model
    from slotformer_tpu.runtime import load_params

    params_tree = load_state_dict(out_ckp)
    model = build_model(load_params(cfg))
    mc_flag = ins["mc_flag"].astype(int)
    n_cls = len(ins["cls_q_tokens"])
    batch = {
        "video_emb": np.concatenate(
            [ins["cls_video_emb"], ins["mc_video_emb"][mc_flag]], 0),
        "q_tokens": np.concatenate(
            [ins["cls_q_tokens"], ins["mc_q_tokens"]], 0).astype(np.int32),
        "q_pad_mask": np.concatenate(
            [ins["cls_q_pad_mask"], ins["mc_q_pad_mask"]], 0),
        "is_cls": np.array([True] * n_cls + [False] * len(mc_flag)),
    }
    got = model.apply({"params": params_tree}, batch)
    np.testing.assert_allclose(
        np.asarray(got["cls_answer_logits"])[:n_cls], outs["cls_logits"],
        rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got["mc_answer_logits"])[n_cls:], outs["mc_logits"],
        rtol=2e-3, atol=2e-4)
