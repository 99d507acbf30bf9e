"""Every shipped config must load and its model must trace (eval_shape)."""

import os

import jax
import numpy as np
import pytest

from slotformer_tpu.models import build_model
from slotformer_tpu.runtime import load_params

CFG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "slotformer_tpu", "configs",
)

ALL_CONFIGS = sorted(
    f for f in os.listdir(CFG_DIR)
    if f.endswith("_params.py") or "params-" in f
)


def _dummy_batch(params):
    """Minimal batch matching each model's forward signature."""
    m = params.model
    B = 2
    res = tuple(params.resolution) if params.has("resolution") else (64, 64)
    if m == "StoSAVi":
        return {"img": np.zeros((B, params.input_frames) + res + (3,), np.float32)}
    if m == "dVAE":
        return {"img": np.zeros((B,) + res + (3,), np.float32)}
    if m == "STEVE":
        return {"img": np.zeros((B, params.input_frames) + res + (3,), np.float32)}
    if m in ("SlotFormer", "SingleStepSlotFormer", "STEVESlotFormer"):
        sd = params.slot_dict
        T = params.n_sample_frames
        batch = {"slots": np.zeros((B, T, sd["num_slots"], sd["slot_size"]), np.float32)}
        if params.loss_dict.get("use_img_recon_loss", False):
            batch["img"] = np.zeros((B, T) + res + (3,), np.float32)
        return batch
    if m == "CLEVRERAloe":
        td = params.transformer_dict
        T, N = params.n_sample_frames, params.max_n_objects + 1
        L = params.max_question_len + params.max_choice_len
        return {
            "video_emb": np.zeros((B, T, N, params.slot_size), np.float32),
            "q_tokens": np.zeros((B, L), np.int32),
            "q_pad_mask": np.zeros((B, L), bool),
            "is_cls": np.array([True, False]),
            "label": np.zeros((B,), np.int32),
        }
    if m == "PHYREReadout":
        rd = params.readout_dict
        return {
            "slots": np.zeros(
                (B, params.n_sample_frames, rd["num_slots"], rd["slot_size"]),
                np.float32,
            ),
            "label": np.zeros((B,), np.int32),
        }
    if m == "PhysionReadout":
        rd = params.readout_dict
        return {
            "slots": np.zeros((B, 10, rd["num_slots"], rd["slot_size"]), np.float32),
            "label": np.zeros((B,), np.int32),
        }
    raise NotImplementedError(m)


@pytest.mark.parametrize("cfg", ALL_CONFIGS)
def test_config_loads_and_model_traces(cfg):
    params = load_params(os.path.join(CFG_DIR, cfg))
    assert params.model
    assert params.loss_weights(), f"{cfg} has no loss weights"
    model = build_model(params)
    batch = _dummy_batch(params)
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1)}
    shapes = jax.eval_shape(lambda: model.init(rngs, batch))
    n_params = sum(
        int(np.prod(s.shape)) for s in jax.tree.leaves(shapes["params"])
    )
    assert n_params > 1000, f"{cfg}: suspiciously few params ({n_params})"


def test_config_count_matches_reference():
    # the reference ships 13 configs (SURVEY.md §5); we must cover all of them
    assert len(ALL_CONFIGS) == 13, ALL_CONFIGS
