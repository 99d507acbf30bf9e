"""Checkpoint save/load + cross-model param-subtree grafting.

The reference saves ``{'state_dict': ...}`` torch dicts and relies on
key-prefix surgery to move weights between models:
  * SlotFormer loads only ``decoder.* / decoder_pos_embedding.*`` from a
    SAVi ckpt (/root/reference/slotformer/video_prediction/models/slotformer.py:196-218)
  * STEVESlotFormer grafts ``trans_decoder.*`` from STEVE
    (steve_slotformer.py:62-84); STEVE grafts a full dVAE ckpt (steve.py:164-176).

Here params are nested flax dicts, so "key-prefix surgery" becomes subtree
copy — ``graft(dst_params, src_params, {'decoder': 'decoder'})``.

Format: a single pickle file holding numpy-ified pytrees:
``{'state_dict': params, 'opt_state': ..., 'step': int, 'rng': ...,
'model_state': ...}``. Only ``state_dict`` is required for inference-time
consumers, mirroring ``torch.load(w)['state_dict']`` usage everywhere in the
reference.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np

from .io import mkdir_or_exist


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


# Checkpoint format version, stamped into every saved payload:
#   2 — DeconvNormAct stores torch-exact ConvTranspose2d kernels
#       ([kH, kW, out, in], transpose_kernel=True; models/nn.py). Version-1
#       (round-1) checkpoints stored [kH, kW, in, out]; for decoders whose
#       deconv layers have in==out channels the shapes coincide, so an old
#       checkpoint would load silently and decode garbage — the version
#       stamp makes that loud.
FORMAT_VERSION = 2


def save_checkpoint(path: str, state_dict, step: int = 0, **extra) -> None:
    """Atomically write a checkpoint pickle."""
    mkdir_or_exist(os.path.dirname(path))
    payload = {
        "state_dict": _to_numpy(state_dict),
        "step": int(step),
        "format_version": FORMAT_VERSION,
    }
    for k, v in extra.items():
        payload[k] = _to_numpy(v) if isinstance(v, (dict, list, tuple)) or hasattr(v, "shape") else v
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def _has_deconv(tree) -> bool:
    if isinstance(tree, Mapping):
        return any(
            k.startswith("ConvTranspose") or _has_deconv(v)
            for k, v in tree.items()
        )
    return False


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    ver = payload.get("format_version")
    if ver is not None and ver > FORMAT_VERSION:
        raise ValueError(
            f"{path}: checkpoint format_version {ver} is newer than this "
            f"framework's {FORMAT_VERSION} — upgrade the framework")
    if ver is None and _has_deconv(payload.get("state_dict", {})):
        # hard error, not a warning: a round-1-geometry deconv loads without
        # shape error and decodes garbage, silently poisoning everything
        # downstream (the round-3 hardware queue burned its window on one).
        raise ValueError(
            f"{path}: checkpoint predates the format_version stamp and "
            "contains ConvTranspose kernels. If it was written by the "
            "round-1 deconv geometry ([kH,kW,in,out]) its decoder will "
            "load without error but decode garbage — re-convert from the "
            "reference ckpt or retrain (see models/nn.py DeconvNormAct). "
            "To force-load a ckpt you know is post-round-2 geometry, "
            "re-save it with format_version=2 via "
            "slotformer_tpu.runtime.checkpoint.save_checkpoint.")
    return payload


def load_state_dict(path: str):
    """Load just the param tree (the ``['state_dict']`` contract)."""
    return load_checkpoint(path)["state_dict"]


def graft(
    dst_params: Mapping,
    src_params: Mapping,
    subtree_map: Dict[str, str],
    strict: bool = True,
):
    """Copy param subtrees from ``src_params`` into a copy of ``dst_params``.

    ``subtree_map`` maps dst '/'-joined key paths to src key paths, e.g.
    ``{'decoder': 'decoder', 'decoder_pos_embedding': 'decoder_pos_embedding'}``.
    Returns a new tree; inputs are not mutated.
    """

    def get_path(tree, dotted):
        if dotted == "":
            return tree  # whole checkpoint (e.g. STEVE grafting a dVAE ckpt)
        node = tree
        for k in dotted.split("/"):
            if k not in node:
                raise KeyError(f"missing subtree {dotted!r} (at {k!r})")
            node = node[k]
        return node

    def set_path(tree, dotted, value):
        keys = dotted.split("/")
        node = tree
        for k in keys[:-1]:
            node = node[k]
        if strict and keys[-1] not in node:
            raise KeyError(f"dst missing subtree {dotted!r}")
        node[keys[-1]] = value

    out = jax.tree.map(lambda x: x, dict(dst_params))  # deep copy of structure
    out = _deep_dict(out)
    for dst_key, src_key in subtree_map.items():
        sub = get_path(src_params, src_key)
        if strict:
            _check_struct_match(get_path(out, dst_key), sub, dst_key)
        set_path(out, dst_key, _deep_dict(jax.tree.map(lambda x: x, sub)))
    return out


def _deep_dict(tree):
    if isinstance(tree, Mapping):
        return {k: _deep_dict(v) for k, v in tree.items()}
    return tree


def _check_struct_match(dst, src, name):
    d_paths = {p for p, _ in _leaves_with_paths(dst)}
    s_paths = {p for p, _ in _leaves_with_paths(src)}
    if d_paths != s_paths:
        missing = d_paths - s_paths
        extra = s_paths - d_paths
        raise ValueError(
            f"graft {name!r}: structure mismatch; missing={sorted(missing)[:5]} "
            f"extra={sorted(extra)[:5]}"
        )
    for (p, d), (_, s) in zip(
        sorted(_leaves_with_paths(dst)), sorted(_leaves_with_paths(src))
    ):
        if tuple(d.shape) != tuple(s.shape):
            raise ValueError(f"graft {name!r}: shape mismatch at {p}: {d.shape} vs {s.shape}")


def _leaves_with_paths(tree, prefix=""):
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            yield from _leaves_with_paths(v, f"{prefix}{k}/")
    else:
        yield prefix.rstrip("/"), tree


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Find the newest ``*.ckpt.pkl`` in a directory (step-numbered)."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [f for f in os.listdir(ckpt_dir) if f.endswith(".ckpt.pkl")]
    if not cands:
        return None

    def step_of(f):
        stem = f[: -len(".ckpt.pkl")]
        try:
            return int(stem.rsplit("_", 1)[-1])
        except ValueError:
            return -1

    return os.path.join(ckpt_dir, max(cands, key=step_of))
