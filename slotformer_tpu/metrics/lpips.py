"""LPIPS perceptual distance (VGG16 backbone) in JAX.

The reference uses the ``lpips`` pip package
(/root/reference/slotformer/video_prediction/test_vp.py:21-23). Here:
  * the architecture (VGG16 features + linear calibration heads, unit-normalized
    channel differences, spatial mean, layer sum) is implemented in jnp;
  * ``load_lpips(weights_path)`` builds the metric fn from an ``.npz``/pickle
    weight file — convert the official weights once, where the ``lpips``
    package is installed, with ``scripts/convert_lpips.py``;
  * ``load_lpips(None, fallback="untrained")`` builds the metric from a
    deterministic seeded *untrained* VGG (He-init convs, uniform calibration
    heads). Zhang et al. 2018 (the LPIPS paper, §5) report that features of
    untrained networks still form a perceptual metric far better than
    pixelwise ones, so this is a meaningful (though not paper-comparable)
    ``percept_dist`` when official weights are unavailable; callers must
    surface ``fn.source == "untrained"`` loudly.
  * ``load_lpips(None)`` returns None (callers report percept_dist = 0 with
    a warning — same metric table shape, missing column flagged).

The jnp forward is golden-tested against an independent torch
implementation of the lpips forward with identical weights
(tests/test_lpips.py + tests/golden/gen_lpips_golden.py), so a converted
official weight file reproduces the package's numbers.

Weight file format: a dict {name: array} with VGG conv kernels as
``conv{i}_{j}/kernel`` [kh, kw, cin, cout] HWIO, biases ``conv{i}_{j}/bias``,
and LPIPS heads ``lin{k}/kernel`` [1, 1, c, 1].
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (block, convs, channels)
_VGG_CFG = [(1, 2, 64), (2, 2, 128), (3, 3, 256), (4, 3, 512), (5, 3, 512)]
# ImageNet normalization in [-1, 1] space (lpips ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _vgg_features(w: dict, x: jnp.ndarray):
    """x [B, H, W, 3] in [-1, 1] -> list of 5 feature maps (pre-pool relu)."""
    x = (x - _SHIFT) / _SCALE
    feats = []
    for blk, n_convs, _ in _VGG_CFG:
        for j in range(1, n_convs + 1):
            k = w[f"conv{blk}_{j}/kernel"]
            b = w[f"conv{blk}_{j}/bias"]
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            x = jax.nn.relu(x)
        feats.append(x)
        if blk != 5:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def _unit_normalize(x, eps=1e-10):
    n = jnp.sqrt((x**2).sum(-1, keepdims=True))
    return x / (n + eps)


def untrained_lpips_weights(seed: int = 0) -> dict:
    """Deterministic untrained LPIPS weights: He-init VGG convs + uniform
    (1/C) calibration heads, as numpy arrays keyed like the converted file."""
    rng = np.random.RandomState(seed)
    w = {}
    cin = 3
    for blk, n_convs, cout in _VGG_CFG:
        for j in range(1, n_convs + 1):
            fan_in = 3 * 3 * cin
            w[f"conv{blk}_{j}/kernel"] = (
                rng.randn(3, 3, cin, cout) * np.sqrt(2.0 / fan_in)
            ).astype(np.float32)
            w[f"conv{blk}_{j}/bias"] = np.zeros((cout,), np.float32)
            cin = cout
    for i, (_, _, c) in enumerate(_VGG_CFG):
        w[f"lin{i}/kernel"] = np.full((1, 1, c, 1), 1.0 / c, np.float32)
    return w


def load_lpips(
    weights_path: Optional[str] = None, fallback: Optional[str] = None
) -> Optional[Callable]:
    """Return ``fn(x, y) -> [B]`` LPIPS distances, or None if no weights.

    x/y are NHWC in [-1, 1]. The returned fn carries ``fn.source`` —
    ``"file"`` or ``"untrained"`` — so callers can label the metric.
    ``fallback="untrained"`` uses ``untrained_lpips_weights`` when no
    weights file is found instead of returning None.
    """
    if not weights_path:
        weights_path = os.environ.get("LPIPS_WEIGHTS", "")
    if not weights_path or not os.path.isfile(weights_path):
        if fallback == "untrained":
            return _build_lpips_fn(untrained_lpips_weights(), source="untrained")
        if fallback is not None:
            raise ValueError(f"unknown LPIPS fallback: {fallback!r}")
        return None
    if weights_path.endswith(".npz"):
        w = dict(np.load(weights_path))
    else:
        import pickle

        with open(weights_path, "rb") as f:
            w = pickle.load(f)
    return _build_lpips_fn(w, source="file")


def _build_lpips_fn(w: dict, source: str) -> Callable:
    w = {k: jnp.asarray(v) for k, v in w.items()}

    @jax.jit
    def _lpips(x, y):
        fx = _vgg_features(w, x)
        fy = _vgg_features(w, y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2  # [B,H,W,C]
            lin = w[f"lin{i}/kernel"]  # [1, 1, C, 1]
            d = jax.lax.conv_general_dilated(
                d, lin, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            total = total + d.mean(axis=(1, 2, 3))
        return total

    # plain-python wrapper: jit wrappers don't reliably accept attributes
    def lpips_fn(x, y):
        return _lpips(x, y)

    lpips_fn.source = source
    return lpips_fn
