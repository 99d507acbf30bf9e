"""LPIPS perceptual distance (VGG16 backbone) in flax.

The reference uses the ``lpips`` pip package (test_vp.py:21-23). This
environment has no network egress and no pretrained VGG weights, so:
  * the architecture (VGG16 features + linear calibration heads, unit-normalized
    channel differences, spatial mean, layer sum) is implemented here;
  * ``load_lpips(weights_path)`` builds the metric fn from an ``.npz``/pickle
    weight file if the user provides one (convert once from the lpips package
    with ``scripts/convert_lpips.py`` docstring below);
  * ``load_lpips(None)`` returns None and the eval CLI reports
    ``percept_dist = 0`` with a warning — same metric table shape, missing
    column flagged.

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


def load_lpips(weights_path: Optional[str] = None) -> Optional[Callable]:
    """Return ``fn(x, y) -> [B]`` LPIPS distances, or None if no weights.

    x/y are NHWC in [-1, 1].
    """
    if not weights_path:
        weights_path = os.environ.get("LPIPS_WEIGHTS", "")
    if not weights_path or not os.path.isfile(weights_path):
        return None
    if weights_path.endswith(".npz"):
        w = dict(np.load(weights_path))
    else:
        import pickle

        with open(weights_path, "rb") as f:
            w = pickle.load(f)
    w = {k: jnp.asarray(v) for k, v in w.items()}

    @jax.jit
    def lpips_fn(x, y):
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

    return lpips_fn
