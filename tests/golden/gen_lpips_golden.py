#!/usr/bin/env python
"""Generate LPIPS golden fixtures: torch forward vs the jnp implementation.

Builds an independent *torch* implementation of the lpips-package forward
(ScalingLayer -> VGG16 relu{1_2,2_2,3_3,4_3,5_3} taps -> unit-normalize ->
squared diff -> bias-free 1x1 calibration conv -> spatial mean -> layer sum;
structure per Zhang et al. 2018 and the ``lpips`` package, used by the
reference at /root/reference/slotformer/video_prediction/test_vp.py:21-23),
loads the SAME weight arrays slotformer_tpu's jnp version uses, and records
expected distances for fixed inputs. ``tests/test_lpips.py`` asserts the jnp
forward reproduces them, which pins the architecture + weight layout: any
correctly converted official weight file then reproduces the package's
numbers.

Run from the repo root:  python tests/golden/gen_lpips_golden.py
"""

import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from slotformer_tpu.metrics.lpips import (  # noqa: E402
    _SCALE,
    _SHIFT,
    _VGG_CFG,
    untrained_lpips_weights,
)

SEED = 3
HERE = os.path.dirname(os.path.abspath(__file__))


def torch_lpips(w: dict, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """x/y: NHWC float32 in [-1, 1] -> [B] distances (torch reference)."""

    def features(img):
        t = torch.from_numpy(img).permute(0, 3, 1, 2)  # NCHW
        shift = torch.from_numpy(_SHIFT).view(1, 3, 1, 1)
        scale = torch.from_numpy(_SCALE).view(1, 3, 1, 1)
        t = (t - shift) / scale
        feats = []
        for blk, n_convs, _ in _VGG_CFG:
            for j in range(1, n_convs + 1):
                k = torch.from_numpy(
                    np.transpose(w[f"conv{blk}_{j}/kernel"], (3, 2, 0, 1))
                )  # HWIO -> OIHW
                b = torch.from_numpy(w[f"conv{blk}_{j}/bias"])
                t = F.relu(F.conv2d(t, k, b, padding=1))
            feats.append(t)
            if blk != 5:
                t = F.max_pool2d(t, 2, 2)
        return feats

    with torch.no_grad():
        dist = None
        for i, (a, b) in enumerate(zip(features(x), features(y))):
            a = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            b = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            lin = torch.from_numpy(
                np.transpose(w[f"lin{i}/kernel"], (3, 2, 0, 1))
            )
            d = F.conv2d((a - b).pow(2), lin).mean(dim=(1, 2, 3))
            dist = d if dist is None else dist + d
    return dist.numpy()


def main() -> None:
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, size=(4, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.randn(4, 64, 64, 3).astype(np.float32) * 0.2, -1, 1)
    w = untrained_lpips_weights(SEED)
    expected = torch_lpips(w, x, y)
    expected_self = torch_lpips(w, x, x)
    out = os.path.join(HERE, "lpips_golden.npz")
    np.savez_compressed(
        out, x=x, y=y, expected=expected, expected_self=expected_self,
        weight_seed=np.int64(SEED),
    )
    print(f"wrote {out}: expected={expected}")


if __name__ == "__main__":
    main()
