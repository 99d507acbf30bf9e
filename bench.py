"""Benchmark: SlotFormer rollout throughput (frames/sec/chip).

Measures the headline inference path of the reference — autoregressive slot
rollout + spatial-broadcast decoding to 64x64 pixels on the CLEVRER-sized
model (7 slots x 128d, d_model 256, 4 layers, history 6), i.e. exactly what
``test_vp.py`` runs per batch in the reference
(/root/reference/slotformer/video_prediction/test_vp.py:119-127, rollout 48
frames + decode).

Prints ONE JSON line:
    {"metric": "rollout_frames_per_sec_per_chip", "value": N,
     "unit": "frames/s", "vs_baseline": N}

Baseline: the reference publishes no throughput number, so ``vs_baseline``
divides by an analytical RTX6000 estimate: the decode path dominates at
~2 GFLOP/slot-frame x 7 slots = 14 GFLOP/frame; an RTX6000 at ~10 TFLOP/s
sustained fp16 gives ~700 frames/s. BASELINE.md's north star is >=3x that
per chip (i.e. vs_baseline >= 3.0).
"""

from __future__ import annotations

import json
import time

import numpy as np

RTX6000_EST_FRAMES_PER_SEC = 700.0


def main() -> None:
    import jax

    from __graft_entry__ import _flagship_model

    model = _flagship_model()
    B = 8
    HISTORY, ROLLOUT = 6, 48
    slots = np.random.RandomState(0).randn(B, HISTORY, 7, 128).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        {
            "slots": np.zeros((B, 16, 7, 128), np.float32),
            "img": np.zeros((B, 16, 64, 64, 3), np.float32),
        },
    )

    @jax.jit
    def rollout_decode(params, past):
        out = model.apply(
            {"params": params}, past, ROLLOUT, True, False, method="rollout"
        )
        # scalar output: forces full execution while keeping the host fetch
        # tiny (block_until_ready does not synchronize on the tunneled
        # axon platform, so we sync by fetching the scalar)
        return out["recon_combined"].mean() + out["slots"].mean()

    params = jax.device_put(variables["params"])
    past = jax.device_put(slots)

    float(rollout_decode(params, past))  # warmup / compile

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(rollout_decode(params, past))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(s)

    frames = B * ROLLOUT
    fps = frames / dt
    print(
        json.dumps(
            {
                "metric": "rollout_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / RTX6000_EST_FRAMES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
