"""Benchmark: SlotFormer rollout throughput (frames/sec/chip).

Measures the headline inference path of the reference — autoregressive slot
rollout + spatial-broadcast decoding to 64x64 pixels on the CLEVRER-sized
model (7 slots x 128d, d_model 256, 4 layers, history 6, rollout 48), i.e.
exactly what ``test_vp.py`` runs per batch in the reference
(/root/reference/slotformer/video_prediction/test_vp.py:119-127).

Prints ONE JSON line:
    {"metric": "rollout_frames_per_sec_per_chip", "value": N,
     "unit": "frames/s", "vs_baseline": N}

Measurement notes (v5e, tunneled):
  * K batches are scanned INSIDE one jit program and synced via a scalar
    fetch — block_until_ready does not synchronize on the tunneled axon
    platform and each host call pays ~60 ms relay RTT, so per-call timing
    under-reports device throughput ~2x.
  * f32 storage is intentional: XLA already executes f32 convs with bf16 MXU
    passes (measured 165 TFLOP/s on the decode stack = 84% of bf16 peak);
    explicit bf16 storage hits a slow conv-transpose layout path
    (65 TFLOP/s measured).
  * B=16 fills HBM-friendly decode tiles; B=32 OOMs at K>=8 because decode
    materializes B*T*N broadcast maps.

Baseline: the reference publishes no throughput number, so ``vs_baseline``
divides by an analytical RTX6000 estimate: decode dominates at
~2 GFLOP/slot-frame x 7 slots = 14 GFLOP/frame; an RTX6000 at ~10 TFLOP/s
sustained fp16 gives ~700 frames/s. BASELINE.md's north star is >=3x that
per chip (vs_baseline >= 3.0).
"""

from __future__ import annotations

import json
import time

import numpy as np


RTX6000_EST_FRAMES_PER_SEC = 700.0
B = 16  # per-program batch
K = 8  # batches scanned inside one jit call
HISTORY, ROLLOUT = 6, 48


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model

    model = _flagship_model()
    variables = model.init(
        jax.random.PRNGKey(0),
        {
            "slots": np.zeros((2, 16, 7, 128), np.float32),
            "img": np.zeros((2, 16, 64, 64, 3), np.float32),
        },
    )
    params = jax.device_put(variables["params"])
    slots = np.random.RandomState(0).randn(K, B, HISTORY, 7, 128).astype(np.float32)
    slots = jax.device_put(slots)

    @jax.jit
    def rollout_decode_k(p, s):
        def one(carry, sb):
            out = model.apply(
                {"params": p}, sb, ROLLOUT, True, False, method="rollout"
            )
            return carry + out["recon_combined"].mean() + out["slots"].mean(), None

        acc, _ = jax.lax.scan(one, jnp.zeros(()), s)
        return acc

    v = float(rollout_decode_k(params, slots))  # warmup / compile
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(rollout_decode_k(params, slots))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(v)

    fps = K * B * ROLLOUT / dt
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
