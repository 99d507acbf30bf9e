"""Standardization-fold exactness for readout heads.

Round-3 finding (docs/benchmark.md "PHYRE planning on-hardware"): readout
transformers over raw slot features can sit at chance when a few channels
carry large static offsets; the cure is per-channel train-set
standardization. Because standardization is affine per channel and the
first layer is a Dense, it folds EXACTLY into in_proj — the deployed
checkpoint consumes raw slots and the model stays reference-parity
(reference readout.py:46 has no input norm). This test pins the fold math
used by experiments/phyre_fake_pipeline.py::_fold_standardization.
"""

import jax
import jax.numpy as jnp
import numpy as np

from slotformer_tpu.models.readout import PHYREReadout


def test_standardization_folds_into_in_proj():
    S, D = 4, 24
    model = PHYREReadout(readout_dict=dict(
        num_slots=S, slot_size=D, t_pe="sin", d_model=32, num_layers=1,
        num_heads=2, ffn_dim=64, norm_first=True, sel_slots=(0, 2)))
    rng = np.random.default_rng(0)
    # slots with wildly disparate per-channel scales, like SAVi features
    raw = (rng.normal(size=(6, 3, S, D)) * rng.uniform(0.01, 30.0, D)
           + rng.uniform(-5.0, 5.0, D)).astype(np.float32)
    mu = raw.mean((0, 1, 2))
    sd = raw.std((0, 1, 2)) + 1e-6
    std = ((raw - mu) / sd).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), {"slots": jnp.asarray(std)})
    lg_std = model.apply(params, {"slots": jnp.asarray(std)})["logits"]

    folded = jax.tree.map(lambda x: x, params)  # copy
    W = np.asarray(params["params"]["in_proj"]["kernel"])  # [D, d_model]
    b = np.asarray(params["params"]["in_proj"]["bias"])
    folded["params"]["in_proj"]["kernel"] = jnp.asarray(W / sd[:, None])
    folded["params"]["in_proj"]["bias"] = jnp.asarray(b - (mu / sd) @ W)
    lg_fold = model.apply(folded, {"slots": jnp.asarray(raw)})["logits"]

    np.testing.assert_allclose(
        np.asarray(lg_fold), np.asarray(lg_std), rtol=0, atol=1e-4)
