"""AMP (`--fp16` trainer cast) train-loss coverage for the model families
not already exercised by the scan-carry regressions (StoSAVi/STEVE in
test_models.py / test_steve.py): dVAE and the Aloe VQA head.

These lock the `to_bf16` boundary cast (runtime/method.py:84, the exact
semantics of `cli.train --fp16`, reference scripts/train.py:72) to a
working forward+backward on every trainable family — the round-5 hardware
AMP matrix (experiments/amp_matrix_probe.py) exercised these same paths on
the chip; this keeps them from regressing on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from slotformer_tpu.runtime import to_bf16

RNG = jax.random.PRNGKey(0)


def _finite_loss_and_grads(model, variables, batch, rngs, **kwargs):
    """Apply the trainer cast, take grads w.r.t. the f32 master params."""

    def loss_fn(params):
        losses = model.apply(
            {"params": to_bf16(params)}, to_bf16(batch),
            method="train_loss", rngs=rngs, **kwargs)
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # master grads must come back in the master (f32) dtype for adam
    assert all(g.dtype == v.dtype for g, v in zip(
        leaves, jax.tree_util.tree_leaves(variables["params"])))


def test_dvae_amp_train_loss_and_grads():
    from slotformer_tpu.models.dvae import dVAE

    model = dVAE(vocab_size=16, img_channels=3)
    batch = {"img": np.random.RandomState(0)
             .uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)}
    variables = model.init({"params": RNG, "sample": RNG}, batch)
    _finite_loss_and_grads(
        model, variables, batch, rngs={"sample": jax.random.PRNGKey(1)},
        tau=0.5, hard=False)


def test_aloe_amp_train_loss_and_grads():
    from slotformer_tpu.models.aloe import CLEVRERAloe

    B, T, N, Cv, L = 4, 3, 4, 16, 8
    model = CLEVRERAloe(
        transformer_dict=dict(
            input_len=T * N + L, input_dim=8, pos_enc="learnable",
            num_layers=2, num_heads=2, ffn_dim=32, norm_first=True,
            cls_mlp_size=16,
        ),
        lang_dict=dict(question_vocab_size=10, answer_vocab_size=6,
                       question_len=5),
        vision_dict=dict(vision_dim=Cv),
        loss_dict=dict(use_mask_obj_loss=False),
    )
    rng = np.random.default_rng(0)
    batch = {
        "video_emb": rng.normal(size=(B, T, N, Cv)).astype(np.float32),
        "q_tokens": rng.integers(0, 10, size=(B, L)).astype(np.int32),
        "q_pad_mask": np.zeros((B, L), bool),
        "is_cls": np.array([True, True, False, False]),
        "label": np.array([2, 5, 1, 0], np.int32),
    }
    variables = model.init({"params": RNG, "dropout": RNG}, batch)
    _finite_loss_and_grads(
        model, variables, batch, rngs={"dropout": jax.random.PRNGKey(1)})
