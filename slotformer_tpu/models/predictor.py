"""SAVi transition predictors (slot state t -> t+1).

Behavioral spec: /root/reference/slotformer/base_slots/models/predictor.py.
Three variants:
  * TransformerPredictor — encoder stack over the slot set (object interaction)
  * ResidualMLPPredictor — LN + MLP + residual
  * RNNPredictorWrapper  — base predictor output fed through an LSTM cell
    (scene-level dynamics), hidden state carried across frames.

TPU-native divergence: the reference keeps LSTM hidden state as *module
state* mutated per call (predictor.py:94-135). Under jit/scan that is
impossible — state is threaded explicitly: every predictor is
``(x, state) -> (out, state)`` with ``init_state(batch_shape)`` providing
the initial carry; stateless predictors carry ``()``.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .nn import MLP, LayerNorm, TransformerEncoder

PredictorState = Any


class TransformerPredictor(nn.Module):
    d_model: int = 128
    num_layers: int = 1
    num_heads: int = 4
    ffn_dim: int = 256
    norm_first: bool = True
    dropout: float = 0.1

    def init_state(self, batch_size: int, num_tokens: int) -> PredictorState:
        return ()

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, state: PredictorState = (), deterministic: bool = True
    ) -> Tuple[jnp.ndarray, PredictorState]:
        out = TransformerEncoder(
            d_model=self.d_model,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            ffn_dim=self.ffn_dim,
            norm_first=self.norm_first,
            dropout=self.dropout,
            name="transformer_encoder",
        )(x, deterministic=deterministic)
        return out, state


class ResidualMLPPredictor(nn.Module):
    """LN then MLP with a residual.

    ``norm_first=True`` takes the residual *after* the LN (reference
    predictor.py:65-73).
    """

    channels: Tuple[int, ...]
    norm_first: bool = True

    def init_state(self, batch_size: int, num_tokens: int) -> PredictorState:
        return ()

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, state: PredictorState = (), deterministic: bool = True
    ) -> Tuple[jnp.ndarray, PredictorState]:
        res = x
        x = LayerNorm(name="ln")(x)
        if self.norm_first:
            res = x
        out = MLP(self.channels[1:], name="mlp")(x)
        return out + res, state


class RNNPredictorWrapper(nn.Module):
    """Base predictor -> LSTM cell -> projection, with explicit carry.

    The reference flattens [B, N, C] slot tokens into a length-B·N sequence
    step for its nn.LSTM (predictor.py:113-118); here each frame is one
    LSTMCell step over the same flattening.
    ``sg_every=k`` stops gradients through inputs+state every k steps
    (PARTS-style truncated BPTT) — the step index rides in the carry.
    """

    base: nn.Module
    input_size: int = 128
    hidden_size: int = 256
    sg_every: int | None = None

    def init_state(self, batch_size: int, num_tokens: int) -> PredictorState:
        shape = (batch_size * num_tokens,)
        c = jnp.zeros(shape + (self.hidden_size,))
        h = jnp.zeros(shape + (self.hidden_size,))
        step = jnp.zeros((), jnp.int32)
        return (c, h, step)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, state: PredictorState, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, PredictorState]:
        c, h, step = state
        if self.sg_every is not None:
            do_sg = jnp.logical_and(step % self.sg_every == 0, step > 0)
            sg = lambda t: jnp.where(do_sg, jax.lax.stop_gradient(t), t)
            x, c, h = sg(x), sg(c), sg(h)
        out, _ = self.base(x, (), deterministic=deterministic)
        shp = out.shape
        out_flat = out.reshape(-1, shp[-1])
        cell = nn.OptimizedLSTMCell(features=self.hidden_size, name="rnn")
        (c, h), out_flat = cell((c, h), out_flat)
        out = nn.Dense(self.input_size, name="out_projector")(out_flat).reshape(shp)
        return out, (c, h, step + 1)


def build_predictor(slot_size: int, slot_mlp_size: int, pred_dict: dict) -> nn.Module:
    """Assemble a predictor from the reference's ``pred_dict`` config schema
    (savi.py:295-322)."""
    pred_type = pred_dict.get("pred_type", "transformer")
    if pred_type == "mlp":
        base = ResidualMLPPredictor(
            channels=(slot_size, slot_size * 2, slot_size),
            norm_first=pred_dict.get("pred_norm_first", True),
            name="predictor_base",
        )
    else:
        base = TransformerPredictor(
            d_model=slot_size,
            num_layers=pred_dict.get("pred_num_layers", 1),
            num_heads=pred_dict.get("pred_num_heads", 4),
            ffn_dim=pred_dict.get("pred_ffn_dim", 256),
            norm_first=pred_dict.get("pred_norm_first", True),
            name="predictor_base",
        )
    if pred_dict.get("pred_rnn", False):
        return RNNPredictorWrapper(
            base=base,
            input_size=slot_size,
            hidden_size=slot_mlp_size,
            sg_every=pred_dict.get("pred_sg_every", None),
            name="predictor",
        )
    return base
