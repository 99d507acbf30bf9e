"""Readout heads: PHYRE task-success classifier + Physion relation readout.

Behavioral specs:
  * PHYREReadout (/root/reference/slotformer/phyre_planning/models/readout.py):
    transformer encoder over slots at selected timesteps (``sel_slots``,
    default [0, 3]) with temporal PE + zero-init CLS token -> binary logit;
    BCE loss + threshold-swept accuracy in eval.
  * PhysionReadout (/root/reference/slotformer/physion_vqa/models/readout.py):
    RelationNetwork-style — all C(N,2) slot pairs -> linear -> sym aggregate
    (sum/mean/max) over pairs -> linear -> max over time; BCE + acc sweep.
"""

from __future__ import annotations

from itertools import combinations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .nn import PosEnc, TransformerEncoder

# The first projection consumes RAW slot features, whose informative
# directions can sit orders of magnitude below the per-channel offsets
# (round-3 PHYRE probe: label direction ~0.5% of channel scale). The TPU's
# default matmul runs bf16 MXU passes (~0.4% relative rounding), which
# swamps such signals AND breaks the standardization->in_proj fold identity
# (measured on hardware: max|dlogit| 1.15 at bf16 vs 1.3e-5 at f32 —
# experiments/phyre_fake_pipeline.py). The reference computes this layer in
# f32 CUDA; pin f32 here too. Cost is negligible (C -> d_model once per
# token); parameter tree unchanged.
_F32 = jax.lax.Precision.HIGHEST


def _bce_with_logits(logits, labels):
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    ).mean()


def _acc_sweep(logits, labels, out: dict) -> dict:
    probs = nn.sigmoid(logits)
    for thresh in np.arange(0.1, 1, 0.2):
        acc = ((probs > thresh).astype(jnp.float32) == labels).mean()
        out[f"acc_{thresh:.2f}"] = acc
    return out


class PHYREReadout(nn.Module):
    readout_dict: dict = None

    def setup(self):
        rd = self.readout_dict or {}
        self.num_slots = rd.get("num_slots", 8)
        self.slot_size = rd.get("slot_size", 128)
        self.sel_slots = tuple(rd.get("sel_slots", (0, 3)))
        self.T = len(self.sel_slots)
        d_model = rd.get("d_model", 128)
        self.in_proj = nn.Dense(d_model, precision=_F32)
        self.cls_param = self.param("CLS", nn.initializers.zeros, (1, 1, d_model))
        self.transformer_encoder = TransformerEncoder(
            d_model=d_model,
            num_layers=rd.get("num_layers", 4),
            num_heads=rd.get("num_heads", 8),
            ffn_dim=rd.get("ffn_dim", 512),
            norm_first=rd.get("norm_first", True),
        )
        self.enc_t_pe = PosEnc(rd.get("t_pe", "sin"), self.T, d_model)
        self.cls_mlp_0 = nn.Dense(d_model)
        self.cls_mlp_1 = nn.Dense(1)

    def __call__(self, batch: dict, deterministic: bool = True):
        slots = batch["slots"]  # [B, T_full, N, C]
        slots = jnp.stack([slots[:, i] for i in self.sel_slots], axis=1)
        slots = self.in_proj(slots)  # [B, T, N, D]
        B, T, N, D = slots.shape
        pe = self.enc_t_pe()  # [1, T, D]
        slots = (slots + pe[:, :, None, :].astype(slots.dtype)).reshape(
            B, T * N, D
        )
        cls_tok = jnp.broadcast_to(self.cls_param, (B, 1, D))
        x = jnp.concatenate([cls_tok, slots], axis=1)
        x = self.transformer_encoder(x, deterministic=deterministic)
        logits = self.cls_mlp_1(nn.relu(self.cls_mlp_0(x[:, 0])))[:, 0]
        return {"logits": logits}  # [B]

    def calc_train_loss(self, batch: dict, out: dict) -> dict:
        labels = batch["label"].reshape(-1).astype(jnp.float32)
        return {"vqa_loss": _bce_with_logits(out["logits"].reshape(-1), labels)}

    def train_loss(self, batch: dict) -> dict:
        out = self(batch, deterministic=False)
        return self.calc_train_loss(batch, out)

    def eval_loss(self, batch: dict) -> dict:
        out = self(batch, deterministic=True)
        losses = self.calc_train_loss(batch, out)
        labels = batch["label"].reshape(-1).astype(jnp.float32)
        return _acc_sweep(out["logits"].reshape(-1), labels, losses)


class PhysionReadout(nn.Module):
    readout_dict: dict = None

    def setup(self):
        rd = self.readout_dict or {}
        self.num_slots = rd.get("num_slots", 6)
        self.slot_size = rd.get("slot_size", 192)
        self.agg_func = rd.get("agg_func", "max")
        assert self.agg_func in ("sum", "mean", "max")
        feats_dim = rd.get("feats_dim", 192)
        combs = list(combinations(range(self.num_slots), 2))
        self.comb_idx = np.asarray(combs, np.int32)  # [num_combs, 2]
        self.linear1 = nn.Dense(feats_dim, precision=_F32)
        self.linear2 = nn.Dense(1)

    def __call__(self, batch: dict, deterministic: bool = True):
        slots = batch["slots"]  # [B, T, N, C]
        B, T, N, C = slots.shape
        pairs = slots[:, :, self.comb_idx]  # [B, T, num_combs, 2, C]
        pairs = pairs.reshape(B, T, -1, 2 * C)
        rel = self.linear1(pairs)  # [B, T, num_combs, F]
        if self.agg_func == "sum":
            rel = rel.sum(2)
        elif self.agg_func == "mean":
            rel = rel.mean(2)
        else:
            rel = rel.max(2)
        logits = self.linear2(rel)[..., 0]  # [B, T]
        return {"logits": logits.max(1)}  # contact at ANY timestep

    def calc_train_loss(self, batch: dict, out: dict) -> dict:
        labels = batch["label"].reshape(-1).astype(jnp.float32)
        return {"vqa_loss": _bce_with_logits(out["logits"].reshape(-1), labels)}

    def train_loss(self, batch: dict) -> dict:
        out = self(batch, deterministic=False)
        return self.calc_train_loss(batch, out)

    def eval_loss(self, batch: dict) -> dict:
        out = self(batch, deterministic=True)
        losses = self.calc_train_loss(batch, out)
        labels = batch["label"].reshape(-1).astype(jnp.float32)
        return _acc_sweep(out["logits"].reshape(-1), labels, losses)
