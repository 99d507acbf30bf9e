"""Slot Attention — the core grouping module.

Behavioral spec from the reference
(/root/reference/slotformer/base_slots/models/savi.py:16-110 and
steve.py:13-73 for the mask-returning variant):

  * LN the inputs once; project k, v once per call.
  * ``num_iterations`` rounds (2 typical, statically unrolled so XLA fuses
    the whole block):
      - q = Linear(LN(slots)) (no bias)
      - attn = softmax over the SLOT axis of scale * k·qᵀ   [B, HW, S]
      - renormalize over the spatial axis (+eps), weighted mean of v
      - slots = GRUCell(update=input, slots_prev=hidden)
      - slots += MLP(LN(slots))
  * the inverted-softmax (over slots, not over keys) is what makes slots
    compete for pixels — this is the defining difference from standard
    cross-attention.

All matmuls are [B·HW, D]-shaped — large and MXU-friendly. A fused Pallas
kernel for the iteration body lives in ``slotformer_tpu.ops`` and can be
enabled via ``use_pallas`` (same math, fewer HBM round-trips).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class SlotAttentionBase(nn.Module):
    in_features: int
    num_iterations: int
    num_slots: int
    slot_size: int
    mlp_hidden_size: int
    eps: float = 1e-6
    # opt-in fused Pallas kernel for the attention update (see
    # ops/slot_attention_kernel.py STATUS note — XLA currently wins at
    # reference shapes, the kernel is kept for future shapes/dtypes)
    use_pallas: bool = False

    def setup(self):
        self.norm_inputs = nn.LayerNorm()
        self.project_q_norm = nn.LayerNorm()
        self.project_q = nn.Dense(self.slot_size, use_bias=False)
        self.project_k = nn.Dense(self.slot_size, use_bias=False)
        self.project_v = nn.Dense(self.slot_size, use_bias=False)
        self.gru = nn.GRUCell(features=self.slot_size)
        self.mlp_norm = nn.LayerNorm()
        self.mlp_hidden = nn.Dense(self.mlp_hidden_size)
        self.mlp_out = nn.Dense(self.slot_size)

    def _iterate(
        self, k: jnp.ndarray, v: jnp.ndarray, slots: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One slot-attention round. Returns (new_slots, attn [B, HW, S])."""
        scale = self.slot_size**-0.5
        q = self.project_q(self.project_q_norm(slots))  # [B, S, D]
        if self.use_pallas:
            from ..ops import slot_attention_update

            updates, attn = slot_attention_update(k, v, q * scale, self.eps)
        else:
            attn_logits = scale * jnp.einsum("bnd,bsd->bns", k, q)
            attn = nn.softmax(attn_logits, axis=-1)  # over slots: competition
            # renormalize over the spatial dim, weighted mean of values
            attn_w = attn + self.eps
            attn_w = attn_w / jnp.sum(attn_w, axis=1, keepdims=True)
            updates = jnp.einsum("bns,bnd->bsd", attn_w, v)
        # GRU update: carry = prev slots, input = updates
        new_slots, _ = self.gru(slots, updates)
        new_slots = new_slots + self.mlp_out(
            nn.relu(self.mlp_hidden(self.mlp_norm(new_slots)))
        )
        return new_slots, attn

    def _run(self, inputs: jnp.ndarray, slots: jnp.ndarray):
        assert inputs.ndim == 3 and slots.ndim == 3, (inputs.shape, slots.shape)
        x = self.norm_inputs(inputs)
        k = self.project_k(x)
        v = self.project_v(x)
        attn = None
        for _ in range(self.num_iterations):
            slots, attn = self._iterate(k, v, slots)
        return slots, attn


class SlotAttention(SlotAttentionBase):
    """Returns the refined slots only (SAVi path)."""

    def __call__(self, inputs: jnp.ndarray, slots: jnp.ndarray) -> jnp.ndarray:
        slots, _ = self._run(inputs, slots)
        return slots


class SlotAttentionWMask(SlotAttentionBase):
    """Also returns the last-iteration attention as segmentation masks.

    Reference: steve.py:13-73 — STEVE reads slot masks off the final
    attention map ([B, HW, S] -> [B, S, HW]).
    """

    def __call__(self, inputs: jnp.ndarray, slots: jnp.ndarray):
        slots, attn = self._run(inputs, slots)
        masks = jnp.transpose(attn, (0, 2, 1))  # [B, S, HW]
        return slots, masks
