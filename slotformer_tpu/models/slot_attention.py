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

All matmuls are [B·HW, D]-shaped — large and MXU-friendly. With
``use_pallas=True``, the ENTIRE iteration loop (q-LN/proj, inverted softmax,
renormalized mean, GRU, MLP — all ``num_iterations`` rounds) runs as one
fused Pallas kernel (ops.fused_slot_attention): k/v stream HBM->VMEM once
per call instead of once per iteration and no intermediate touches HBM.
Falls back to the jnp composition when the shape is ineligible (num_slots >
8, one batch element's k/v too big for VMEM, or lane-unaligned D on TPU).
Gradients are exact either way (custom_vjp differentiates the jnp twin).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .nn import LayerNorm


class SlotAttentionBase(nn.Module):
    in_features: int
    num_iterations: int
    num_slots: int
    slot_size: int
    mlp_hidden_size: int
    eps: float = 1e-6
    # fused whole-loop Pallas kernel (ops.fused_slot_attention); measured
    # numbers + eligibility in ops/slot_attention_kernel.py
    use_pallas: bool = False

    def setup(self):
        self.norm_inputs = LayerNorm()
        self.project_q_norm = LayerNorm()
        self.project_q = nn.Dense(self.slot_size, use_bias=False)
        self.project_k = nn.Dense(self.slot_size, use_bias=False)
        self.project_v = nn.Dense(self.slot_size, use_bias=False)
        self.gru = nn.GRUCell(features=self.slot_size)
        self.mlp_norm = LayerNorm()
        self.mlp_hidden = nn.Dense(self.mlp_hidden_size)
        self.mlp_out = nn.Dense(self.slot_size)

    def _iterate(
        self, k: jnp.ndarray, v: jnp.ndarray, slots: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One slot-attention round. Returns (new_slots, attn [B, HW, S])."""
        scale = self.slot_size**-0.5
        q = self.project_q(self.project_q_norm(slots))  # [B, S, D]
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

    def _fused_eligible(self, k: jnp.ndarray) -> bool:
        from ..ops.slot_attention_kernel import S_PAD

        if self.is_initializing() or not self.use_pallas:
            return False  # init must call the jnp path to create params
        if k.dtype != jnp.float32:
            return False  # kernel refs are f32; bf16/AMP falls back to jnp
        N, D = k.shape[1], self.slot_size
        if self.num_slots > S_PAD or N * D > 524_288:
            return False  # VMEM: one batch element's k/v must fit
        on_cpu = jax.default_backend() == "cpu"
        return on_cpu or (D % 128 == 0 and N % 8 == 0)

    def _fused_wp(self) -> dict:
        """Collect the bound submodule params for the fused kernel."""
        p = lambda m: m.variables["params"]  # noqa: E731
        gru = p(self.gru)
        return dict(
            q_ln_scale=p(self.project_q_norm)["scale"],
            q_ln_bias=p(self.project_q_norm)["bias"],
            wq=p(self.project_q)["kernel"],
            w_ir=gru["ir"]["kernel"], w_iz=gru["iz"]["kernel"],
            w_in=gru["in"]["kernel"], w_hr=gru["hr"]["kernel"],
            w_hz=gru["hz"]["kernel"], w_hn=gru["hn"]["kernel"],
            b_ir=gru["ir"]["bias"], b_iz=gru["iz"]["bias"],
            b_in=gru["in"]["bias"], b_hn=gru["hn"]["bias"],
            mlp_ln_scale=p(self.mlp_norm)["scale"],
            mlp_ln_bias=p(self.mlp_norm)["bias"],
            w1=p(self.mlp_hidden)["kernel"], b1=p(self.mlp_hidden)["bias"],
            w2=p(self.mlp_out)["kernel"], b2=p(self.mlp_out)["bias"],
        )

    def project_kv(self, inputs: jnp.ndarray):
        """norm_inputs + k/v projection. Exposed so temporal models can
        hoist this out of their per-frame scan and run it as ONE batched
        matmul over all frames (savi.py encode) — identical math, but
        batched work instead of T serialized small launches."""
        x = self.norm_inputs(inputs)
        return self.project_k(x), self.project_v(x)

    def _run(self, inputs: jnp.ndarray, slots: jnp.ndarray, kv=None):
        assert slots.ndim == 3, slots.shape
        if kv is None:
            assert inputs.ndim == 3, inputs.shape
            k, v = self.project_kv(inputs)
        else:
            k, v = kv
        if self._fused_eligible(k):
            from ..ops import fused_slot_attention

            return fused_slot_attention(
                k, v, slots, self._fused_wp(),
                self.num_iterations, self.num_slots,
                self.slot_size**-0.5, self.eps,
                jax.default_backend() == "cpu",  # interpret off-TPU
            )
        attn = None
        for _ in range(self.num_iterations):
            slots, attn = self._iterate(k, v, slots)
        return slots, attn


class SlotAttention(SlotAttentionBase):
    """Returns the refined slots only (SAVi path)."""

    def __call__(
        self, inputs: jnp.ndarray, slots: jnp.ndarray, kv=None
    ) -> jnp.ndarray:
        slots, _ = self._run(inputs, slots, kv=kv)
        return slots


class SlotAttentionWMask(SlotAttentionBase):
    """Also returns the last-iteration attention as segmentation masks.

    Reference: steve.py:13-73 — STEVE reads slot masks off the final
    attention map ([B, HW, S] -> [B, S, HW]).
    """

    def __call__(self, inputs: jnp.ndarray, slots: jnp.ndarray, kv=None):
        slots, attn = self._run(inputs, slots, kv=kv)
        masks = jnp.transpose(attn, (0, 2, 1))  # [B, S, HW]
        return slots, masks
