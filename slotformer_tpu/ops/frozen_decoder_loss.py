"""Frozen-decoder image-reconstruction loss with a hand-written backward.

The SlotFormer training step is dominated by the FROZEN spatial-broadcast
decoder's img-recon loss (~80% of the step, docs/benchmark.md trace): the
decoder's dW is dead (stop_gradient + optimizer freeze) so the backward
only needs d(loss)/d(slots) — yet jax AD still saves every f32
pre-activation for the relu backwards (10.9 GB at the CLEVRER train shape,
F=640 x S=7 -> 64x64) and the step is HBM-bound on that traffic
(experiments/dec_bwd_probe_r4.py roofline: 39.8 ms HBM floor vs 50.8 ms
compute floor, measured 137.8 ms).

This op computes the same loss with a custom_vjp whose residuals are:
  * ONE BOOL MASK per deconv layer (relu sign, 1 byte/elem = 4x less than
    the f32 pre-activation)          -> 2.7 GB instead of 10.9 GB
  * the out-conv head outputs (softmax masks + rgb, [F,S,H,W,4])
  * the masked residual diff [F,H,W,3]
and whose backward is the analytically exact chain:
  d(mse) -> softmax/compositing vjp -> 1x1 conv^T -> per-layer
  (mask * conv_transpose^T) via jax.linear_transpose — which never touches
  the layer inputs (a transposed conv is linear in x; its transpose needs
  only W).

Gradients are EXACT (same linear ops, float reassociation only) — pinned
against jax.grad of the plain decoder loss in
tests/test_models.py::test_frozen_decoder_custom_bwd_matches_autodiff.

Supports the reference decoder family: norm-free DeconvNormAct stacks
(dec_norm='', odd kernel, stride schedule 2-until-resolution-then-1,
reference savi.py:252-293) + 1x1 out conv + softmax-over-slots
compositing + optional vid_len masking (slotformer.py:306-318).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.nn import _dense_conv_transpose, build_grid


def _layer_specs(dec_channels, dec_resolution, resolution, ks):
    """(stride, pad_lo) per deconv layer — the DeconvNormAct geometry."""
    specs = []
    out_size = dec_resolution[0]
    stride = 2
    for _ in range(len(dec_channels) - 1):
        if out_size == resolution[0]:
            stride = 1
        specs.append((stride, ks - 1 - ks // 2))
        out_size *= stride
    assert out_size == resolution[0], (out_size, resolution)
    return tuple(specs)


def _decode_fwd(params, slots, cfg):
    """Manual SpatialBroadcastDecoder forward mirroring models/savi.py
    (param tree layout: pos_embedding/dense, deconv_i/ConvTranspose_0,
    out_conv). Returns (out [B', H, W, 4], relu_masks)."""
    dec_channels, dec_resolution, resolution, ks = cfg
    Bp, D = slots.shape[0], slots.shape[-1]
    H0, W0 = dec_resolution
    x = jnp.broadcast_to(slots[:, None, None, :], (Bp, H0, W0, D))
    grid = jnp.asarray(build_grid(dec_resolution), x.dtype)
    pe = params["pos_embedding"]["dense"]
    emb = grid @ pe["kernel"] + pe["bias"]
    x = x + emb
    masks = []
    for i, (s, pad_lo) in enumerate(
        _layer_specs(dec_channels, dec_resolution, resolution, ks)
    ):
        p = params[f"deconv_{i}"]["ConvTranspose_0"]
        x = _dense_conv_transpose(x, p["kernel"], ks, s, pad_lo) + p["bias"]
        m = x > 0
        masks.append(m)
        x = jnp.where(m, x, 0.0)
    oc = params["out_conv"]
    out = jax.lax.conv_general_dilated(
        x, oc["kernel"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + oc["bias"]
    return out, tuple(masks)


def _composite_and_loss(out, gt, w, denom, num_slots):
    """out [F*S, H, W, 4] -> (loss, softmax masks m, rgb r, diff).

    loss = sum_f w_f * sum_hw (recon_f - gt_f)^2 / denom. Callers pass
    denom = sum(w) * H*W*C (+eps) — the model normalization
    (models/slotformer.py), which equals plain mean when w == 1; an
    explicit denom lets a chunked caller sum per-chunk partial losses
    under ONE global normalizer.

    The residual diff and the SSE reduction are computed in f32 even when
    the decode ran in bf16 (AMP): 12k-term squared-error sums lose ~1e-2
    relative accuracy in bf16, and the sibling paths
    (slotformer._bf16_img_recon_loss) upcast before the error too.
    """
    FS = out.shape[0]
    S = num_slots
    F = FS // S
    out = out.reshape(F, S, out.shape[1], out.shape[2], 4)
    r = out[..., :3]
    m = jax.nn.softmax(out[..., 3], axis=1)  # over slots
    recon = jnp.einsum("fshw,fshwc->fhwc", m, r)
    diff = recon.astype(jnp.float32) - gt.astype(jnp.float32)  # [F, H, W, 3]
    sse_f = (diff ** 2).sum(axis=(1, 2, 3))  # [F] per-frame SSE, f32
    loss = (sse_f * w.astype(jnp.float32)).sum() / denom
    return loss, m, r, diff, sse_f


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def frozen_decoder_recon_loss(
    params, slots, gt, w, denom,
    cfg: Tuple, num_slots: int,
) -> jnp.ndarray:
    """sum_f w_f * SSE(composite(decode(slots))_f, gt_f) / denom, decoder
    FROZEN.

    params: decoder param tree (treated as constants — zero cotangent);
    slots [F, S, D]; gt [F, H, W, 3]; w [F] frame weights (vid_len
    masking); denom: scalar normalizer — sum(w)*H*W*C gives the plain
    (weighted) mean; a chunked caller passes the GLOBAL denom and sums the
    per-chunk partial losses. cfg = (dec_channels, dec_resolution,
    resolution, ks) as static tuples.
    """
    flat = slots.reshape(-1, slots.shape[-1])
    out, _ = _decode_fwd(params, flat, cfg)
    loss = _composite_and_loss(out, gt, w, denom, num_slots)[0]
    return loss


def _fwd(params, slots, gt, w, denom, cfg, num_slots):
    flat = slots.reshape(-1, slots.shape[-1])
    out, relu_masks = _decode_fwd(params, flat, cfg)
    loss, m, r, diff, sse_f = _composite_and_loss(out, gt, w, denom, num_slots)
    # 0-d dtype carriers: cotangents must match the primal dtypes exactly
    # (e.g. bf16 slots/gt under AMP while the loss chain runs f32)
    slots_dt = jnp.zeros((), slots.dtype)
    gt_dt = jnp.zeros((), gt.dtype)
    res = (params, relu_masks, m, r, diff, sse_f, denom, w, slots.shape,
           slots_dt, gt_dt)
    return loss, res


def _bwd(cfg, num_slots, res, g):
    (params, relu_masks, m, r, diff, sse_f, denom, w, slots_shape,
     slots_dt, gt_dt) = res
    dec_channels, dec_resolution, resolution, ks = cfg
    F, H, W = diff.shape[:3]
    S = num_slots
    D = slots_shape[-1]
    w32 = w.astype(jnp.float32)
    den32 = denom.astype(jnp.float32)
    g32 = g.astype(jnp.float32)

    # d loss / d recon = 2 * diff * w / denom   (then scaled by upstream g)
    drecon = diff * (2.0 * w32[:, None, None, None] / den32) * g32
    # compositing: recon = sum_s m_s * r_s
    dr = m[..., None] * drecon[:, None]  # [F, S, H, W, 3]
    dm = jnp.einsum("fhwc,fshwc->fshw", drecon, r)
    # softmax over slots
    dz = m * (dm - (m * dm).sum(axis=1, keepdims=True))  # [F, S, H, W]
    dout = jnp.concatenate([dr, dz[..., None]], axis=-1)
    dout = dout.reshape(F * S, H, W, 4)

    # 1x1 out conv transpose: dy = dout @ W^T. The heavy transpose chain
    # runs in the decoder's compute dtype (bf16 under AMP — same as
    # autodiff of a bf16 decode, and keeps the convs on the bf16 MXU
    # path); only the loss-side elementwise math above is upcast to f32.
    woc = params["out_conv"]["kernel"][0, 0]  # [Cin, 4]
    dy = dout.astype(woc.dtype) @ woc.T  # [F*S, H, W, Cin]

    specs = _layer_specs(dec_channels, dec_resolution, resolution, ks)
    for i in reversed(range(len(specs))):
        s, pad_lo = specs[i]
        mask = relu_masks[i]
        dy = jnp.where(mask, dy, 0.0)
        kern = params[f"deconv_{i}"]["ConvTranspose_0"]["kernel"]
        in_shape = (
            dy.shape[0], dy.shape[1] // s, dy.shape[2] // s, kern.shape[3]
        )
        # transpose of the (linear-in-x) transposed conv; needs only W —
        # the layer input is never saved
        f = lambda x: _dense_conv_transpose(x, kern, ks, s, pad_lo)  # noqa: E731
        (dy,) = jax.linear_transpose(
            f, jax.ShapeDtypeStruct(in_shape, dy.dtype))(dy)

    # position embedding is additive; broadcast bwd sums over space
    dslots = dy.sum(axis=(1, 2)).reshape(F, S, D)

    zeros_p = jax.tree.map(jnp.zeros_like, params)  # frozen
    dgt = (-2.0 * g32 * diff * w32[:, None, None, None] / den32).astype(
        gt_dt.dtype)
    # loss = (sse . w) / denom  =>  exact cotangents for the frame weights
    # and the normalizer too (a caller with learnable frame weights gets
    # correct grads, not silent zeros)
    dw = (g32 * sse_f / den32).astype(w.dtype)
    ddenom = (-g32 * (sse_f * w32).sum() / den32 ** 2).astype(denom.dtype)
    return (zeros_p, dslots.reshape(slots_shape).astype(slots_dt.dtype),
            dgt, dw, ddenom)


frozen_decoder_recon_loss.defvjp(_fwd, _bwd)
