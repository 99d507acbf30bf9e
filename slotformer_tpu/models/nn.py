"""Flax NN building blocks.

Replaces the ``nerv.models`` helpers the reference relies on
(``conv_norm_act`` / ``deconv_norm_act`` / ``build_transformer_encoder`` /
``build_pos_enc`` — SURVEY.md §2.1 R8) plus the model-local utilities in
/root/reference/slotformer/base_slots/models/utils.py (SoftPositionEmbed,
build_grid, to_rgb_from_tensor).

TPU-native conventions:
  * images are NHWC (``[B, H, W, C]``) — the layout XLA:TPU tiles natively;
    the reference's NCHW is a CUDA convention we do not inherit.
  * compute dtype is configurable (bf16 policy applied by the caller);
    params stay f32.
  * transformer encoder supports key-padding masks (required by the Aloe VQA
    head, reference clevrer_vqa/models/transformer.py:204-205).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# LayerNorm with two-pass variance. flax's default (use_fast_variance=True,
# one-pass E[x^2]-E[x]^2 stats) compiles to a pathological fusion on TPU when
# the producer is a conv stack: the SAVi FrameEncoder forward measured 207 ms
# vs 31 ms on v5e (B*T=384, 64x64) with nothing changed but this flag
# (round-3 probe; docs/benchmark.md). Two-pass stats are also the numerically
# safer variance. Every model LayerNorm goes through this alias; parameter
# names/shapes are identical to nn.LayerNorm, so checkpoints are unaffected.
def LayerNorm(*args, **kwargs) -> nn.LayerNorm:
    kwargs.setdefault("use_fast_variance", False)
    return nn.LayerNorm(*args, **kwargs)


def _act(name: str) -> Callable:
    if not name:
        return lambda x: x
    return {
        "relu": nn.relu,
        "gelu": nn.gelu,
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
    }[name]


class ConvNormAct(nn.Module):
    """Conv2D (+ optional GroupNorm) (+ optional activation), NHWC.

    Equivalent surface of nerv's ``conv_norm_act`` as the reference uses it
    (savi.py:230-240: k5 convs, stride 2 on the first layer for 128x128
    inputs, '' norm, relu between layers).
    """

    out_channels: int
    kernel_size: int = 5
    stride: int = 1
    norm: str = ""
    act: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME",
        )(x)
        if self.norm == "gn":
            x = nn.GroupNorm(num_groups=1)(x)
        elif self.norm:
            raise NotImplementedError(f"norm {self.norm}")
        return _act(self.act)(x)


def _dense_conv_transpose(
    x: jnp.ndarray, kernel: jnp.ndarray, k: int, s: int, pad_lo: int
) -> jnp.ndarray:
    """XLA's input-dilated transposed conv (the nn.ConvTranspose lowering)."""
    pad = (pad_lo, pad_lo + s - 1)
    # default dimension_numbers ('NHWC','HWIO','NHWC') + transpose_kernel
    # exactly as flax ConvTranspose does: the [kH,kW,out,in]-stored kernel
    # is spatially flipped and in/out-swapped inside lax.conv_transpose
    return jax.lax.conv_transpose(
        x, kernel, (s, s), (pad, pad), transpose_kernel=True
    )


def _phase_conv_transpose(
    x: jnp.ndarray, kernel: jnp.ndarray, k: int, s: int, pad_lo: int
) -> jnp.ndarray:
    """``lax.conv_transpose(transpose_kernel=True, padding=((pad_lo,
    pad_lo+s-1),)*2)`` computed as ``s*s`` regular *phase* convolutions.

    XLA lowers a transposed conv via input dilation (``lhs_dilation=s``):
    the MXU then multiplies the interleaved zeros, wasting up to ``s^2``x
    the useful work. Each output phase ``(a, b) = (o_h % s, o_w % s)`` only
    ever reads the non-zero taps ``W[t0+j*s]`` — a small dense conv over
    the UNDILATED input. Computing the phases separately and interleaving
    (sub-pixel / depth-to-space identity) is the same function, summing
    only the non-zero products (float reassociation only; exactness is
    pinned by tests/test_models.py::test_phase_deconv_matches_dilated).

    ``x``: [B, H, W, Cin]; ``kernel``: [kH, kW, out, in] (the
    ``transpose_kernel=True`` storage layout). Returns [B, s*H, s*W, out].
    """
    # correlation taps of the transposed conv: spatially flipped, in/out
    # swapped to HWIO (what lax.conv_transpose does internally)
    wf = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))  # [k, k, in, out]
    B, H, W, _ = x.shape
    co = kernel.shape[2]

    def taps(a: int):
        """Row/col phase a: first tap index, tap count, conv pads."""
        t0 = (pad_lo - a) % s
        n = len(range(t0, k, s))
        delta = (a - pad_lo + t0) // s  # input offset of the first tap
        return t0, n, (-delta, n - 1 + delta)

    phases = []
    for a in range(s):
        t0a, _, pad_a = taps(a)
        for b in range(s):
            t0b, _, pad_b = taps(b)
            phases.append(
                jax.lax.conv_general_dilated(
                    x,
                    wf[t0a::s, t0b::s],
                    window_strides=(1, 1),
                    padding=(pad_a, pad_b),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
    y = jnp.stack(phases, 0).reshape(s, s, B, H, W, co)
    return y.transpose(2, 3, 0, 4, 1, 5).reshape(B, s * H, s * W, co)


# Phase forward + dense backward (measured on v5e, CLEVRER decoder shapes,
# experiments/phase_deconv_probe.py): the phase decomposition wins the
# FORWARD (decode 30.0 vs 32.7 ms = 1.09x) but loses the backward badly
# (dx through 4 phase convs vs ONE strided dense conv: SlotFormer train
# 278.6 vs 165.4 ms). custom_vjp takes both bests; the backward is the
# dense lowering's exact VJP, so gradients are bitwise those of the dense
# path. The unused dense forward inside jax.vjp is dead-code-eliminated
# (conv_transpose is linear in both args; its VJP never reads the output).
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _deconv_phase_fwd_dense_bwd(x, kernel, k: int, s: int, pad_lo: int):
    return _phase_conv_transpose(x, kernel, k, s, pad_lo)


def _deconv_fwd(x, kernel, k, s, pad_lo):
    return _phase_conv_transpose(x, kernel, k, s, pad_lo), (x, kernel)


def _deconv_bwd(k, s, pad_lo, res, g):
    x, kernel = res
    _, vjp = jax.vjp(
        lambda xx, kk: _dense_conv_transpose(xx, kk, k, s, pad_lo), x, kernel
    )
    return vjp(g)


_deconv_phase_fwd_dense_bwd.defvjp(_deconv_fwd, _deconv_bwd)


def _dts_conv_transpose(
    x: jnp.ndarray, kernel: jnp.ndarray, k: int, s: int, pad_lo: int
) -> jnp.ndarray:
    """The same transposed conv as ONE ``ceil(k/s)``-tap regular conv with
    ``s*s*out`` output channels, followed by depth-to-space.

    Improves on :func:`_phase_conv_transpose` in both dimensions that made
    it lose on hardware: a single conv with s^2-wider output channels
    (k=5/s=2 decoder: 3x3x128->256 — full MXU lanes instead of 4 separate
    64-channel convs), and NO custom_vjp barrier — plain AD differentiates
    through it, and the backward wrt x is an s=1 transposed conv (no
    input-dilation waste anywhere). Per s=2 output pixel this pays 9/25 of
    the naive dilated lowering's MACs (optimal is 25/4).

    Derivation: output ``o = s*i + a`` reads ``x[i + m + e_a]`` with weight
    ``wf[t0_a + m*s]`` (``t0_a = (pad_lo - a) % s``, ``e_a = (a + t0_a -
    pad_lo)/s``); all phases' taps fit a common window of ``k' =
    max_a(e_a + n_a) - min_a(e_a)`` input pixels, so zero-padding each
    phase's taps into position gives one weight ``W'[k', k', cin,
    (a*s+b)*co + c]`` and ``y = depth_to_space(conv(x, W'))``. Exactness
    (float reassociation only) is pinned by
    tests/test_models.py::test_phase_deconv_matches_dilated[mode 2].
    """
    wf = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))  # [k, k, in, out]
    B, H, W, ci = x.shape
    co = kernel.shape[2]

    def taps(a: int):
        t0 = (pad_lo - a) % s
        n = len(range(t0, k, s))
        e = (a + t0 - pad_lo) // s  # exact: a + t0 - pad_lo is a multiple of s
        return t0, n, e

    infos = [taps(a) for a in range(s)]
    lo = -min(e for _, _, e in infos)
    kp = max(e + n for _, n, e in infos) + lo

    wp = jnp.zeros((kp, kp, ci, s * s * co), wf.dtype)
    for a, (t0a, na, ea) in enumerate(infos):
        ua = ea + lo
        for b, (t0b, nb, eb) in enumerate(infos):
            ub = eb + lo
            blk = wf[t0a::s, t0b::s]  # [na, nb, ci, co]
            wp = wp.at[
                ua:ua + na, ub:ub + nb, :, (a * s + b) * co:(a * s + b + 1) * co
            ].set(blk)

    y = jax.lax.conv_general_dilated(
        x, wp, window_strides=(1, 1),
        padding=((lo, kp - 1 - lo), (lo, kp - 1 - lo)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.reshape(B, H, W, s, s, co).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, s * H, s * W, co)


class DeconvNormAct(nn.Module):
    """Transposed Conv2D (+ norm/act), NHWC.

    Bit-exact torch ``ConvTranspose2d(k, stride, padding=k//2,
    output_padding=stride-1)`` semantics (the reference decoder geometry,
    savi.py:265-277): the input is stride-dilated, padded with
    ``k-1-padding`` before / ``k-1-padding+output_padding`` after, and
    correlated with the FLIPPED kernel (``transpose_kernel=True``, the
    gradient-of-conv convention; kernel stored [kH, kW, out, in]). Exactness
    makes reference decoder checkpoints portable via
    ``runtime.torch_compat.savi_decoder`` — golden-tested in
    tests/test_golden_parity.py. flax's ``padding="SAME"`` (unflipped
    kernel, (3, 2) pads at k=5/s=2) is a DIFFERENT function; measured
    max-abs output diff ~1.3 on random weights.

    ``phase`` (0/False = dense, 1/True = 4-conv phase decomposition with a
    dense-VJP custom_vjp, 2 = single-conv depth-to-space decomposition,
    plain AD — see ``_dts_conv_transpose``). ``None`` resolves from env
    ``SF_PHASE_DECONV`` (**default OFF = 0** — the measured decision, both
    alternatives LOSE on v5e despite paying fewer MACs on paper):
      mode 1: 0.51x decode / 0.46x SlotFormer-train post-custom_vjp
        (experiments/logs/phase_deconv_probe_vjp.log) — the 1.09x
        forward-only win did not survive the custom_vjp fusion barrier;
      mode 2: 0.67x decode / 0.90x SlotFormer-train / 0.93x SAVi-train
        (experiments/logs/dts_deconv_probe_r4.log) — XLA's dilated dense
        lowering runs the decoder shapes near its naive-MAC roofline and
        beats the depth-to-space layout shuffles.
    Both modes stay exactness-tested as opt-ins for other hardware.
    """

    out_channels: int
    kernel_size: int = 5
    stride: int = 2
    norm: str = ""
    act: str = "relu"
    phase: Optional[int] = None  # None=env, 0=dense, 1=phase, 2=dts

    def setup(self):
        k, s = self.kernel_size, self.stride
        self._pad_lo = k - 1 - k // 2
        pad = (self._pad_lo, self._pad_lo + s - 1)
        # explicit name: params stay at 'ConvTranspose_0' (the former
        # @nn.compact auto-name) so existing checkpoints load unchanged
        self._ct = nn.ConvTranspose(
            self.out_channels,
            kernel_size=(k, k),
            strides=(s, s),
            padding=(pad, pad),
            transpose_kernel=True,
            name="ConvTranspose_0",
        )
        if self.norm == "gn":
            self._gn = nn.GroupNorm(num_groups=1, name="GroupNorm_0")
        elif self.norm:
            raise NotImplementedError(f"norm {self.norm}")

    def _phase_mode(self, x: jnp.ndarray) -> int:
        if self.stride == 1 or self.is_initializing():
            return 0  # s=1 has no dilation waste; init creates params
        if self.kernel_size % 2 == 0:
            return 0  # even k: torch output is s*H-1, not the phase s*H
        if x.dtype != jnp.float32:
            return 0  # keep the measured-fast path for f32 only
        if self.phase is not None:
            return int(self.phase)
        import os

        raw = os.environ.get("SF_PHASE_DECONV", "0") or "0"
        if raw not in ("0", "1", "2"):
            raise ValueError(
                f"SF_PHASE_DECONV={raw!r}: expected 0 (dense, default), "
                "1 (phase decomposition) or 2 (depth-to-space)")
        return int(raw)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mode = self._phase_mode(x)
        if mode == 2:
            p = self._ct.variables["params"]
            x = _dts_conv_transpose(
                x, p["kernel"], self.kernel_size, self.stride, self._pad_lo
            ) + p["bias"]
        elif mode == 1:
            p = self._ct.variables["params"]
            x = _deconv_phase_fwd_dense_bwd(
                x, p["kernel"], self.kernel_size, self.stride, self._pad_lo
            ) + p["bias"]
        else:
            x = self._ct(x)
        if self.norm == "gn":
            x = self._gn(x)
        return _act(self.act)(x)


class MLP(nn.Module):
    """Linear stack with an activation between layers (none after the last)."""

    features: Sequence[int]
    act: str = "relu"
    norm_first: bool = False  # LayerNorm on the input

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.norm_first:
            x = LayerNorm()(x)
        a = _act(self.act)
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i != len(self.features) - 1:
                x = a(x)
        return x


def build_grid(resolution: Tuple[int, int]) -> np.ndarray:
    """Normalized coordinate grid [1, H, W, 4] = (y, x, 1-y, 1-x).

    Reference: base_slots/models/utils.py:37-44.
    """
    ranges = [np.linspace(0.0, 1.0, num=r, dtype=np.float32) for r in resolution]
    grid = np.stack(np.meshgrid(*ranges, indexing="ij"), axis=-1)
    grid = grid.reshape(resolution[0], resolution[1], -1)[None]
    return np.concatenate([grid, 1.0 - grid], axis=-1)


class SoftPositionEmbed(nn.Module):
    """Project the 4-dim coordinate grid and add to an NHWC feature map.

    Reference: base_slots/models/utils.py:52-63 (there NCHW; here NHWC).
    """

    hidden_size: int
    resolution: Tuple[int, int]

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        grid = jnp.asarray(build_grid(self.resolution), inputs.dtype)
        emb = nn.Dense(self.hidden_size, name="dense")(grid)  # [1, H, W, C]
        return inputs + emb


def to_rgb_from_tensor(x: jnp.ndarray) -> jnp.ndarray:
    """Invert the [-1, 1] normalization back to [0, 1] RGB."""
    return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Positional encodings
# ---------------------------------------------------------------------------

def get_sin_pos_enc(seq_len: int, d_model: int) -> np.ndarray:
    """Sinusoidal absolute PE, [1, L, D].

    NOTE: the reference generates positions in *reverse* order
    (pos = L-1 .. 0, video_prediction/models/slotformer.py:10-16); kept
    bit-identical because rollout quality depends on relative phases only,
    but checkpoint parity matters for debugging.
    """
    inv_freq = 1.0 / (10000 ** (np.arange(0.0, d_model, 2.0) / d_model))
    pos_seq = np.arange(seq_len - 1, -1, -1, dtype=np.float32)
    sinusoid = np.outer(pos_seq, inv_freq)
    pos_emb = np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1)
    return pos_emb[None].astype(np.float32)


class PosEnc(nn.Module):
    """Learnable (zero-init) or frozen-sinusoidal positional embedding.

    Reference: build_pos_enc (slotformer.py:19-32). ``__call__`` returns the
    [1, L, D] table; '' / None kind returns zeros so callers can add blindly.
    """

    kind: str  # '', 'learnable', 'sin'/'sine'
    input_len: int
    d_model: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        if not self.kind:
            return jnp.zeros((1, self.input_len, self.d_model))
        if self.kind == "learnable":
            return self.param(
                "pos_embedding",
                nn.initializers.zeros,
                (1, self.input_len, self.d_model),
            )
        if "sin" in self.kind:
            # constant buffer — not a trainable param
            return jnp.asarray(get_sin_pos_enc(self.input_len, self.d_model))
        raise NotImplementedError(f"unsupported pos enc {self.kind}")


# ---------------------------------------------------------------------------
# Transformer encoder (torch.nn.TransformerEncoder semantics)
# ---------------------------------------------------------------------------

class TransformerEncoderLayer(nn.Module):
    """One encoder block with pre-/post-LN selectable by ``norm_first``.

    Mirrors torch.nn.TransformerEncoderLayer behavior (incl. its default
    dropout=0.1, active in the reference's SlotRollouter / predictors).
    Supports key-padding masks (True = PADDED / ignore, torch convention).
    """

    d_model: int
    num_heads: int
    ffn_dim: int
    norm_first: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        attn_mask = None
        if key_padding_mask is not None:
            # [B, L] True=pad -> attention mask [B, 1, 1, L] True=attend
            attn_mask = ~key_padding_mask[:, None, None, :]

        def mha(h):
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                qkv_features=self.d_model,
                out_features=self.d_model,
                dropout_rate=self.dropout,
                deterministic=deterministic,
                name="self_attn",
            )(h, h, mask=attn_mask)
            return nn.Dropout(self.dropout, deterministic=deterministic)(h)

        def ffn(h):
            h = nn.Dense(self.ffn_dim, name="linear1")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Dense(self.d_model, name="linear2")(h)
            return nn.Dropout(self.dropout, deterministic=deterministic)(h)

        ln1 = LayerNorm(name="norm1")
        ln2 = LayerNorm(name="norm2")
        if self.norm_first:
            x = x + mha(ln1(x))
            x = x + ffn(ln2(x))
        else:
            x = ln1(x + mha(x))
            x = ln2(x + ffn(x))
        return x


class TransformerEncoder(nn.Module):
    """Stack of encoder layers (shared config, unshared params)."""

    d_model: int
    num_layers: int
    num_heads: int
    ffn_dim: int
    norm_first: bool = True
    dropout: float = 0.1
    final_norm: bool = False  # torch adds no final LN by default

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                d_model=self.d_model,
                num_heads=self.num_heads,
                ffn_dim=self.ffn_dim,
                norm_first=self.norm_first,
                dropout=self.dropout,
                name=f"layer_{i}",
            )(x, key_padding_mask=key_padding_mask, deterministic=deterministic)
        if self.final_norm:
            x = LayerNorm(name="final_norm")(x)
        return x


def assert_shape(actual, expected, message: str = "") -> None:
    assert list(actual) == list(expected), (
        f"Expected shape: {expected} but passed shape: {actual}. {message}"
    )


def deconv_out_shape(in_size, stride, padding, kernel_size, out_padding) -> int:
    """Transposed-conv output size (reference uses this to assert geometry)."""
    return (in_size - 1) * stride - 2 * padding + kernel_size + out_padding


def clip_tensor_norm(x: jnp.ndarray, norm: float, axis: int = -1, eps: float = 1e-6):
    """Clip the L2 norm of ``x`` along ``axis`` to at most ``norm``."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    scale = jnp.minimum(norm / (n + eps), 1.0)
    return x * scale
