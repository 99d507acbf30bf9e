"""Discrete VAE image tokenizer (dVAE).

Behavioral spec: /root/reference/slotformer/base_slots/models/dVAE.py +
steve_utils.py (SLATE lineage):
  * encoder: 4x4/stride-4 conv block then 7 1x1 blocks -> vocab_size logits
    at H/4 resolution
  * gumbel-softmax sampling with externally-annealed tau (driven per-step by
    the dVAE method, base_slots/method.py:207-221)
  * decoder: 1x1/3x3 blocks with two PixelShuffle(2) upsamples -> RGB
  * ``tokenize``/``detokenize`` used by STEVE and the Physion token dumper
  * MSE reconstruction loss.

NHWC; token logits live on the LAST axis ([B, h, w, vocab] — the reference's
channel-first [B, vocab, h, w] is a CUDA layout).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
_xavier = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


def make_one_hot(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    idx = jnp.argmax(logits, axis=axis)
    return jax.nn.one_hot(idx, logits.shape[axis], axis=axis, dtype=logits.dtype)


def gumbel_softmax(
    logits: jnp.ndarray,
    rng: jax.Array,
    tau=1.0,
    hard: bool = False,
    axis: int = -1,
) -> jnp.ndarray:
    """Gumbel-softmax with optional straight-through (steve_utils.py:28-46)."""
    eps = jnp.finfo(logits.dtype).tiny
    u = jax.random.uniform(rng, logits.shape, logits.dtype, minval=eps, maxval=1.0)
    gumbels = -jnp.log(-jnp.log(u) + eps)
    y_soft = jax.nn.softmax((logits + gumbels) / tau, axis=axis)
    if hard:
        y_hard = make_one_hot(y_soft, axis=axis)
        return y_hard - jax.lax.stop_gradient(y_soft) + y_soft
    return y_soft


class Conv2dBlock(nn.Module):
    """conv (no bias) + GroupNorm(1) + relu (steve_utils.py:103-127)."""

    out_channels: int
    kernel_size: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME" if self.kernel_size > 1 else "VALID",
            use_bias=False,
            kernel_init=_kaiming,
        )(x)
        x = nn.GroupNorm(num_groups=1)(x)
        return nn.relu(x)


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """NHWC pixel shuffle matching torch semantics (channel index c*r*r+i*r+j)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H, W, C // (r * r), r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b h i w j c
    return x.reshape(B, H * r, W * r, C // (r * r))


class dVAE(nn.Module):
    vocab_size: int = 4096
    img_channels: int = 3

    def setup(self):
        self.encoder = [
            Conv2dBlock(64, 4, 4, name="enc_0"),
            *[Conv2dBlock(64, 1, 1, name=f"enc_{i}") for i in range(1, 7)],
        ]
        self.enc_out = nn.Conv(
            self.vocab_size, (1, 1), use_bias=True, kernel_init=_xavier,
            name="enc_out",
        )
        self.decoder = [
            Conv2dBlock(64, 1, name="dec_0"),
            Conv2dBlock(64, 3, name="dec_1"),
            Conv2dBlock(64, 1, name="dec_2"),
            Conv2dBlock(64, 1, name="dec_3"),
            Conv2dBlock(256, 1, name="dec_4"),  # -> PixelShuffle(2)
            Conv2dBlock(64, 3, name="dec_5"),
            Conv2dBlock(64, 1, name="dec_6"),
            Conv2dBlock(64, 1, name="dec_7"),
            Conv2dBlock(256, 1, name="dec_8"),  # -> PixelShuffle(2)
        ]
        self.dec_out = nn.Conv(
            self.img_channels, (1, 1), use_bias=True, kernel_init=_xavier,
            name="dec_out",
        )

    # ------------------------------------------------------------ components
    def _flatten_time(self, x):
        if x.ndim == 5:
            B = x.shape[0]
            return x.reshape((-1,) + x.shape[2:]), B
        return x, None

    def _unflatten_time(self, x, B):
        if B is None:
            return x
        return x.reshape((B, -1) + x.shape[1:])

    def encode_logits(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """[B', H, W, 3] -> [B', h, w, vocab] logits."""
        x = imgs
        for layer in self.encoder:
            x = layer(x)
        return self.enc_out(x)

    def tokenize(self, imgs: jnp.ndarray, one_hot: bool = True):
        """[B(, T), H, W, 3] -> one-hot [.., h, w, vocab] or ids [.., h, w]."""
        x, B = self._flatten_time(imgs)
        logits = self.encode_logits(x)
        z = make_one_hot(logits, axis=-1) if one_hot else logits.argmax(-1)
        return self._unflatten_time(z, B)

    def detokenize(self, z: jnp.ndarray) -> jnp.ndarray:
        """[B(, T), h, w, vocab] probabilities -> [B(, T), H, W, 3]."""
        assert z.shape[-1] == self.vocab_size
        x, B = self._flatten_time(z)
        for i, layer in enumerate(self.decoder):
            x = layer(x)
            if i in (4, 8):
                x = pixel_shuffle(x, 2)
        x = self.dec_out(x)
        return self._unflatten_time(x, B)

    # --------------------------------------------------------------- forward
    def __call__(
        self,
        batch: dict,
        tau: float = 1.0,
        hard: bool = False,
        deterministic: bool = True,
        testing: bool = False,
    ):
        if testing:
            return self.tokenize(batch["img"], one_hot=False)
        x, B = self._flatten_time(batch["img"])
        logits = self.encode_logits(x)
        z_logits = jax.nn.log_softmax(logits, axis=-1)
        z = gumbel_softmax(z_logits, self.make_rng("sample"), tau, hard, axis=-1)
        recon = self.detokenize(z)
        return {
            "recon": self._unflatten_time(recon, B),
            "z_logits": self._unflatten_time(z_logits, B),
        }

    # ---------------------------------------------------------------- losses
    def calc_train_loss(self, batch: dict, out: dict) -> dict:
        return {"recon_loss": jnp.mean((out["recon"] - batch["img"]) ** 2)}

    def train_loss(self, batch: dict, tau: float = 1.0, hard: bool = False) -> dict:
        out = self(batch, tau=tau, hard=hard, deterministic=False)
        return self.calc_train_loss(batch, out)

    def eval_loss(self, batch: dict) -> dict:
        out = self(batch, tau=0.1, hard=False, deterministic=True)
        return self.calc_train_loss(batch, out)
