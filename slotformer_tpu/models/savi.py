"""StoSAVi / SAVi — slot-based video encoder.

Behavioral spec from /root/reference/slotformer/base_slots/models/savi.py:
  * CNN encoder (k5 convs, stride-2 first layer iff resolution 128) +
    SoftPositionEmbed + 2-layer MLP head            (savi.py:220-250)
  * learnable init latents [1, S, D]                (savi.py:187-188)
  * kernel-distribution head predicting (mu, log_var); stochastic kernels
    sampled as SA init; KLD vs a fixed-variance prior (savi.py:191-200,
    339-365). ``kld_method='none'`` => deterministic SAVi.
  * per-frame recurrence slots(t) = SA(feat(t), sample(kernel(pred(slots(t-1)))))
    (savi.py:393-410) — HERE a single ``nn.scan`` over time, not a python
    loop: one traced step, XLA pipelines the whole clip.
  * spatial-broadcast decoder emitting RGB+mask with softmax-over-slots
    compositing (savi.py:504-525).
  * losses: posterior recon MSE + KLD               (savi.py:527-538)

Intentional divergences (TPU-first):
  * NHWC layout; img tensors are [B, T, H, W, 3] in [-1, 1].
  * the vestigial ``prior_slot_layer`` (kept in the reference only for torch
    ckpt compat, savi.py:203-209) is dropped — we never load torch weights.
  * LSTM/RNN predictor state is threaded through the scan carry instead of
    module-state mutation.
  * the reference's OOM-adaptive test-time chunking (savi.py:421-463) is
    exception-driven and impossible under XLA; long-video encoding instead
    uses a *static* chunk size with slot carry-over (see
    ``cli/extract_slots.py``), which is also what the adaptive loop
    converges to.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .nn import ConvNormAct, DeconvNormAct, LayerNorm, SoftPositionEmbed
from .predictor import build_predictor
from .slot_attention import SlotAttention, SlotAttentionWMask


class KernelDistLayer(nn.Module):
    """Predict (mu, log_var) of the stochastic SA kernels.

    ``kernel_mlp=True`` uses the 2-layer+LN head (savi.py:191-197); False the
    single linear (savi.py:198-200; CLEVRER config uses False).
    """

    slot_size: int
    kernel_mlp: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kernel_mlp:
            x = nn.Dense(self.slot_size * 2)(x)
            x = LayerNorm()(x)
            x = nn.relu(x)
            x = nn.Dense(self.slot_size * 2)(x)
        else:
            x = nn.Dense(self.slot_size * 2)(x)
        return x


class SAViCell(nn.Module):
    """One temporal step: predict -> sample kernels -> slot attention.

    Scanned over the time axis by ``StoSAVi.encode`` with params broadcast
    and the sample/dropout rngs split per step.
    """

    slot_size: int
    slot_mlp_size: int
    num_slots: int
    num_iterations: int
    in_features: int
    pred_dict: dict
    kernel_mlp: bool
    stochastic: bool  # kld_method != 'none'
    with_mask: bool = False
    # STEVE has no kernel-distribution head: predictor output feeds SA
    # directly (steve.py:198-222)
    use_kernel_head: bool = True
    eps: float = 1e-6

    def setup(self):
        self.predictor = build_predictor(
            self.slot_size, self.slot_mlp_size, self.pred_dict
        )
        if self.use_kernel_head:
            self.kernel_dist_layer = KernelDistLayer(
                self.slot_size, kernel_mlp=self.kernel_mlp
            )
        sa_cls = SlotAttentionWMask if self.with_mask else SlotAttention
        self.slot_attention = sa_cls(
            in_features=self.in_features,
            num_iterations=self.num_iterations,
            num_slots=self.num_slots,
            slot_size=self.slot_size,
            mlp_hidden_size=self.slot_mlp_size,
            eps=self.eps,
        )

    def __call__(self, carry, feat_t, is_first, deterministic: bool = True,
                 eps_t: Optional[jnp.ndarray] = None, kv_t=None):
        """``kv_t``: optional precomputed (k_t, v_t) — the norm+projection is
        hoisted out of the temporal scan by encode() and fed per-frame, so
        the scan body only runs the genuinely sequential work."""
        slots, pred_state = carry

        pred_out, new_state = self.predictor(
            slots, pred_state, deterministic=deterministic
        )
        # t=0 (fresh video): SA is seeded from the init latents themselves,
        # the predictor output is discarded and its state must not advance.
        latents = jnp.where(is_first, slots, pred_out)
        pred_state = jax.tree.map(
            lambda old, new: jnp.where(is_first, old, new), pred_state, new_state
        )

        if self.use_kernel_head:
            kernel_dist = self.kernel_dist_layer(latents)
            mu, log_var = jnp.split(kernel_dist, 2, axis=-1)
            if self.stochastic:
                # eps_t: externally prescribed noise ([B, S, D]) for
                # noise-matched training-trajectory parity tests vs the
                # reference torch model; normal path samples from the
                # 'sample' rng stream
                eps = (
                    eps_t.astype(mu.dtype) if eps_t is not None
                    else jax.random.normal(
                        self.make_rng("sample"), mu.shape, mu.dtype)
                )
                kernels = mu + eps * jnp.exp(0.5 * log_var)
            else:
                kernels = mu
        else:
            kernel_dist = jnp.concatenate([latents, jnp.zeros_like(latents)], -1)
            kernels = latents

        n_tok = feat_t.shape[1] if kv_t is None else kv_t[0].shape[1]
        bsz = feat_t.shape[0] if kv_t is None else kv_t[0].shape[0]
        if self.with_mask:
            post_slots, masks = self.slot_attention(feat_t, kernels, kv=kv_t)
        else:
            post_slots = self.slot_attention(feat_t, kernels, kv=kv_t)
            masks = jnp.zeros((bsz, self.num_slots, n_tok))

        return (post_slots, pred_state), (kernel_dist, post_slots, masks)


class FrameEncoder(nn.Module):
    """CNN -> SoftPositionEmbed -> MLP head over one frame (savi.py:220-250).

    Shared by StoSAVi and STEVE. [B', H, W, 3] -> [B', H'*W', C].
    """

    resolution: Tuple[int, int]
    enc_dict: dict = None

    def setup(self):
        ed = self.enc_dict or {}
        enc_channels = list(ed.get("enc_channels", (3, 64, 64, 64, 64)))
        enc_ks = ed.get("enc_ks", 5)
        enc_norm = ed.get("enc_norm", "")
        self.enc_out_channels = ed.get("enc_out_channels", 128)
        n_layers = len(enc_channels) - 1
        # the reference hardcodes visual_resolution=(64, 64) for its two input
        # sizes (64 stride-1 / 128 stride-2 first layer, savi.py:226,236);
        # derived here so any resolution works.
        stride0 = 2 if self.resolution[0] == 128 else 1
        self.visual_resolution = (
            self.resolution[0] // stride0,
            self.resolution[1] // stride0,
        )
        self.visual_channels = enc_channels[-1]
        self.layers = [
            ConvNormAct(
                enc_channels[i + 1],
                kernel_size=enc_ks,
                stride=2 if (i == 0 and self.resolution[0] == 128) else 1,
                norm=enc_norm,
                act="relu" if i != n_layers - 1 else "",
                name=f"conv_{i}",
            )
            for i in range(n_layers)
        ]
        self.pos_embedding = SoftPositionEmbed(
            self.visual_channels, self.visual_resolution
        )
        self.out_ln = LayerNorm()
        self.out_0 = nn.Dense(self.enc_out_channels)
        self.out_1 = nn.Dense(self.enc_out_channels)

    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        x = img
        for layer in self.layers:
            x = layer(x)
        x = self.pos_embedding(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = self.out_ln(x)
        x = nn.relu(self.out_0(x))
        x = self.out_1(x)
        return x


class SpatialBroadcastDecoder(nn.Module):
    """Spatial-broadcast slot decoder with softmax-over-slots compositing.

    Shared by StoSAVi and SlotFormer — the reference shares it by calling
    ``StoSAVi._build_decoder(self)`` from SlotFormer and copying ``decoder.*``
    checkpoint keys (slotformer.py:196-218); here it is one module so the
    graft map is a single ``{'decoder': 'decoder'}`` subtree copy.
    """

    resolution: Tuple[int, int]
    slot_size: int
    dec_dict: dict = None

    def setup(self):
        dd = self.dec_dict or {}
        dec_channels = list(dd.get("dec_channels", (128, 64, 64, 64, 64)))
        self.dec_resolution = tuple(dd.get("dec_resolution", (8, 8)))
        dec_ks = dd.get("dec_ks", 5)
        dec_norm = dd.get("dec_norm", "")
        assert dec_channels[0] == self.slot_size, "wrong in_channels for Decoder"
        modules = []
        out_size = self.dec_resolution[0]
        stride = 2
        for i in range(len(dec_channels) - 1):
            if out_size == self.resolution[0]:
                stride = 1
            modules.append(
                DeconvNormAct(
                    dec_channels[i + 1],
                    kernel_size=dec_ks,
                    stride=stride,
                    norm=dec_norm,
                    act="relu",
                    name=f"deconv_{i}",
                )
            )
            out_size = out_size * stride
        assert out_size == self.resolution[0], (
            f"decoder output {out_size} != resolution {self.resolution}; "
            "adjust dec_resolution"
        )
        self.layers = modules
        self.out_conv = nn.Conv(4, kernel_size=(1, 1), name="out_conv")
        self.pos_embedding = SoftPositionEmbed(self.slot_size, self.dec_resolution)

    def __call__(self, slots: jnp.ndarray):
        """[B', S, D] -> (recon_combined, recons, masks, slots), NHWC."""
        B, S, D = slots.shape
        H0, W0 = self.dec_resolution
        x = jnp.broadcast_to(slots.reshape(B * S, 1, 1, D), (B * S, H0, W0, D))
        x = self.pos_embedding(x)
        for layer in self.layers:
            x = layer(x)
        x = self.out_conv(x)  # [B*S, H, W, 4]
        H, W = x.shape[1:3]
        x = x.reshape(B, S, H, W, 4)
        recons = x[..., :3]
        masks = nn.softmax(x[..., 3:], axis=1)
        recon_combined = jnp.sum(recons * masks, axis=1)  # [B, H, W, 3]
        return recon_combined, recons, masks, slots


class StoSAVi(nn.Module):
    """Stochastic SAVi video slot encoder (constructor mirrors the reference's
    config-dict surface, savi.py:118-155)."""

    resolution: Tuple[int, int]
    clip_len: int = 6
    slot_dict: dict = None
    enc_dict: dict = None
    dec_dict: dict = None
    pred_dict: dict = None
    loss_dict: dict = None
    eps: float = 1e-6
    with_mask: bool = False  # STEVE subclass behavior

    # ------------------------------------------------------------------ setup
    def setup(self):
        sd = self.slot_dict or {}
        ed = self.enc_dict or {}
        self.num_slots = sd.get("num_slots", 7)
        self.slot_size = sd.get("slot_size", 128)
        self.slot_mlp_size = sd.get("slot_mlp_size", 256)
        self.num_iterations = sd.get("num_iterations", 2)
        self.enc_out_channels = ed.get("enc_out_channels", 128)

        ld = self.loss_dict or {}
        self.use_post_recon_loss = ld.get("use_post_recon_loss", True)
        kld_method = ld.get("kld_method", "var-0.01")
        if "-" in kld_method:
            kld_method, kld_var = kld_method.split("-")
            self.kld_log_var = math.log(float(kld_var))
        else:
            self.kld_log_var = math.log(1.0)
        assert kld_method in ("var", "none")
        self.kld_method = kld_method

        # learnable slot init
        self.init_latents = self.param(
            "init_latents",
            nn.initializers.normal(stddev=1.0),
            (1, self.num_slots, self.slot_size),
        )

        # --- encoder: CNN -> pos emb -> MLP head
        self.encoder = FrameEncoder(
            resolution=self.resolution, enc_dict=self.enc_dict, name="encoder"
        )
        stride0 = 2 if self.resolution[0] == 128 else 1
        self.visual_resolution = (
            self.resolution[0] // stride0,
            self.resolution[1] // stride0,
        )

        # --- decoder: spatial broadcast -> pos emb -> deconv stack -> RGBA
        self.decoder = SpatialBroadcastDecoder(
            resolution=self.resolution,
            slot_size=self.slot_size,
            dec_dict=self.dec_dict,
            name="decoder",
        )

        # --- temporal cell
        self.cell = SAViCell(
            slot_size=self.slot_size,
            slot_mlp_size=self.slot_mlp_size,
            num_slots=self.num_slots,
            num_iterations=self.num_iterations,
            in_features=self.enc_out_channels,
            pred_dict=self.pred_dict or dict(pred_type="transformer", pred_rnn=True),
            kernel_mlp=sd.get("kernel_mlp", True),
            stochastic=self.kld_method != "none",
            with_mask=self.with_mask,
            eps=self.eps,
        )

    # ------------------------------------------------------------ components
    def _get_encoder_out(self, img: jnp.ndarray) -> jnp.ndarray:
        """[B', H, W, 3] -> [B', H'*W', C] per-pixel features."""
        return self.encoder(img)

    def init_pred_state(self, batch_size: int):
        return self.cell.predictor.init_state(batch_size, self.num_slots)

    def encode(
        self,
        img: jnp.ndarray,
        prev_slots: Optional[jnp.ndarray] = None,
        pred_state: Any = None,
        deterministic: bool = True,
        sample_eps: Optional[jnp.ndarray] = None,
    ):
        """[B, T, H, W, 3] -> (kernel_dist, post_slots, encoder_out, carry).

        ``prev_slots``/``pred_state`` continue a chunked long video
        (reference slot carry-over, savi.py:444-463). ``sample_eps``
        ([B, T, S, D]) prescribes the kernel-sampling noise — used only by
        noise-matched trajectory parity tests.
        """
        B, T = img.shape[:2]
        feats = self._get_encoder_out(img.reshape((B * T,) + img.shape[2:]))
        # k/v hoist: the slot-attention input LN + k/v projections depend
        # only on the frame features, so run them as ONE batched matmul over
        # all B*T frames here instead of T serialized launches inside the
        # temporal scan (identical math; the scan body keeps only the
        # genuinely sequential work).
        k_all, v_all = self.cell.slot_attention.project_kv(feats)
        feats = feats.reshape(B, T, feats.shape[1], feats.shape[2])
        k_all = k_all.reshape(B, T, k_all.shape[1], k_all.shape[2])
        v_all = v_all.reshape(B, T, v_all.shape[1], v_all.shape[2])

        if prev_slots is None:
            slots0 = jnp.tile(self.init_latents, (B, 1, 1))
            is_first = jnp.zeros((T,), bool).at[0].set(True)
        else:
            slots0 = prev_slots
            is_first = jnp.zeros((T,), bool)
        if pred_state is None:
            pred_state = self.init_pred_state(B)
        # scan-carry dtype stability under AMP: init_pred_state zeros are f32
        # while a bf16-cast init_latents makes slots0 bf16 — the LSTM then
        # promotes its output (and the slots fed through it) back to f32 and
        # lax.scan rejects the carry. Pin every floating carry leaf to the
        # slots dtype (no-op in pure-f32 runs).
        pred_state = jax.tree.map(
            lambda x: x.astype(slots0.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            pred_state,
        )

        if sample_eps is None:
            def step(cell, carry, first_t, k_t, v_t):
                return cell(carry, None, first_t,
                            deterministic=deterministic, kv_t=(k_t, v_t))

            extra_in, extra_args = (), ()
        else:
            def step(cell, carry, first_t, k_t, v_t, eps_t):
                return cell(carry, None, first_t,
                            deterministic=deterministic, eps_t=eps_t,
                            kv_t=(k_t, v_t))

            extra_in, extra_args = (1,), (sample_eps,)

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "sample": True, "dropout": True},
            in_axes=(0, 1, 1) + extra_in,
            out_axes=1,
        )
        carry, (kernel_dist, post_slots, masks) = scan(
            self.cell, (slots0, pred_state), is_first, k_all, v_all,
            *extra_args
        )
        # masks [B, T, S, H'*W'] are meaningful iff with_mask (STEVE)
        return kernel_dist, post_slots, masks, feats, carry

    def decode(self, slots: jnp.ndarray):
        """[B', S, D] -> (recon_combined, recons, masks, slots) — see
        SpatialBroadcastDecoder."""
        return self.decoder(slots)

    # --------------------------------------------------------------- forward
    def __call__(self, batch: dict, deterministic: bool = True, testing: bool = False):
        img = batch["img"]  # [B, T, H, W, 3]
        B, T = img.shape[:2]
        kernel_dist, post_slots, _, _, _ = self.encode(
            img, deterministic=deterministic,
            sample_eps=batch.get("sample_eps"),  # parity-test noise hook
        )
        out = {"post_slots": post_slots, "kernel_dist": kernel_dist, "img": img}
        if testing:
            return out
        if self.use_post_recon_loss:
            flat = post_slots.reshape(B * T, self.num_slots, self.slot_size)
            recon_combined, recons, masks, _ = self.decode(flat)
            out["post_recon_combined"] = recon_combined.reshape(
                (B, T) + recon_combined.shape[1:]
            )
            out["post_recons"] = recons.reshape((B, T) + recons.shape[1:])
            out["post_masks"] = masks.reshape((B, T) + masks.shape[1:])
        return out

    # ---------------------------------------------------------------- losses
    def _kld_loss(self, kernel_dist: jnp.ndarray) -> jnp.ndarray:
        """KLD(N(mu, sigma) || N(stopgrad(mu), prior_sigma)) — no mu penalty
        (savi.py:339-353)."""
        if self.kld_method == "none":
            return jnp.zeros((), kernel_dist.dtype)
        log_var = kernel_dist[..., self.slot_size :]
        kld = (
            0.5 * (self.kld_log_var - log_var)
            + jnp.exp(log_var) / (2.0 * math.exp(self.kld_log_var))
            - 0.5
        )
        return kld.sum(-1).mean()

    def calc_train_loss(self, batch: dict, out: dict) -> dict:
        loss = {"kld_loss": self._kld_loss(out["kernel_dist"])}
        if self.use_post_recon_loss:
            loss["post_recon_loss"] = jnp.mean(
                (out["post_recon_combined"] - out["img"]) ** 2
            )
        return loss

    def train_loss(self, batch: dict) -> dict:
        out = self(batch, deterministic=False)
        return self.calc_train_loss(batch, out)

    def eval_loss(self, batch: dict) -> dict:
        out = self(batch, deterministic=True)
        return self.calc_train_loss(batch, out)
