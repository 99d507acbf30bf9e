"""SlotFormer — autoregressive Transformer dynamics over slots.

Behavioral spec from
/root/reference/slotformer/video_prediction/models/slotformer.py:
  * tokens = history_len x num_slots slot vectors, in_proj to d_model,
    + sinusoidal temporal PE repeated per slot (+ optional slot PE)
  * Transformer ENCODER (bidirectional, no causal mask) over the window;
    last N output tokens -> out_proj -> next-step slots  (slotformer.py:85-126)
  * window slides by one step and the predicted slots are fed back;
    repeat pred_len times.
  * training: split clip into history/rollout, slot MSE (+ optional decoded
    image MSE through a FROZEN SAVi decoder), RPIN-style temporal loss decay,
    PHYRE valid-length masking  (slotformer.py:263-328).

TPU-native design: the rollout loop is a ``lax.scan`` (via nn.scan) over a
fixed [B, history_len*N, C] token buffer — one traced transformer step,
``pred_len`` supplied as the static scan length. NOTE a KV cache does NOT
apply here: attention is bidirectional within the sliding window, so every
step recomputes all token interactions by construction (unlike STEVE's causal
decoder, which does get a KV cache — see steve_transformer.py).

The frozen decoder is realized by (a) grafting SAVi 'decoder' params at init
(runtime.checkpoint.graft) and (b) optimizer masking (set_to_zero on the
'decoder' subtree — runtime.schedules.build_optimizer(frozen_prefixes)).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .nn import PosEnc, TransformerEncoder
from .savi import SpatialBroadcastDecoder


def _pick_chunks(n_frames: int, max_chunk: int) -> int:
    """Smallest chunk count that divides ``n_frames`` with chunks of at most
    ``max_chunk`` frames (1 = no chunking)."""
    if max_chunk <= 0 or n_frames <= max_chunk:
        return 1
    for nc in range(-(-n_frames // max_chunk), n_frames + 1):
        if n_frames % nc == 0:
            return nc
    return 1


class SlotRollouter(nn.Module):
    """Sliding-window autoregressive rollout (reference slotformer.py:48-134)."""

    num_slots: int
    slot_size: int
    history_len: int
    t_pe: str = "sin"
    slots_pe: str = ""
    d_model: int = 128
    num_layers: int = 4
    num_heads: int = 8
    ffn_dim: int = 512
    norm_first: bool = True
    dropout: float = 0.1

    def setup(self):
        self.in_proj = nn.Dense(self.d_model)
        self.out_proj = nn.Dense(self.slot_size)
        self.transformer_encoder = TransformerEncoder(
            d_model=self.d_model,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            ffn_dim=self.ffn_dim,
            norm_first=self.norm_first,
            dropout=self.dropout,
        )
        self.enc_t_pe = PosEnc(self.t_pe, self.history_len, self.d_model)
        self.enc_slots_pe = PosEnc(self.slots_pe, self.num_slots, self.d_model)

    def _pos_enc(self) -> jnp.ndarray:
        """[1, history_len*N, d_model]: temporal PE repeated per slot
        (+ slot PE repeated per step)."""
        t_pe = self.enc_t_pe()  # [1, T, D]
        pe = jnp.repeat(t_pe[:, :, None, :], self.num_slots, axis=2)
        s_pe = self.enc_slots_pe()  # [1, N, D] (zeros if disabled)
        pe = pe + s_pe[:, None, :, :]
        return pe.reshape(1, self.history_len * self.num_slots, self.d_model)

    def __call__(
        self, x: jnp.ndarray, pred_len: int, deterministic: bool = True
    ) -> jnp.ndarray:
        """[B, history_len, N, C] -> [B, pred_len, N, C]."""
        assert x.shape[1] == self.history_len, "wrong burn-in steps"
        B = x.shape[0]
        buf = x.reshape(B, self.history_len * self.num_slots, x.shape[-1])
        enc_pe = self._pos_enc()

        def step(mod, buf, _):
            h = mod.in_proj(buf) + enc_pe.astype(buf.dtype)
            h = mod.transformer_encoder(h, deterministic=deterministic)
            pred = mod.out_proj(h[:, -mod.num_slots :])
            new_buf = jnp.concatenate([buf[:, mod.num_slots :], pred], axis=1)
            return new_buf, pred

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=1,
            length=pred_len,
        )
        _, preds = scan(self, buf, None)
        # preds: [B, pred_len, N, C]
        return preds.reshape(B, pred_len, self.num_slots, self.slot_size)


class SingleStepSlotRollouter(nn.Module):
    """Iterative-overlap rollout conditioned on one frame (PHYRE variant,
    reference single_step_slotformer.py:6-90).

    Context grows [I0] -> [I0, P1] -> ... up to ``cond_len`` frames, then
    slides. TPU-native: a fixed right-aligned [B, cond_len*N, C] buffer with
    a shrinking key-padding mask replaces the reference's growing concat, so
    one traced step serves every rollout position.
    """

    num_slots: int
    slot_size: int
    history_len: int  # must be 1
    cond_len: int
    t_pe: str = "sin"
    slots_pe: str = ""
    d_model: int = 128
    num_layers: int = 4
    num_heads: int = 8
    ffn_dim: int = 512
    norm_first: bool = True
    dropout: float = 0.1

    def setup(self):
        assert self.history_len == 1, (
            "SingleStepSlotRollouter rolls out from the initial frame only"
        )
        self.in_proj = nn.Dense(self.d_model)
        self.out_proj = nn.Dense(self.slot_size)
        self.transformer_encoder = TransformerEncoder(
            d_model=self.d_model,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            ffn_dim=self.ffn_dim,
            norm_first=self.norm_first,
            dropout=self.dropout,
        )
        self.enc_t_pe = PosEnc(self.t_pe, self.cond_len, self.d_model)
        self.enc_slots_pe = PosEnc(self.slots_pe, self.num_slots, self.d_model)

    def _pos_enc(self) -> jnp.ndarray:
        t_pe = self.enc_t_pe()
        pe = jnp.repeat(t_pe[:, :, None, :], self.num_slots, axis=2)
        s_pe = self.enc_slots_pe()
        pe = pe + s_pe[:, None, :, :]
        return pe.reshape(1, self.cond_len * self.num_slots, self.d_model)

    def __call__(
        self, x: jnp.ndarray, pred_len: int, deterministic: bool = True
    ) -> jnp.ndarray:
        """[B, 1, N, C] -> [B, pred_len, N, C]."""
        assert x.shape[1] == self.history_len
        B, _, N, C = x.shape
        L = self.cond_len * N
        # right-aligned buffer; left part is padding until context fills up
        buf = jnp.zeros((B, L, C), x.dtype)
        buf = buf.at[:, L - N :].set(x.reshape(B, N, C))
        enc_pe = self._pos_enc()
        tok_pos = jnp.arange(L)

        def step(mod, buf, step_idx):
            # frames present in the buffer so far (history 1 + step_idx preds)
            n_valid = jnp.minimum(1 + step_idx, mod.cond_len) * N
            pad_mask = tok_pos < (L - n_valid)  # True = padded
            h = mod.in_proj(buf) + enc_pe.astype(buf.dtype)
            h = mod.transformer_encoder(
                h, key_padding_mask=pad_mask[None].repeat(B, axis=0),
                deterministic=deterministic,
            )
            pred = mod.out_proj(h[:, -N:])
            new_buf = jnp.concatenate([buf[:, N:], pred], axis=1)
            return new_buf, pred

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=1,
        )
        _, preds = scan(self, buf, jnp.arange(pred_len))
        return preds.reshape(B, pred_len, N, self.slot_size)


class SlotFormer(nn.Module):
    """Rollouter + frozen SAVi decoder (reference slotformer.py:137-343).

    Constructor mirrors the reference's config-dict surface.
    """

    resolution: Tuple[int, int]
    clip_len: int = 16
    slot_dict: dict = None
    dec_dict: dict = None
    rollout_dict: dict = None
    loss_dict: dict = None
    eps: float = 1e-6

    def setup(self):
        sd = self.slot_dict or {}
        self.num_slots = sd.get("num_slots", 7)
        self.slot_size = sd.get("slot_size", 128)

        self.decoder = SpatialBroadcastDecoder(
            resolution=self.resolution,
            slot_size=self.slot_size,
            dec_dict=self.dec_dict,
            name="decoder",
        )
        rd = dict(self.rollout_dict or {})
        self.history_len = rd.get("history_len", 6)
        self.rollouter = self._make_rollouter(rd)

        ld = self.loss_dict or {}
        self.rollout_len = ld.get("rollout_len", 6)
        self.use_img_recon_loss = ld.get("use_img_recon_loss", False)
        # img-recon training decodes B*rollout_len frames through the FROZEN
        # decoder; computing that loss in scanned chunks of <= this many
        # frames keeps only one chunk's activations live in the backward —
        # measured 1.79x faster than whole-batch decode at the CLEVRER train
        # shape (640 frames, v5e: 239.5 -> 133.6 ms fwd+dx). Only worthwhile
        # with a frozen decoder: accumulating weight grads across chunks
        # makes chunking a net loss (measured +10% on the SAVi train step).
        # 0 disables.
        self.dec_chunk_frames = int(ld.get("dec_chunk_frames", 160))
        # decode the frozen img-recon loss in bf16 (params cast at trace
        # time, slot MSE and loss accumulation stay f32): halves the
        # backward's saved-activation HBM traffic. Takes precedence over
        # chunking (whole-batch bf16 fits where f32 spilled).
        self.dec_recon_bf16 = bool(ld.get("dec_recon_bf16", False))
        # hand-written frozen-decoder backward: saves BOOL relu masks
        # instead of f32 pre-activations (4x less residual HBM) and
        # backprops d(slots) through jax.linear_transpose'd convs — the
        # decoder is frozen so dW is dead anyway. Exact gradients
        # (ops/frozen_decoder_loss.py). Takes precedence over bf16/chunking.
        self.dec_custom_bwd = bool(ld.get("dec_custom_bwd", False))
        if self.dec_custom_bwd:
            dd = self.dec_dict or {}
            assert not dd.get("dec_norm", ""), (
                "dec_custom_bwd supports norm-free decoders only")

    def _make_rollouter(self, rd: dict) -> nn.Module:
        return SlotRollouter(name="rollouter", **rd)

    # ------------------------------------------------------------------ api
    def decode(self, slots: jnp.ndarray):
        """Decode slots through the (frozen) SAVi decoder."""
        return self.decoder(slots)

    def rollout(
        self,
        past_slots: jnp.ndarray,
        pred_len: int,
        decode: bool = False,
        with_gt: bool = True,
        deterministic: bool = True,
    ):
        """Unroll ``pred_len`` steps; optionally decode to pixels
        (reference slotformer.py:236-261)."""
        B = past_slots.shape[0]
        pred_slots = self.rollouter(
            past_slots[:, -self.history_len :], pred_len, deterministic=deterministic
        )
        if not decode:
            return pred_slots
        if with_gt:
            slots = jnp.concatenate([past_slots, pred_slots], axis=1)
            T = past_slots.shape[1] + pred_len
        else:
            slots = pred_slots
            T = pred_len
        flat = slots.reshape(B * T, self.num_slots, self.slot_size)
        recon_combined, recons, masks, _ = self.decode(flat)
        return {
            "recon_combined": recon_combined.reshape((B, T) + recon_combined.shape[1:]),
            "recons": recons.reshape((B, T) + recons.shape[1:]),
            "masks": masks.reshape((B, T) + masks.shape[1:]),
            "slots": slots,
        }

    def __call__(self, batch: dict, deterministic: bool = True):
        if self.is_initializing():
            # materialize decoder params even when the training path never
            # decodes (use_img_recon_loss=False) — the 'decoder' subtree must
            # always exist for checkpoint grafting + rollout-time decoding.
            self.decode(jnp.zeros((1, self.num_slots, self.slot_size)))
        slots = batch["slots"]  # [B, T, N, C]
        assert slots.shape[1] == self.history_len + self.rollout_len, (
            f"wrong SlotFormer training length {slots.shape[1]}"
        )
        past_slots = slots[:, : self.history_len]
        gt_slots = slots[:, self.history_len :]
        if self.use_img_recon_loss:
            out = self.rollout(
                past_slots,
                self.rollout_len,
                decode=True,
                with_gt=False,
                deterministic=deterministic,
            )
            out["pred_slots"] = out.pop("slots")
            out["gt_slots"] = gt_slots
        else:
            pred_slots = self.rollout(
                past_slots, self.rollout_len, deterministic=deterministic
            )
            out = {"gt_slots": gt_slots, "pred_slots": pred_slots}
        return out

    # --------------------------------------------------------------- losses
    def calc_train_loss(
        self,
        batch: dict,
        out: dict,
        loss_decay_factor: float = 1.0,
        training: bool = True,
    ) -> dict:
        """Slot MSE (+ img MSE), temporal decay, PHYRE vid_len masking
        (reference slotformer.py:284-328)."""
        loss_dict = {}
        gt_slots = out["gt_slots"]  # [B, T_ro, N, C]
        pred_slots = out["pred_slots"]
        T_ro = gt_slots.shape[1]
        slots_err = (pred_slots - gt_slots) ** 2

        if not training:
            for s in range(min(6, T_ro)):
                loss_dict[f"slot_recon_loss_{s + 1}"] = slots_err[:, s].mean()

        # RPIN-style temporal decay, normalized to sum to T_ro
        w = loss_decay_factor ** jnp.arange(T_ro, dtype=slots_err.dtype)
        w = w / w.sum() * T_ro
        slots_loss = slots_err * w[None, :, None, None]

        vid_len = batch.get("vid_len", None)
        if vid_len is not None:
            # frames at history_len + t are valid iff < vid_len
            valid = (
                jnp.arange(T_ro)[None] + self.history_len < vid_len[:, None]
            )  # [B, T_ro]
            vw = valid[..., None, None].astype(slots_loss.dtype)
            loss_dict["slot_recon_loss"] = (slots_loss * vw).sum() / (
                vw.sum() * slots_err.shape[-1] * slots_err.shape[-2] + self.eps
            )
        else:
            valid = None
            loss_dict["slot_recon_loss"] = slots_loss.mean()

        if self.use_img_recon_loss and "recon_combined" in out:
            gt_img = batch["img"][:, self.history_len :]
            img_err = (out["recon_combined"] - gt_img) ** 2
            if valid is not None:
                iw = valid[..., None, None, None].astype(img_err.dtype)
                loss_dict["img_recon_loss"] = (img_err * iw).sum() / (
                    iw.sum() * img_err.shape[-1] * img_err.shape[-2] * img_err.shape[-3]
                    + self.eps
                )
            else:
                loss_dict["img_recon_loss"] = img_err.mean()
        return loss_dict

    def _chunked_img_recon_loss(
        self, batch: dict, pred_slots: jnp.ndarray, nc: int
    ) -> jnp.ndarray:
        """Image-recon MSE through the frozen decoder, decoded ``nc`` chunks
        at a time under ``nn.scan`` (see dec_chunk_frames). Matches the
        unchunked ``calc_train_loss`` value (incl. vid_len masking)."""
        B, T_ro = pred_slots.shape[:2]
        gt_img = batch["img"][:, self.history_len :]
        H, W, C = gt_img.shape[2:]
        F = B * T_ro
        flat_slots = pred_slots.reshape(F, self.num_slots, self.slot_size)
        flat_img = gt_img.reshape(F, H, W, C)
        vid_len = batch.get("vid_len", None)
        if vid_len is not None:
            valid = (
                jnp.arange(T_ro)[None] + self.history_len < vid_len[:, None]
            )
            w = valid.astype(flat_img.dtype).reshape(F)
        else:
            w = jnp.ones((F,), flat_img.dtype)

        def body(dec, carry, xs):
            s, t, ww = xs
            recon = dec(s)[0]
            err = ((recon - t) ** 2).sum(axis=(1, 2, 3))
            return carry + (err * ww).sum(), None

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
        )
        sse, _ = scan(
            self.decoder,
            jnp.zeros((), flat_img.dtype),
            (
                flat_slots.reshape(nc, F // nc, self.num_slots, self.slot_size),
                flat_img.reshape(nc, F // nc, H, W, C),
                w.reshape(nc, F // nc),
            ),
        )
        if vid_len is not None:
            return sse / (w.sum() * H * W * C + self.eps)
        return sse / (F * H * W * C)

    def _bf16_img_recon_loss(
        self, batch: dict, pred_slots: jnp.ndarray
    ) -> jnp.ndarray:
        """Whole-batch img-recon MSE through the frozen decoder with params
        + inputs cast to bf16 (error/accumulation in f32). Matches the f32
        value to bf16 precision incl. vid_len masking (equivalence-tested).
        FROZEN-ONLY by construction: the decoder params are stop_gradient'ed
        HERE, so no dW ever sees the reduced precision even if a config
        forgets the optimizer freeze — the rollouter's d(slots) gradient
        still flows through the bf16 decode, which is the point. (The
        SlotFormer decoder is always a frozen SAVi graft; a trainable
        decoder must keep dec_recon_bf16 off.)"""
        B, T_ro = pred_slots.shape[:2]
        gt_img = batch["img"][:, self.history_len :]
        H, W, C = gt_img.shape[2:]
        F = B * T_ro
        flat = pred_slots.reshape(F, self.num_slots, self.slot_size)
        p16 = jax.tree_util.tree_map(
            lambda a: jax.lax.stop_gradient(a.astype(jnp.bfloat16)),
            self.decoder.variables["params"],
        )
        dec = self.decoder.clone(parent=None)
        rc = dec.apply({"params": p16}, flat.astype(jnp.bfloat16))[0]
        err = (rc.astype(jnp.float32) - gt_img.reshape(F, H, W, C)) ** 2
        vid_len = batch.get("vid_len", None)
        if vid_len is None:
            return err.mean()
        valid = (
            jnp.arange(T_ro)[None] + self.history_len < vid_len[:, None]
        )
        w = valid.astype(err.dtype).reshape(F)
        return (err.sum(axis=(1, 2, 3)) * w).sum() / (
            w.sum() * H * W * C + self.eps
        )

    def train_loss(self, batch: dict, loss_decay_factor: float = 1.0) -> dict:
        nc = 1
        if self.use_img_recon_loss:
            nc = _pick_chunks(
                batch["slots"].shape[0] * self.rollout_len, self.dec_chunk_frames
            )
        if (self.use_img_recon_loss and self.dec_recon_bf16
                and not self.is_initializing()):
            # bf16 decodes whole-batch; marker for the branch below. At init
            # the plain/chunked path must run so the decoder params are
            # created (the bf16 path reads .variables, which init lacks).
            nc = 0
        if (self.use_img_recon_loss and self.dec_custom_bwd
                and not self.is_initializing()):
            nc = -1  # custom-backward whole-batch decode (see below)
        if nc == 1:
            out = self(batch, deterministic=False)
            return self.calc_train_loss(
                batch, out, loss_decay_factor=loss_decay_factor, training=True
            )
        # chunked / bf16 img-recon path: rollout WITHOUT decoding, slot loss
        # from calc_train_loss, img loss decoded chunk-by-chunk or whole-batch
        # in bf16
        slots = batch["slots"]
        past_slots = slots[:, : self.history_len]
        gt_slots = slots[:, self.history_len :]
        pred_slots = self.rollouter(
            past_slots[:, -self.history_len :], self.rollout_len,
            deterministic=False,
        )
        out = {"gt_slots": gt_slots, "pred_slots": pred_slots}
        loss_dict = self.calc_train_loss(
            batch, out, loss_decay_factor=loss_decay_factor, training=True
        )
        if nc == -1:
            loss_dict["img_recon_loss"] = self._custom_bwd_img_recon_loss(
                batch, pred_slots
            )
        elif nc == 0:
            loss_dict["img_recon_loss"] = self._bf16_img_recon_loss(
                batch, pred_slots
            )
        else:
            loss_dict["img_recon_loss"] = self._chunked_img_recon_loss(
                batch, pred_slots, nc
            )
        return loss_dict

    def _custom_bwd_img_recon_loss(
        self, batch: dict, pred_slots: jnp.ndarray
    ) -> jnp.ndarray:
        """Frozen-decoder img-recon MSE via ops.frozen_decoder_loss: bool
        relu-mask residuals + linear_transpose backward, exact gradients
        (equivalence-tested against the plain autodiff path). Composes
        with dec_chunk_frames: chunks are scanned with per-chunk custom
        residuals under one global normalizer."""
        import jax.lax as lax

        from ..ops.frozen_decoder_loss import frozen_decoder_recon_loss

        B, T_ro = pred_slots.shape[:2]
        gt_img = batch["img"][:, self.history_len :]
        H, W, C = gt_img.shape[2:]
        F = B * T_ro
        dd = self.dec_dict or {}
        cfg = (
            tuple(dd.get("dec_channels", (128, 64, 64, 64, 64))),
            tuple(dd.get("dec_resolution", (8, 8))),
            tuple(self.resolution),
            int(dd.get("dec_ks", 5)),
        )
        vid_len = batch.get("vid_len", None)
        if vid_len is not None:
            valid = (
                jnp.arange(T_ro)[None] + self.history_len < vid_len[:, None]
            )
            w = valid.astype(jnp.float32).reshape(F)
            denom = w.sum() * (H * W * C) + self.eps
        else:
            w = jnp.ones((F,), jnp.float32)
            denom = jnp.asarray(float(F * H * W * C), jnp.float32)
        dec_params = self.decoder.variables["params"]
        flat_slots = pred_slots.reshape(F, self.num_slots, self.slot_size)
        flat_img = gt_img.reshape(F, H, W, C)
        nc = _pick_chunks(F, self.dec_chunk_frames)
        if nc <= 1:
            return frozen_decoder_recon_loss(
                dec_params, flat_slots, flat_img, w, denom,
                cfg, self.num_slots,
            )

        def body(carry, xs):
            s, t, ww = xs
            part = frozen_decoder_recon_loss(
                dec_params, s, t, ww, denom, cfg, self.num_slots
            )
            return carry + part, None

        loss, _ = lax.scan(
            body,
            jnp.zeros((), jnp.float32),
            (
                flat_slots.reshape(nc, F // nc, self.num_slots, self.slot_size),
                flat_img.reshape(nc, F // nc, H, W, C),
                w.reshape(nc, F // nc),
            ),
        )
        return loss

    def eval_loss(self, batch: dict) -> dict:
        out = self(batch, deterministic=True)
        return self.calc_train_loss(batch, out, training=False)


class SingleStepSlotFormer(SlotFormer):
    """PHYRE variant: 1-frame burn-in, iterative-overlap rollout; hosts the
    task-success classifier at planning eval (reference
    single_step_slotformer.py:93-129). The classifier itself is a separate
    PHYREReadout model applied outside this module (see cli/test_phyre_planning)."""

    def _make_rollouter(self, rd: dict) -> nn.Module:
        return SingleStepSlotRollouter(name="rollouter", **rd)
