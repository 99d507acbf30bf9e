"""STEVESlotFormer — SlotFormer with a frozen dVAE + STEVE Transformer
decoder as the pixel decoder.

Behavioral spec: /root/reference/slotformer/video_prediction/models/steve_slotformer.py:
  * rollouter identical to SlotFormer; decoder = frozen STEVE trans_decoder
    (grafted under the name 'trans_decoder' by STEVESlotFormerMethod — the
    reference renames it to 'decoder' via deepcopy; we keep the source name
    so the graft map is identity) + frozen dVAE
  * ``decode(slots)`` autoregressively generates dVAE tokens then
    detokenizes — both gumbel-soft and one-hot (SLATE) reconstructions.
    Uses the KV-cached generate (steve_transformer.py here), not the
    reference's full re-forward per token.
  * optional 'img_recon_loss' that is actually a token cross-entropy on the
    ROLLED-OUT slots (steve_slotformer.py:124-147).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .dvae import dVAE, gumbel_softmax, make_one_hot
from .slotformer import SlotRollouter
from .steve_transformer import STEVETransformerDecoder


class STEVESlotFormer(nn.Module):
    resolution: Tuple[int, int]
    clip_len: int = 16
    slot_dict: dict = None
    dvae_dict: dict = None
    dec_dict: dict = None
    rollout_dict: dict = None
    loss_dict: dict = None
    eps: float = 1e-6

    def setup(self):
        sd = self.slot_dict or {}
        dv = self.dvae_dict or {}
        dd = self.dec_dict or {}
        self.num_slots = sd.get("num_slots", 6)
        self.slot_size = sd.get("slot_size", 192)
        self.vocab_size = dv.get("vocab_size", 4096)
        self.down_factor = dv.get("down_factor", 4)
        H, W = self.resolution
        self.h, self.w = H // self.down_factor, W // self.down_factor
        self.num_patches = self.h * self.w

        self.dvae = dVAE(vocab_size=self.vocab_size, img_channels=3, name="dvae")
        self.trans_decoder = STEVETransformerDecoder(
            vocab_size=self.vocab_size,
            d_model=dd.get("dec_d_model", 192),
            n_head=dd.get("dec_num_heads", 4),
            max_len=self.num_patches - 1,
            num_slots=self.num_slots,
            num_layers=dd.get("dec_num_layers", 4),
            name="trans_decoder",
        )

        rd = dict(self.rollout_dict or {})
        self.history_len = rd.get("history_len", 6)
        self.rollouter = SlotRollouter(name="rollouter", **rd)

        ld = self.loss_dict or {}
        self.rollout_len = ld.get("rollout_len", 6)
        self.use_img_recon_loss = ld.get("use_img_recon_loss", False)

    # ------------------------------------------------------------------- api
    def decode(self, slots: jnp.ndarray):
        """[B, N, C] slots -> (soft_recon, hard_recon) images via KV-cached
        token generation + dVAE detokenize."""
        _, logits = self.trans_decoder.generate(
            slots, steps=self.num_patches, sample=False
        )  # [B, num_patches, vocab]
        logits = logits.reshape(-1, self.h, self.w, self.vocab_size)
        z_logits = jax.nn.log_softmax(logits, axis=-1)
        z = gumbel_softmax(
            z_logits, self.make_rng("sample") if self.has_rng("sample")
            else jax.random.PRNGKey(0), tau=0.1, hard=False, axis=-1,
        )
        soft_recon = self.dvae.detokenize(z)
        hard_recon = self.dvae.detokenize(make_one_hot(logits, axis=-1))
        return soft_recon, hard_recon

    def rollout(self, past_slots, pred_len, decode=False, with_gt=True,
                deterministic: bool = True):
        pred_slots = self.rollouter(
            past_slots[:, -self.history_len :], pred_len,
            deterministic=deterministic,
        )
        if not decode:
            return pred_slots
        # autoregressive token decode is expensive; only the vis path asks
        slots = (
            jnp.concatenate([past_slots, pred_slots], axis=1)
            if with_gt else pred_slots
        )
        B, T = slots.shape[:2]
        soft, _ = self.decode(slots.reshape(B * T, self.num_slots, self.slot_size))
        return {
            "recon_combined": soft.reshape((B, T) + soft.shape[1:]),
            "slots": slots,
        }

    # --------------------------------------------------------------- forward
    def __call__(self, batch: dict, deterministic: bool = True):
        if self.is_initializing():
            # materialize frozen decoder + FULL dVAE (encoder included:
            # when the loader supplies precomputed token_id — the Physion
            # tokenize_images path — tokenize() is never traced, flax would
            # skip its params, and the dVAE ckpt graft would fail on
            # structure mismatch)
            self.trans_decoder(
                jnp.zeros((1, self.num_slots, self.slot_size)),
                jnp.zeros((1, self.num_patches - 1), jnp.int32),
            )
            H, W = self.resolution
            self.dvae.tokenize(jnp.zeros((1, 1, H, W, 3)), one_hot=False)
            self.dvae.detokenize(
                jnp.zeros((1, self.h, self.w, self.vocab_size))
            )
        slots = batch["slots"]
        assert slots.shape[1] == self.history_len + self.rollout_len
        past_slots = slots[:, : self.history_len]
        gt_slots = slots[:, self.history_len :]
        pred_slots = self.rollout(
            past_slots, self.rollout_len, deterministic=deterministic
        )
        out = {"gt_slots": gt_slots, "pred_slots": pred_slots}

        if self.use_img_recon_loss:
            B, T = pred_slots.shape[:2]
            token_id = batch.get("token_id", None)
            if token_id is None:
                gt_img = batch["img"][:, self.history_len :]
                token_id = jax.lax.stop_gradient(
                    self.dvae.tokenize(gt_img, one_hot=False)
                ).reshape(B, T, -1)
            target = token_id.reshape(B * T, self.num_patches).astype(jnp.int32)
            in_slots = pred_slots.reshape(B * T, self.num_slots, self.slot_size)
            logits = self.trans_decoder(
                in_slots, target[:, :-1], deterministic=deterministic
            )[:, -self.num_patches :]
            out["pred_token_id"] = logits
            out["target_token_id"] = target
        return out

    # ---------------------------------------------------------------- losses
    def calc_train_loss(self, batch: dict, out: dict) -> dict:
        loss = {
            "slot_recon_loss": jnp.mean(
                (out["pred_slots"] - out["gt_slots"]) ** 2
            )
        }
        if self.use_img_recon_loss and "pred_token_id" in out:
            logits = out["pred_token_id"].reshape(-1, self.vocab_size)
            target = out["target_token_id"].reshape(-1)
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss["img_recon_loss"] = -jnp.take_along_axis(
                logp, target[:, None], axis=-1
            ).mean()
        return loss

    def train_loss(self, batch: dict) -> dict:
        out = self(batch, deterministic=False)
        return self.calc_train_loss(batch, out)

    def eval_loss(self, batch: dict) -> dict:
        out = self(batch, deterministic=True)
        return self.calc_train_loss(batch, out)
