"""STEVE — slot encoder with a Transformer token decoder.

Behavioral spec: /root/reference/slotformer/base_slots/models/steve.py:
  * StoSAVi-style temporal slot encoder but DETERMINISTIC latents (the
    predictor output feeds slot attention directly — no kernel-distribution
    head) and SlotAttentionWMask returning last-iteration attention as
    segmentation masks (steve.py:13-73, 198-240)
  * frozen pretrained dVAE tokenizer (grafted via runtime.checkpoint.graft;
    the reference torch.loads it in __init__, steve.py:164-176)
  * GPT-style STEVETransformerDecoder predicts dVAE token ids from slots;
    cross-entropy token loss (+ optional dVAE-decoded image recon loss,
    steve.py:339-350)
  * accepts precomputed ``token_id`` from the loader (steve.py:249-251)
  * masks bilinearly upsampled to image resolution at eval (steve.py:229-238)

NHWC; token ids flattened [B, T, h*w] row-major to keep the on-disk Physion
token ``.npy`` contract.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .dvae import dVAE, gumbel_softmax
from .savi import FrameEncoder, SAViCell
from .steve_transformer import STEVETransformerDecoder


class STEVE(nn.Module):
    resolution: Tuple[int, int]
    clip_len: int = 6
    slot_dict: dict = None
    dvae_dict: dict = None
    enc_dict: dict = None
    dec_dict: dict = None
    pred_dict: dict = None
    loss_dict: dict = None
    eps: float = 1e-6

    def setup(self):
        sd = self.slot_dict or {}
        ed = self.enc_dict or {}
        dv = self.dvae_dict or {}
        dd = self.dec_dict or {}
        self.num_slots = sd.get("num_slots", 7)
        self.slot_size = sd.get("slot_size", 128)
        self.slot_mlp_size = sd.get("slot_mlp_size", 256)
        self.num_iterations = sd.get("num_iterations", 2)
        self.enc_out_channels = ed.get("enc_out_channels", 128)
        self.vocab_size = dv.get("vocab_size", 4096)
        self.down_factor = dv.get("down_factor", 4)
        self.use_img_recon_loss = (self.loss_dict or {}).get(
            "use_img_recon_loss", False
        )

        self.init_latents = self.param(
            "init_latents",
            nn.initializers.normal(stddev=1.0),
            (1, self.num_slots, self.slot_size),
        )
        self.encoder = FrameEncoder(
            resolution=self.resolution, enc_dict=self.enc_dict, name="encoder"
        )
        stride0 = 2 if self.resolution[0] == 128 else 1
        self.visual_resolution = (
            self.resolution[0] // stride0,
            self.resolution[1] // stride0,
        )

        # deterministic cell: predictor -> slot attention w/ masks (no kernels)
        self.cell = SAViCell(
            slot_size=self.slot_size,
            slot_mlp_size=self.slot_mlp_size,
            num_slots=self.num_slots,
            num_iterations=self.num_iterations,
            in_features=self.enc_out_channels,
            pred_dict=self.pred_dict or dict(pred_type="transformer", pred_rnn=True),
            kernel_mlp=False,
            stochastic=False,
            use_kernel_head=False,
            with_mask=True,
            eps=self.eps,
        )

        # frozen dVAE (params grafted from ckpt by STEVEMethod)
        self.dvae = dVAE(vocab_size=self.vocab_size, img_channels=3, name="dvae")

        H, W = self.resolution
        self.h, self.w = H // self.down_factor, W // self.down_factor
        self.num_patches = self.h * self.w
        self.trans_decoder = STEVETransformerDecoder(
            vocab_size=self.vocab_size,
            d_model=dd.get("dec_d_model", 128),
            n_head=dd.get("dec_num_heads", 4),
            max_len=self.num_patches - 1,
            num_slots=self.num_slots,
            num_layers=dd.get("dec_num_layers", 4),
            name="trans_decoder",
        )

    # ------------------------------------------------------------------- api
    def init_pred_state(self, batch_size: int):
        return self.cell.predictor.init_state(batch_size, self.num_slots)

    def encode(
        self,
        img: jnp.ndarray,
        prev_slots: Optional[jnp.ndarray] = None,
        pred_state=None,
        deterministic: bool = True,
        upsample_masks: bool = False,
    ):
        """[B, T, H, W, 3] -> (slots [B,T,N,D], masks [B,T,N,H',W'], feats, carry)."""
        B, T = img.shape[:2]
        feats = self.encoder(img.reshape((B * T,) + img.shape[2:]))
        # k/v hoist — see savi.py encode(): one batched LN+projection over
        # all B*T frames instead of T serialized launches inside the scan.
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
        # AMP scan-carry dtype stability — same reasoning as savi.py encode()
        pred_state = jax.tree.map(
            lambda x: x.astype(slots0.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            pred_state,
        )

        def step(cell, carry, first_t, k_t, v_t):
            return cell(carry, None, first_t, deterministic=deterministic,
                        kv_t=(k_t, v_t))

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "sample": True, "dropout": True},
            in_axes=(0, 1, 1),
            out_axes=1,
        )
        carry, (_, slots, masks) = scan(
            self.cell, (slots0, pred_state), is_first, k_all, v_all
        )
        hv, wv = self.visual_resolution
        masks = masks.reshape(B, T, self.num_slots, hv, wv)
        if upsample_masks and (hv, wv) != self.resolution:
            masks = jax.image.resize(
                masks,
                (B, T, self.num_slots) + tuple(self.resolution),
                method="bilinear",
            )
        return slots, masks, feats, carry

    # --------------------------------------------------------------- forward
    def __call__(self, batch: dict, deterministic: bool = True, testing: bool = False):
        if self.is_initializing():
            # materialize the FULL dVAE (encoder + decoder) so the
            # pretrained ckpt can be grafted whatever the data path:
            # the decoder is unused when use_img_recon_loss is off, and the
            # ENCODER is unused when the loader supplies precomputed
            # ``token_id`` (the Physion tokenize_images path) — flax only
            # creates params for modules actually called during init
            H, W = self.resolution
            self.dvae.tokenize(jnp.zeros((1, 1, H, W, 3)), one_hot=False)
            self.dvae.detokenize(
                jnp.zeros((1, self.h, self.w, self.vocab_size))
            )
        img = batch["img"]  # [B, T, H, W, 3]
        B, T = img.shape[:2]
        slots, masks, _, _ = self.encode(
            img, deterministic=deterministic, upsample_masks=deterministic
        )
        out = {"slots": slots, "masks": masks}
        if testing:
            return out

        token_id = batch.get("token_id", None)
        if token_id is None:
            token_id = jax.lax.stop_gradient(
                self.dvae.tokenize(img, one_hot=False)
            ).reshape(B, T, -1)
        target = token_id.reshape(B * T, self.num_patches).astype(jnp.int32)

        in_slots = slots.reshape(B * T, self.num_slots, self.slot_size)
        logits = self.trans_decoder(
            in_slots, target[:, :-1], deterministic=deterministic
        )[:, -self.num_patches :]
        out["pred_token_id"] = logits  # [B*T, h*w, vocab]
        out["target_token_id"] = target

        if self.use_img_recon_loss:
            out["gt_img"] = img.reshape((B * T,) + img.shape[2:])
            z_logits = jax.nn.log_softmax(logits, axis=-1)
            z = gumbel_softmax(
                z_logits.reshape(B * T, self.h, self.w, self.vocab_size),
                self.make_rng("sample"),
                tau=0.1,
                hard=False,
                axis=-1,
            )
            out["recon_img"] = self.dvae.detokenize(z)
        return out

    # ---------------------------------------------------------------- losses
    def calc_train_loss(self, batch: dict, out: dict) -> dict:
        logits = out["pred_token_id"].reshape(-1, self.vocab_size)
        target = out["target_token_id"].reshape(-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, target[:, None], axis=-1).mean()
        loss = {"token_recon_loss": ce}
        if self.use_img_recon_loss:
            loss["img_recon_loss"] = jnp.mean(
                (out["recon_img"] - out["gt_img"]) ** 2
            )
        return loss

    def train_loss(self, batch: dict) -> dict:
        out = self(batch, deterministic=False)
        return self.calc_train_loss(batch, out)

    def eval_loss(self, batch: dict) -> dict:
        out = self(batch, deterministic=True)
        return self.calc_train_loss(batch, out)
