"""Aloe-style CLEVRER VQA transformer (Ding et al. 2020).

Behavioral spec: /root/reference/slotformer/clevrer_vqa/models/transformer.py
+ aloe.py:
  * word embedding (input_dim-2 dims) + 2-bit QUESTION-TYPE tag
    (cls questions: (0,1); mc question part: (1,0); mc choice part: (0,1))
    + 2-bit TEXT/VISION tag; slots get the vision tag
  * zero-init learnable CLS token; learnable positional encoding
  * shared transformer encoder (d_model = (input_dim+2) * num_heads) with
    key-padding masks over the padded question tokens
  * two answer heads: multi-class MLP for descriptive (cls) questions and a
    binary MLP per multiple-choice option; CE + BCE losses
  * masked-object loss intentionally unsupported (asserted off when using
    SAVi slots, transformer.py:136-137).

TPU-native divergence — RAGGED MC BATCHING: the reference packs a variable
number of (question, choice) pairs per batch via an ``mc_flag`` index vector
(clevrer_vqa/datasets/clevrer.py:400-477), giving dynamic shapes. Here every
batch row is ONE (question [, choice]) pair — cls and mc rows flow through
the SAME static-shape transformer forward, and per-row ``is_cls`` masks
select which head's loss applies. Question-level MC scoring (all choices
correct) aggregates rows host-side by ``question_id`` in the eval CLI.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .nn import PosEnc, TransformerEncoder


class CLEVRERTransformerModel(nn.Module):
    transformer_dict: dict = None
    lang_dict: dict = None
    vision_dict: dict = None
    loss_dict: dict = None

    def setup(self):
        td = self.transformer_dict or {}
        lg = self.lang_dict or {}
        vd = self.vision_dict or {}
        assert not (self.loss_dict or {}).get("use_mask_obj_loss", False), (
            "don't use mask_obj_loss with SAVi slots"
        )

        input_dim = td.get("input_dim", 16)
        self.lang_emb_dim = input_dim - 2
        self.tok_dim = input_dim + 2  # + text/vision tag
        num_heads = td.get("num_heads", 10)
        self.d_model = self.tok_dim * num_heads  # Aloe convention
        self.input_len = td.get("input_len", 207) + 1  # + CLS
        self.question_len = lg.get("question_len", 20)
        self.num_answer_classes = lg.get("answer_vocab_size", 22)

        self.q_embedding = nn.Embed(
            lg.get("question_vocab_size", 82), self.lang_emb_dim
        )
        self.q_in_proj = nn.Dense(self.d_model)
        # f32 precision: consumes raw slot features — see the _F32 note in
        # models/readout.py (bf16 MXU rounding can swamp small
        # discriminative directions in unnormalized slots)
        self.vision_in_proj = nn.Dense(
            self.d_model, precision=jax.lax.Precision.HIGHEST
        )
        self.cls_param = self.param(
            "CLS", nn.initializers.zeros, (1, 1, self.d_model)
        )
        self.pos_enc = PosEnc(
            td.get("pos_enc", "learnable"), self.input_len, self.d_model
        )
        self.transformer_encoder = TransformerEncoder(
            d_model=self.d_model,
            num_layers=td.get("num_layers", 28),
            num_heads=num_heads,
            ffn_dim=td.get("ffn_dim", 1024),
            norm_first=td.get("norm_first", True),
        )
        cls_mlp = td.get("cls_mlp_size", 128)
        self.cls_answer_0 = nn.Dense(cls_mlp)
        self.cls_answer_1 = nn.Dense(self.num_answer_classes)
        self.mc_answer_0 = nn.Dense(cls_mlp)
        self.mc_answer_1 = nn.Dense(1)

    def __call__(self, batch: dict, deterministic: bool = True):
        """Row-based forward.

        batch:
          - video_emb   [B, T, N, Cv] slots
          - q_tokens    [B, L] int
          - q_pad_mask  [B, L] bool, True = padded
          - is_cls      [B] bool: descriptive (True) vs multiple-choice row
        returns {'cls_answer_logits': [B, A], 'mc_answer_logits': [B]}
        """
        v = batch["video_emb"]
        B, T, N, Cv = v.shape
        q_tokens = batch["q_tokens"]
        L = q_tokens.shape[1]
        is_cls = batch["is_cls"].astype(bool)

        # text embedding + question-type tag + text tag
        q_emb = self.q_embedding(q_tokens)  # [B, L, lang_emb_dim]
        pos = jnp.arange(L)
        is_question_part = (pos < self.question_len)[None, :]  # [1, L]
        # cls rows: (0, 1); mc question part: (1, 0); mc choice part: (0, 1)
        tag0 = jnp.where(is_cls[:, None], 0.0, is_question_part.astype(jnp.float32))
        tag1 = 1.0 - tag0
        qtype_tag = jnp.stack([tag0, tag1], axis=-1)  # [B, L, 2]
        text_tag = jnp.broadcast_to(jnp.array([1.0, 0.0]), (B, L, 2))
        q_emb = jnp.concatenate([q_emb, qtype_tag, text_tag], axis=-1)
        q_emb = self.q_in_proj(q_emb)  # [B, L, D]

        # vision tokens + vision tag
        v = v.reshape(B, T * N, Cv)
        vision_tag = jnp.broadcast_to(jnp.array([0.0, 1.0]), (B, T * N, 2))
        v_emb = self.vision_in_proj(jnp.concatenate([v, vision_tag], axis=-1))

        cls_tok = jnp.broadcast_to(self.cls_param, (B, 1, self.d_model))
        x = jnp.concatenate([cls_tok, v_emb, q_emb], axis=1)
        assert x.shape[1] == self.input_len, (
            f"input length {x.shape[1]} != configured {self.input_len}"
        )
        x = x + self.pos_enc().astype(x.dtype)

        pad_mask = jnp.concatenate(
            [jnp.zeros((B, 1 + T * N), bool), batch["q_pad_mask"].astype(bool)],
            axis=1,
        )
        out = self.transformer_encoder(
            x, key_padding_mask=pad_mask, deterministic=deterministic
        )
        cls_emb = out[:, 0]  # [B, D]
        cls_logits = self.cls_answer_1(nn.relu(self.cls_answer_0(cls_emb)))
        mc_logits = self.mc_answer_1(nn.relu(self.mc_answer_0(cls_emb)))[:, 0]
        return {"cls_answer_logits": cls_logits, "mc_answer_logits": mc_logits}

    def loss_function(self, batch: dict, out: dict) -> dict:
        is_cls = batch["is_cls"].astype(jnp.float32)
        n_cls = is_cls.sum()
        n_mc = (1.0 - is_cls).sum()

        logp = jax.nn.log_softmax(out["cls_answer_logits"], axis=-1)
        label = batch["label"].astype(jnp.int32)
        ce = -jnp.take_along_axis(logp, label[:, None], axis=-1)[:, 0]
        cls_loss = (ce * is_cls).sum() / jnp.maximum(n_cls, 1.0)

        mc_logits = out["mc_answer_logits"]
        mc_label = batch["label"].astype(jnp.float32)
        bce = (
            jnp.maximum(mc_logits, 0.0)
            - mc_logits * mc_label
            + jnp.log1p(jnp.exp(-jnp.abs(mc_logits)))
        )
        mc_loss = (bce * (1.0 - is_cls)).sum() / jnp.maximum(n_mc, 1.0)
        return {"cls_answer_loss": cls_loss, "mc_answer_loss": mc_loss}


class CLEVRERAloe(nn.Module):
    """BaseModel wrapper (reference aloe.py): losses + per-subtype accuracy.

    Eval accuracies HERE are row-level (descriptive multi-class acc and
    per-choice MC acc) because a jitted loss sees one dense row batch;
    question-level all-choices-correct MC scoring and per-subtype
    (explanatory/predictive/counterfactual) accuracy — reference
    aloe.py:62-92 — are aggregated host-side from ``eval_preds`` by BOTH
    the trainer's val epoch (methods.VQAMethod.validation_epoch, matching
    the reference's in-training metrics, clevrer_vqa/method.py:63-112) and
    cli/test_clevrer_vqa; the two agree by test
    (tests/test_downstream_e2e.py::test_aloe_vqa_training_e2e).
    """

    transformer_dict: dict = None
    lang_dict: dict = None
    vision_dict: dict = None
    loss_dict: dict = None

    def setup(self):
        self.transformer_model = CLEVRERTransformerModel(
            transformer_dict=self.transformer_dict,
            lang_dict=self.lang_dict,
            vision_dict=self.vision_dict,
            loss_dict=self.loss_dict,
            name="transformer_model",
        )

    def __call__(self, batch: dict, deterministic: bool = True):
        return self.transformer_model(batch, deterministic=deterministic)

    def calc_train_loss(self, batch: dict, out: dict) -> dict:
        return self.transformer_model.loss_function(batch, out)

    def train_loss(self, batch: dict) -> dict:
        out = self(batch, deterministic=False)
        return self.calc_train_loss(batch, out)

    def eval_loss(self, batch: dict) -> dict:
        """Row-level eval metrics with ``_bs`` companion counts so the
        trainer aggregates each metric in its OWN batch-size domain
        (reference clevrer_vqa/method.py:63-112, aloe.py:46-92 returns
        per-type ``_bs`` alongside every accuracy)."""
        out = self(batch, deterministic=True)
        losses = self.calc_train_loss(batch, out)
        is_cls = batch["is_cls"].astype(jnp.float32)
        n_cls_raw = is_cls.sum()
        n_mc_raw = (1.0 - is_cls).sum()
        n_cls = jnp.maximum(n_cls_raw, 1.0)
        n_mc = jnp.maximum(n_mc_raw, 1.0)
        cls_pred = out["cls_answer_logits"].argmax(-1)
        cls_acc = (
            (cls_pred == batch["label"].astype(jnp.int32)).astype(jnp.float32)
            * is_cls
        ).sum() / n_cls
        mc_pred = (out["mc_answer_logits"] > 0).astype(jnp.float32)
        mc_acc = (
            (mc_pred == batch["label"].astype(jnp.float32)).astype(jnp.float32)
            * (1.0 - is_cls)
        ).sum() / n_mc
        losses["descriptive_acc"] = cls_acc
        losses["choice_acc"] = mc_acc
        losses["cls_answer_loss_bs"] = n_cls_raw
        losses["mc_answer_loss_bs"] = n_mc_raw
        losses["descriptive_acc_bs"] = n_cls_raw
        losses["choice_acc_bs"] = n_mc_raw
        return losses

    def eval_preds(self, batch: dict):
        """Per-row predictions for question-level scoring: returns
        (cls_pred [B] int, mc_row_correct [B] bool) — grouped by question
        host-side (trainer VQAMethod / cli.test_clevrer_vqa; reference
        computes this in-batch via its ragged mc_flag, aloe.py:62-75)."""
        out = self(batch, deterministic=True)
        cls_pred = out["cls_answer_logits"].argmax(-1)
        mc_correct = (out["mc_answer_logits"] > 0) == (batch["label"] > 0.5)
        return cls_pred, mc_correct
