"""Per-model training methods + ``build_method`` dispatch.

Mirrors the reference's per-task ``method.py`` files
(/root/reference/slotformer/*/method.py). Each method adds:
  * scheduled scalars (gumbel tau, loss-decay factor) as pure functions of
    the step index evaluated inside the jitted train step,
  * pretrained-subtree grafting at init (frozen decoders),
  * frozen-param optimizer masks.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax.numpy as jnp

from .runtime.checkpoint import graft, load_state_dict
from .runtime.method import BaseMethod
from .runtime.schedules import cosine_anneal


def build_method(model=None, datamodule=None, params=None, ckp_path="",
                 local_rank=0, use_ddp=False, use_fp16=False, **kw):
    """Reference signature (scripts/train.py:65-73)."""
    name = params.model
    cls = {
        "StoSAVi": SAViMethod,
        "SAVi": SAViMethod,
        "dVAE": dVAEMethod,
        "STEVE": STEVEMethod,
        "SlotFormer": SlotFormerMethod,
        "SingleStepSlotFormer": SlotFormerMethod,
        "STEVESlotFormer": STEVESlotFormerMethod,
        "CLEVRERAloe": VQAMethod,
        "PHYREReadout": ReadoutMethod,
        "PhysionReadout": ReadoutMethod,
    }.get(name)
    if cls is None:
        raise NotImplementedError(f"{name} method is not implemented")
    return cls(
        model=model, datamodule=datamodule, params=params, ckp_path=ckp_path,
        local_rank=local_rank, use_ddp=use_ddp, use_fp16=use_fp16, **kw,
    )


class SAViMethod(BaseMethod):
    """StoSAVi training (reference base_slots/method.py:99-162)."""

    def _sample_video(self) -> None:
        """Save per-slot decomposition grids: [gt | recon | slot_0..N] rows
        (reference _make_video_grid, base_slots/method.py:102-131) —
        written to <ckp>/vis/ instead of wandb.Video."""
        import jax
        import numpy as np

        from .runtime.io import save_video

        n = int(self.params.get("n_samples", 5))
        videos = self._sample_val_videos(n)

        def fwd(p, img):
            out = self.model.apply(
                {"params": p}, {"img": img},
                rngs={"sample": jax.random.PRNGKey(0)},
            )
            return (out["post_recon_combined"], out["post_recons"],
                    out["post_masks"])

        rows = []
        for v in videos:
            img = np.asarray(v["video"])[None]  # [1, T, H, W, 3]
            recon, recons, masks = jax.device_get(
                fwd(jax.device_get(self.state["params"]), img)
            )
            recon, recons, masks = recon[0], recons[0], masks[0]
            gt = img[0]
            per_slot = recons * masks + (1.0 - masks)  # white background
            panels = [gt, recon] + [per_slot[:, s] for s in range(per_slot.shape[1])]
            rows.append(np.concatenate(panels, axis=2))  # side by side
        grid = np.concatenate(rows, axis=1)  # stack samples vertically
        grid = np.clip(grid * 0.5 + 0.5, 0, 1)
        save_video(grid, os.path.join(self._vis_dir(), f"decomp_{self.it}.mp4"),
                   fps=8)


class SlotFormerMethod(BaseMethod):
    """SlotFormer training: frozen SAVi decoder + temporal loss-decay ramp
    (reference video_prediction/method.py:24-62)."""

    frozen_prefixes = ("decoder",)

    def _sample_video(self) -> None:
        """Save [gt | gt-slot recon | rollout] comparison videos
        (reference video_prediction/method.py:142-183)."""
        import jax
        import numpy as np

        from .runtime.io import save_video

        dst = self.val_loader.dataset
        if not hasattr(dst, "video_slots") and not hasattr(dst, "base"):
            raise NotImplementedError
        n = int(self.params.get("n_samples", 5))
        videos = self._sample_val_videos(n)
        base = dst.base if hasattr(dst, "base") else dst
        slots_dict = getattr(dst, "video_slots", None)
        if slots_dict is None:
            raise NotImplementedError
        params_tree = jax.device_get(self.state["params"])
        history = int(self.params.input_frames)
        offset = int(self.params.get("frame_offset", 1) or 1)

        def decode(p, slots):
            return self.model.apply({"params": p}, slots, method="decode")[0]

        def rollout(p, past, pred_len):
            out = self.model.apply(
                {"params": p}, past, pred_len, True, True, method="rollout"
            )
            return out["recon_combined"]

        rows = []
        for v in videos:
            fn = base.files[v["data_idx"]]
            fn = os.path.basename(fn)
            if fn not in slots_dict:
                continue
            slots = np.asarray(slots_dict[fn][::offset], np.float32)
            gt = np.asarray(v["video"])
            T = min(len(slots), len(gt))
            slots, gt = slots[:T], gt[:T]
            recon = np.asarray(decode(params_tree, slots))  # [T, H, W, 3]
            ro = np.asarray(
                rollout(params_tree, slots[None, :history], T - history)
            )[0]
            rows.append(np.concatenate([gt, recon, ro], axis=2))
        if not rows:
            return
        grid = np.clip(np.concatenate(rows, axis=1) * 0.5 + 0.5, 0, 1)
        save_video(grid, os.path.join(self._vis_dir(), f"rollout_{self.it}.mp4"),
                   fps=8)

    def _post_init_params(self, params):
        ckp = (self.params.get("dec_dict") or {}).get("dec_ckp_path", "")
        if ckp:
            src = load_state_dict(ckp)
            params = graft(params, src, {"decoder": "decoder"})
        return params

    def train_loss_kwargs(self, step) -> Dict[str, Any]:
        if not self.params.get("use_loss_decay", False):
            return {}
        decay_steps = float(self.params.get("loss_decay_pct", 0.0)) * self.total_steps
        if decay_steps <= 0:
            return {}
        # ramp the decay factor linearly 0.01 -> 1 over decay_steps
        factor = jnp.minimum(0.01 + step / decay_steps * 0.99, 1.0)
        return {"loss_decay_factor": factor}


class STEVESlotFormerMethod(SlotFormerMethod):
    """SlotFormer over STEVE slots: also grafts the frozen dVAE + STEVE
    transformer decoder (reference steve_slotformer.py:62-84)."""

    frozen_prefixes = ("decoder", "dvae", "trans_decoder")

    def _post_init_params(self, params):
        dd = self.params.get("dec_dict") or {}
        if dd.get("dec_ckp_path", ""):
            src = load_state_dict(dd["dec_ckp_path"])
            # STEVE ckpt holds dvae + trans_decoder subtrees
            params = graft(
                params, src,
                {"dvae": "dvae", "trans_decoder": "trans_decoder"},
            )
        return params


class dVAEMethod(BaseMethod):
    """dVAE training with per-step gumbel-tau cosine annealing
    (reference base_slots/method.py:165-231)."""

    def _sample_video(self) -> None:
        """[gt | hard-token recon] grids per val epoch (reference
        base_slots/method.py:168-205) — saved to <ckp>/vis/."""
        import jax
        import numpy as np

        from .runtime.io import save_video

        n = int(self.params.get("n_samples", 5))
        videos = self._sample_val_videos(n)
        params_tree = jax.device_get(self.state["params"])

        def fwd(img):
            return self.model.apply(
                {"params": params_tree}, {"img": img}, tau=1.0, hard=True,
                rngs={"sample": jax.random.PRNGKey(0)},
            )["recon"]

        rows = []
        for v in videos:
            img = np.asarray(v["video"])[None]  # [1, T, H, W, 3]
            recon = np.asarray(jax.device_get(fwd(img)))[0]
            rows.append(np.concatenate([img[0], recon], axis=2))
        grid = np.clip(np.concatenate(rows, axis=1) * 0.5 + 0.5, 0, 1)
        save_video(grid, os.path.join(self._vis_dir(), f"recon_{self.it}.mp4"),
                   fps=8)

    def train_loss_kwargs(self, step) -> Dict[str, Any]:
        decay_steps = float(self.params.get("tau_decay_pct", 0.3)) * self.total_steps
        tau = cosine_anneal(
            step,
            start_value=float(self.params.get("init_tau", 1.0)),
            final_value=float(self.params.get("final_tau", 0.1)),
            start_step=0,
            final_step=int(decay_steps),
        )
        return {"tau": tau}


class STEVEMethod(BaseMethod):
    """STEVE training: frozen dVAE tokenizer; dual LR (main vs transformer
    decoder) handled by runtime.schedules.build_optimizer via params.dec_lr
    (reference base_slots/method.py:234-276)."""

    frozen_prefixes = ("dvae",)

    def _post_init_params(self, params):
        ckp = (self.params.get("dvae_dict") or {}).get("dvae_ckp_path", "")
        assert ckp, "STEVE requires a pretrained dVAE (dvae_dict.dvae_ckp_path)"
        if ckp:
            src = load_state_dict(ckp)
            # a dVAE ckpt's state_dict root IS the dVAE param tree
            src_key = "dvae" if "dvae" in src else ""
            params = graft(params, src, {"dvae": src_key})
        return params

    def _sample_video(self) -> None:
        """Per-slot masked-decomposition grids (the reference skips the slow
        autoregressive recon at val too: base_slots/method.py:285-291,
        recon_video=False). Saved to <ckp>/vis/."""
        import jax
        import numpy as np

        from .runtime.io import save_video

        n = int(self.params.get("n_samples", 5))
        videos = self._sample_val_videos(n)
        params_tree = jax.device_get(self.state["params"])

        def fwd(img):
            out = self.model.apply(
                {"params": params_tree}, {"img": img}, testing=True,
                rngs={"sample": jax.random.PRNGKey(0)},
            )
            return out["masks"]  # [1, T, N, H, W] (upsampled at eval)

        rows = []
        for v in videos:
            img = np.asarray(v["video"])[None]
            masks = np.asarray(jax.device_get(fwd(img)))[0]  # [T, N, H, W]
            masked = img[0][:, None] * masks[..., None]  # [T, N, H, W, 3]
            panels = [img[0]] + [masked[:, s] for s in range(masked.shape[1])]
            rows.append(np.concatenate(panels, axis=2))
        grid = np.clip(np.concatenate(rows, axis=1) * 0.5 + 0.5, 0, 1)
        save_video(grid, os.path.join(self._vis_dir(), f"decomp_{self.it}.mp4"),
                   fps=8)


class VQAMethod(BaseMethod):
    """Aloe VQA training (reference clevrer_vqa/method.py).

    Validation reproduces the reference's QUESTION-LEVEL scoring
    (aloe.py:33-92): multiple-choice questions count as correct only when
    every choice row is right, with per-subtype (explanatory/predictive/
    counterfactual) accuracies. Rows of one question are regrouped by
    (scene_index, question_id) host-side — the same aggregation
    cli/test_clevrer_vqa uses — so val logs match the offline CLI."""

    def _make_eval_step(self):
        import jax

        model = self.model

        def eval_step(state, batch, batch_idx):
            # batch_idx unused (Aloe eval is fully deterministic); kept for
            # the BaseMethod eval-step call signature
            del batch_idx
            losses = model.apply(
                {"params": state["params"]}, batch, method="eval_loss"
            )
            cls_pred, mc_correct = model.apply(
                {"params": state["params"]}, batch, method="eval_preds"
            )
            # the duplicated forward inside one jit is CSE'd by XLA
            return losses, cls_pred, mc_correct

        return jax.jit(eval_step)

    def validation_epoch(self, san_check_step: int = -1) -> Dict[str, float]:
        from collections import defaultdict

        import numpy as np

        self.stats.reset()
        if self._eval_step_fn is None:
            self._eval_step_fn = self._make_eval_step()
        mc_rows = defaultdict(list)  # (scene, qid) -> [(correct, subtype)]
        for bi, (batch, db, n) in enumerate(
                self._val_batches(san_check_step)):
            losses, _, mc_correct = self._eval_step_fn(self.state, db, bi)
            self._update_val_stats(losses, n)
            is_cls = np.asarray(batch["is_cls"]).astype(bool)
            scene = np.asarray(batch["scene_index"])
            qid = np.asarray(batch["question_id"])
            sub = np.asarray(batch["q_subtype"])
            mc_corr = np.asarray(mc_correct)
            for r in np.nonzero(~is_cls)[0]:
                mc_rows[(int(scene[r]), int(qid[r]))].append(
                    (bool(mc_corr[r]), int(sub[r]))
                )
        per_subtype = defaultdict(list)
        q_correct = []
        for rows in mc_rows.values():
            ok = all(c for c, _ in rows)
            q_correct.append(ok)
            per_subtype[rows[0][1]].append(ok)
        extra = {}
        if q_correct:
            extra["multiple-choice_acc"] = float(np.mean(q_correct))
        for name, sid in (
            ("explanatory", 1), ("predictive", 2), ("counterfactual", 3)
        ):
            if per_subtype.get(sid):
                extra[f"{name}_acc"] = float(np.mean(per_subtype[sid]))
        return self._finish_validation(san_check_step, extra=extra)


class ReadoutMethod(BaseMethod):
    """PHYRE / Physion readout-head training (reference
    phyre_planning/method.py + physion_vqa/method.py: val-time sample videos
    captioned with GT label and predicted success probability). Videos go to
    <ckp>/vis/ with a sidecar JSON of (gt, pred) per sample instead of
    wandb captions (documented divergence)."""

    def _sample_video(self) -> None:
        import json

        import jax
        import numpy as np

        from .runtime.io import save_video

        dst = self.val_loader.dataset
        if not hasattr(dst, "load_img"):
            raise NotImplementedError
        n = int(self.params.get("n_samples", 5))
        saved = dst.load_img
        dst.load_img = True
        try:
            idxs = np.arange(0, len(dst), max(len(dst) // n, 1))[:n]
            items = [dst[int(i)] for i in idxs]
        finally:
            dst.load_img = saved
        if "img" not in items[0]:
            raise NotImplementedError
        batch = {
            k: np.stack([np.asarray(it[k]) for it in items])
            for k in items[0]
            # arrays + NUMERIC scalars only (np.isscalar is True for str —
            # filename metadata must not be np.stack'd into the model batch)
            if hasattr(items[0][k], "shape")
            or isinstance(items[0][k], (int, float, np.number))
        }
        params_tree = jax.device_get(self.state["params"])
        out = self.model.apply({"params": params_tree}, batch)
        probs = np.asarray(jax.nn.sigmoid(out["logits"])).reshape(-1)
        gts = np.asarray(batch["label"]).reshape(-1)
        grid = np.clip(
            np.concatenate(list(batch["img"]), axis=1) * 0.5 + 0.5, 0, 1
        )
        save_video(
            grid, os.path.join(self._vis_dir(), f"readout_{self.it}.mp4"), fps=8
        )
        with open(
            os.path.join(self._vis_dir(), f"readout_{self.it}.json"), "w"
        ) as f:
            json.dump(
                [
                    {"gt": int(g), "pred": round(float(p), 4)}
                    for g, p in zip(gts, probs)
                ],
                f,
            )
