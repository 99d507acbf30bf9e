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


class VQAMethod(BaseMethod):
    """Aloe VQA training (reference clevrer_vqa/method.py)."""


class ReadoutMethod(BaseMethod):
    """PHYRE / Physion readout-head training."""
