"""Convert a reference (pairlab/SlotFormer, torch) checkpoint to this framework.

Reference checkpoints are ``{'state_dict': {dotted.torch.key: tensor}}``
(nerv trainer format, consumed via ``torch.load(w)['state_dict']`` throughout
the reference — e.g. extract_slots.py:125, test_vp.py:120). This CLI maps
them onto the flax param tree of the model named by ``--params`` using the
golden-parity-tested converters in ``runtime.torch_compat``, merges with a
fresh init for any unmapped subtree, and saves a framework checkpoint usable
everywhere a trained ckpt is (extract/rollout/eval CLIs, ``dec_ckp_path``
grafts, ...).

Usage:
    python -m slotformer_tpu.cli.convert_reference_ckpt \
        --params slotformer_tpu/configs/stosavi_clevrer_params.py \
        --ref_ckpt /path/to/reference/model.pth --save_path savi.ckpt.pkl
"""

from __future__ import annotations

import argparse

import numpy as np


def _dummy_batch(params):
    m = params.model
    B = 1
    res = tuple(params.resolution) if params.has("resolution") else (64, 64)
    if m in ("StoSAVi", "STEVE"):
        return {"img": np.zeros((B, 2) + res + (3,), np.float32)}
    if m == "dVAE":
        return {"img": np.zeros((B,) + res + (3,), np.float32)}
    if m in ("SlotFormer", "SingleStepSlotFormer", "STEVESlotFormer"):
        sd = params.slot_dict
        T = params.n_sample_frames
        batch = {"slots": np.zeros(
            (B, T, sd["num_slots"], sd["slot_size"]), np.float32)}
        if params.loss_dict.get("use_img_recon_loss", False):
            batch["img"] = np.zeros((B, T) + res + (3,), np.float32)
        return batch
    if m in ("PHYREReadout", "PhysionReadout"):
        rd = params.readout_dict
        return {
            "slots": np.zeros(
                (B, params.n_sample_frames, rd["num_slots"], rd["slot_size"]),
                np.float32),
            "label": np.zeros((B,), np.int32),
        }
    if m == "CLEVRERAloe":
        L = params.max_question_len + params.max_choice_len
        return {
            "video_emb": np.zeros(
                (B, params.n_sample_frames, params.max_n_objects + 1,
                 params.slot_size), np.float32),
            "q_tokens": np.zeros((B, L), np.int32),
            "q_pad_mask": np.zeros((B, L), bool),
            "is_cls": np.zeros((B,), bool),
            "label": np.zeros((B,), np.int32),
        }
    raise NotImplementedError(f"cannot convert model {m!r}")


def convert_state_dict(params, sd: dict) -> dict:
    """Map a reference state dict onto (a subset of) the flax param tree."""
    from ..runtime import torch_compat as tc

    m = params.model
    if m == "StoSAVi":
        return tc.stosavi(
            sd,
            n_convs=len(params.enc_dict["enc_channels"]) - 1,
            pred_dict=params.pred_dict,
            kernel_mlp=params.slot_dict.get("kernel_mlp", True),
            n_deconvs=len(params.dec_dict["dec_channels"]) - 1,
        )
    if m == "dVAE":
        return tc.dvae(sd)
    if m == "STEVE":
        return tc.steve(
            sd,
            n_convs=len(params.enc_dict["enc_channels"]) - 1,
            pred_dict=params.pred_dict,
            dec_num_layers=params.dec_dict["dec_num_layers"],
        )
    if m in ("SlotFormer", "SingleStepSlotFormer"):
        rd = params.rollout_dict
        tree = tc.slotformer(sd, rd["num_layers"], rd["num_heads"])
        # the reference shares StoSAVi's decoder naming (slotformer.py:196)
        tree["decoder"] = tc.savi_decoder(
            sd, n_deconvs=len(params.dec_dict["dec_channels"]) - 1)
        return tree
    if m == "STEVESlotFormer":
        rd = params.rollout_dict
        return tc.steve_slotformer(
            sd, rd["num_layers"], rd["num_heads"],
            params.dec_dict["dec_num_layers"],
        )
    if m == "PhysionReadout":
        return tc.physion_readout(sd)
    if m == "PHYREReadout":
        rd = params.readout_dict
        return tc.phyre_readout(sd, rd["num_layers"], rd["num_heads"])
    if m == "CLEVRERAloe":
        td = params.transformer_dict
        return tc.aloe(sd, td["num_layers"], td["num_heads"])
    raise NotImplementedError(m)


def _leaf_paths(t, path=""):
    if not isinstance(t, dict):
        return [path]
    out = []
    for k, v in t.items():
        out += _leaf_paths(v, f"{path}/{k}" if path else k)
    return out


def _merge(init_tree, conv_tree, path=""):
    """Converted leaves override init; every converted leaf must exist in the
    model with the same shape. Returns (merged, unmapped_leaf_paths) — an
    unmapped subtree contributes every leaf under it, so the CLI's coverage
    report counts leaves, not subtree roots."""
    merged, unmapped = {}, []
    for k, v in init_tree.items():
        p = f"{path}/{k}" if path else k
        if k not in conv_tree:
            merged[k] = v
            unmapped += _leaf_paths(v, p)
        elif isinstance(v, dict):
            sub, sub_un = _merge(v, conv_tree[k], p)
            merged[k] = sub
            unmapped += sub_un
        else:
            cv = np.asarray(conv_tree[k])
            assert cv.shape == v.shape, (
                f"shape mismatch at {p}: reference {cv.shape} vs model "
                f"{v.shape} — check the config matches the reference run")
            merged[k] = cv
    extra = set(conv_tree) - set(init_tree)
    assert not extra, f"converted keys not in the model at {path}: {extra}"
    return merged, unmapped


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="reference torch ckpt -> slotformer_tpu ckpt")
    parser.add_argument("--params", required=True, help="OUR model config")
    parser.add_argument("--ref_ckpt", required=True, help="reference .pth")
    parser.add_argument("--save_path", required=True, help="output .pkl")
    args = parser.parse_args(argv)

    import jax
    import torch

    from ..models import build_model
    from ..runtime import load_params, save_checkpoint

    params = load_params(args.params)
    batch = _dummy_batch(params)  # raises early for unsupported models
    ckp = torch.load(args.ref_ckpt, map_location="cpu", weights_only=True)
    sd = ckp.get("state_dict", ckp)
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}

    model = build_model(params)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "sample": rng}, batch)
    init_tree = jax.tree.map(np.asarray, variables["params"])

    conv = convert_state_dict(params, sd)
    merged, unmapped = _merge(init_tree, conv)
    n_leaves = len(jax.tree.leaves(merged))
    n_un = len(unmapped)
    print(f"[convert] mapped {n_leaves - n_un}/{n_leaves} params")
    if unmapped:
        print("[convert] WARNING: left at random init (no reference "
              "equivalent or unmapped):")
        for p in unmapped[:20]:
            print(f"  {p}")

    save_checkpoint(args.save_path, merged, step=int(ckp.get("iteration", 0))
                    if isinstance(ckp.get("iteration", 0), int) else 0)
    print(f"[convert] saved -> {args.save_path}")


if __name__ == "__main__":
    main()
