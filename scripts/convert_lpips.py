#!/usr/bin/env python
"""Convert LPIPS (VGG) weights to the .npz layout slotformer_tpu uses.

Run this ONCE in any environment where the official weights are reachable,
then pass the resulting file to ``--lpips`` of ``cli/test_vp.py`` (or set
``LPIPS_WEIGHTS``). Three sources, in order of preference:

1. ``--from-lpips``: the ``lpips`` pip package (downloads torchvision VGG16 +
   ships the calibration heads). Reproduces the reference's metric exactly
   (/root/reference/slotformer/video_prediction/test_vp.py:21-23).

       python scripts/convert_lpips.py --from-lpips -o lpips_vgg.npz

2. ``--vgg-state-dict`` + ``--lin-state-dict``: offline conversion from a
   torchvision ``vgg16`` state_dict file and the lpips package's
   ``lpips/weights/v0.1/vgg.pth`` (calibration heads only). Needs torch but
   not the lpips/torchvision packages.

       python scripts/convert_lpips.py \
           --vgg-state-dict vgg16-397923af.pth \
           --lin-state-dict vgg.pth -o lpips_vgg.npz

3. ``--untrained``: deterministic seeded untrained-VGG fallback (same arrays
   ``metrics.lpips.load_lpips(fallback="untrained")`` builds in memory);
   exists so the fallback can be pinned to a file and inspected.

Output layout (see slotformer_tpu/metrics/lpips.py): HWIO conv kernels
``conv{block}_{j}/kernel`` + ``conv{block}_{j}/bias`` for the 13 VGG16 convs,
and bias-free 1x1 calibration heads ``lin{k}/kernel`` [1, 1, C, 1].
"""

from __future__ import annotations

import argparse

import numpy as np

# VGG16 `features` indices of the 13 convs, grouped into the 5 LPIPS blocks.
VGG16_CONV_IDX = [
    [(1, 1, 0), (1, 2, 2)],
    [(2, 1, 5), (2, 2, 7)],
    [(3, 1, 10), (3, 2, 12), (3, 3, 14)],
    [(4, 1, 17), (4, 2, 19), (4, 3, 21)],
    [(5, 1, 24), (5, 2, 26), (5, 3, 28)],
]


def _oihw_to_hwio(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(k, (2, 3, 1, 0)))


def convert_from_tensors(vgg_sd: dict, lin_sd: dict) -> dict:
    """vgg_sd: torchvision vgg16 state_dict (``features.N.weight``);
    lin_sd: lpips heads (``lin{k}.model.1.weight`` or ``{k}.weight``)."""
    out = {}
    for block in VGG16_CONV_IDX:
        for blk, j, idx in block:
            w = np.asarray(vgg_sd[f"features.{idx}.weight"], np.float32)
            b = np.asarray(vgg_sd[f"features.{idx}.bias"], np.float32)
            out[f"conv{blk}_{j}/kernel"] = _oihw_to_hwio(w)
            out[f"conv{blk}_{j}/bias"] = b
    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight",
                    f"{k}.model.1.weight", f"lin{k}.weight"):
            if key in lin_sd:
                lin = np.asarray(lin_sd[key], np.float32)  # [1, C, 1, 1]
                break
        else:
            raise KeyError(f"no lin{k} head found in lin state dict")
        out[f"lin{k}/kernel"] = _oihw_to_hwio(lin)
    return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--output", required=True, help=".npz output path")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--from-lpips", action="store_true")
    src.add_argument("--vgg-state-dict", help="torchvision vgg16 .pth")
    src.add_argument("--untrained", action="store_true")
    ap.add_argument("--lin-state-dict", help="lpips vgg.pth (heads only)")
    ap.add_argument("--seed", type=int, default=0, help="for --untrained")
    args = ap.parse_args(argv)

    if args.untrained:
        from slotformer_tpu.metrics.lpips import untrained_lpips_weights

        out = untrained_lpips_weights(args.seed)
    elif args.from_lpips:
        import lpips  # noqa: F401  (needs the pip package + egress)
        import torch

        net = lpips.LPIPS(net="vgg", spatial=False).eval()
        with torch.no_grad():
            vgg_sd, lin_sd = {}, {}
            # net.net holds the 5 slices of torchvision vgg16.features; walk
            # them back into flat `features.N.*` keys
            mods = []
            for s in range(1, 6):
                mods.extend(getattr(net.net, f"slice{s}"))
            conv_i = [i for blk in VGG16_CONV_IDX for (_, _, i) in blk]
            convs = [m for m in mods if isinstance(m, torch.nn.Conv2d)]
            assert len(convs) == 13
            for idx, conv in zip(conv_i, convs):
                vgg_sd[f"features.{idx}.weight"] = conv.weight.numpy()
                vgg_sd[f"features.{idx}.bias"] = conv.bias.numpy()
            for k in range(5):
                lin = getattr(net, f"lin{k}").model[1]
                lin_sd[f"lin{k}.model.1.weight"] = lin.weight.numpy()
        out = convert_from_tensors(vgg_sd, lin_sd)
    else:
        import torch

        if not args.lin_state_dict:
            ap.error("--vgg-state-dict requires --lin-state-dict")
        vgg_sd = {
            k: v.numpy()
            for k, v in torch.load(args.vgg_state_dict, map_location="cpu").items()
        }
        lin_sd = {
            k: v.numpy()
            for k, v in torch.load(args.lin_state_dict, map_location="cpu").items()
        }
        out = convert_from_tensors(vgg_sd, lin_sd)

    np.savez(args.output, **out)
    total = sum(v.size for v in out.values())
    print(f"wrote {args.output}: {len(out)} arrays, {total / 1e6:.1f}M params")


if __name__ == "__main__":
    main()
