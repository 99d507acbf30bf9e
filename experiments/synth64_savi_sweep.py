"""Short SAVi variant sweep on hardware: which config escapes the
spatial-tiling attractor (ARI > 0) fastest on the synthetic data?

Run:  python experiments/synth64_savi_sweep.py [steps_per_variant]
Prints per-variant val FG-ARI/ARI after a short training budget.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


VARIANTS = {
    # deterministic SAVi, higher lr, 10x data variety
    "det_lr4_2k": dict(kld_method="none", kld_loss_w=0.0, lr=4e-4,
                       num_videos_train=2000),
    # deterministic + fewer slots (4 objects + bg)
    "det_slots5": dict(kld_method="none", kld_loss_w=0.0, lr=4e-4,
                       num_videos_train=2000, num_slots=5),
    # current stochastic config, just 10x data
    "sto_2k": dict(num_videos_train=2000),
    # ---- round-3 (VERDICT missing #4): give the reference's STOCHASTIC
    # recipe (kld_method='var-0.01', kld_loss_w=1e-4,
    # stosavi_clevrer_params.py:21-28,79) a real budget — run these with a
    # 3-4x epoch budget (e.g. `--one sto_lr4e-4 24`). The 20-step
    # noise-matched trajectory parity test (test_golden_parity.py) already
    # pins the KLD/sampling math to the reference; this measures whether
    # the recipe *converges* here given steps.
    # stochastic at the LR that works for deterministic on this data
    "sto_lr4e-4": dict(kld_method="var-0.01", kld_loss_w=1e-4, lr=4e-4,
                       num_videos_train=2000),
    # the reference's exact LR
    "sto_ref_lr1e-4": dict(kld_method="var-0.01", kld_loss_w=1e-4, lr=1e-4,
                           num_videos_train=2000),
}


def run_variant(name, overrides, max_epochs):
    import jax

    from slotformer_tpu.datasets import build_dataset
    from slotformer_tpu.methods import build_method
    from slotformer_tpu.metrics.vp_metrics import (ARI_metric, fARI_metric,
                                                   postproc_mask)
    from slotformer_tpu.models import build_model
    from slotformer_tpu.runtime import BaseDataModule, load_params

    params = load_params("experiments/synth64_savi_params.py")
    params.max_epochs = max_epochs
    params.eval_interval = max(max_epochs, 1)
    params.save_interval = 1e9  # no mid-run ckpts
    params.n_samples = 0
    params.max_rss_gb = 110  # short runs; don't trip the watchdog
    for k, v in overrides.items():
        if k == "num_slots":
            params.slot_dict = dict(params.slot_dict, num_slots=v)
        elif k in ("kld_method",):
            params.loss_dict = dict(params.loss_dict, kld_method=v)
        else:
            setattr(params, k, v)

    train_set, val_set = build_dataset(params)
    dm = BaseDataModule(params, train_set, val_set)
    model = build_model(params)
    ckp = f"/tmp/savi_sweep/{name}"
    method = build_method(model=model, datamodule=dm, params=params,
                         ckp_path=ckp)
    method.setup_state()
    method.fit()

    # val ARI of the trained encoder's own masks
    params.load_mask = True
    _, val_m = build_dataset(params)
    items = [val_m[i] for i in range(8)]
    img = np.stack([it["img"] for it in items])
    gt = np.stack([it["mask"] for it in items]).astype(np.int64)
    tree = jax.device_get(method.state["params"])
    out = model.apply({"params": tree}, {"img": img},
                      rngs={"sample": jax.random.PRNGKey(0)})
    pm = np.asarray(postproc_mask(out["post_masks"]))
    ns = params.slot_dict["num_slots"]
    ari = ARI_metric(gt.reshape(-1, 64, 64), pm.reshape(-1, 64, 64),
                     num_classes=max(ns + 1, 8))
    fari = fARI_metric(gt.reshape(-1, 64, 64), pm.reshape(-1, 64, 64),
                       num_classes=max(ns + 1, 8))
    print(f"[sweep] {name}: ARI={ari:.4f} FG-ARI={fari:.4f} "
          f"(it={method.it})", flush=True)
    return ari, fari


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--one":
        # child mode: one variant in a fresh process (fresh tunnel client)
        name = sys.argv[2]
        epochs = int(sys.argv[3])
        run_variant(name, VARIANTS[name], epochs)
        sys.exit(0)
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import subprocess
    for name in VARIANTS:
        print(f"[sweep] launching {name} ...", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name,
             str(epochs)],
            check=False, timeout=3600,
        )
