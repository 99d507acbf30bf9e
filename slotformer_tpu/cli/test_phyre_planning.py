"""PHYRE planning evaluation: 3-model composition + AUCCESS.

Reference behavior (/root/reference/slotformer/phyre_planning/test_phyre_planning.py):
for each of 25 eval tasks x 10k candidate actions, render frame 0 with the
simulator, encode with SAVi, roll out with SingleStepSlotFormer, score with
the task-success classifier; rank actions by confidence and compute AUCCESS
(log-weighted success@k over the first 100 attempts). Shardable across jobs
by action range (``--split/--total_split``), merged with ``--collect``.

TPU-native: the SAVi encode -> rollout -> classify composition is ONE jitted
program per batch (the reference runs three separate CUDA models with host
round-trips in between). The simulator (host CPU) only renders frame 0.

Usage:
    python -m slotformer_tpu.cli.test_phyre_planning --params <sf_cfg.py> \
        --weight <sf_ckpt.pkl> --task_cls_params <readout_cfg.py> \
        --task_cls_weight <readout_ckpt.pkl> --savi_params <savi_cfg.py> \
        --savi_weight <savi_ckpt.pkl> [--split K --total_split N]
    python -m slotformer_tpu.cli.test_phyre_planning --collect <dir>
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..metrics.auccess import FAILED, INVALID, SOLVED, auccess_from_conf


def collect_results(save_path: str, total_split: int) -> None:
    conf0 = np.load(os.path.join(save_path, "pred_conf-0.npy"))
    gt0 = np.load(os.path.join(save_path, "gt_status-0.npy"))
    for split in range(1, total_split):
        conf = np.load(os.path.join(save_path, f"pred_conf-{split}.npy"))
        gt = np.load(os.path.join(save_path, f"gt_status-{split}.npy"))
        conf0[gt != -100] = conf[gt != -100]
        gt0[gt != -100] = gt[gt != -100]
    assert (gt0 != -100).all() and (conf0 != -100).all()
    np.save(os.path.join(save_path, "all_conf.npy"), conf0)
    np.save(os.path.join(save_path, "all_gt.npy"), gt0)
    score, s = auccess_from_conf(conf0, gt0)
    print("Success rate in the first 100 attempts:\n", s)
    print(f"AUCCESS = {score:.2f}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="PHYRE planning eval")
    parser.add_argument("--params", default="")
    parser.add_argument("--weight", default="")
    parser.add_argument("--task_cls_params", default="")
    parser.add_argument("--task_cls_weight", default="")
    parser.add_argument("--savi_params", default="")
    parser.add_argument("--savi_weight", default="")
    parser.add_argument("--split", type=int, default=-1)
    parser.add_argument("--total_split", type=int, default=10)
    parser.add_argument("--bs", type=int, default=128)
    parser.add_argument(
        "--num_acts", type=int, default=10000,
        help="candidate actions per task (reference fixes 10k, "
             "test_phyre_planning.py:139)")
    parser.add_argument("--collect", default="", help="merge shard results dir")
    args = parser.parse_args(argv)

    if args.collect:
        collect_results(args.collect, args.total_split)
        return

    import jax

    from ..datasets.phyre import observations_to_uint8_rgb
    from ..datasets.utils import BaseTransforms
    from ..models import build_model
    from ..runtime import load_params, load_state_dict

    try:
        import phyre
    except ImportError as e:
        raise ImportError(
            "PHYRE planning eval needs the `phyre` pip package"
        ) from e

    params = load_params(args.params)
    task_cls_params = load_params(args.task_cls_params)
    savi_params = load_params(args.savi_params)

    sf_model = build_model(params)
    sf_tree = load_state_dict(args.weight)
    cls_model = build_model(task_cls_params)
    cls_tree = load_state_dict(args.task_cls_weight)
    savi_model = build_model(savi_params)
    savi_tree = load_state_dict(args.savi_weight)

    vid_len = params.n_sample_frames
    rollout_len = vid_len - 1
    tf = BaseTransforms(params.resolution)
    reverse_color = params.get("reverse_color", False)

    # ---- the fused device pipeline: encode -> rollout -> classify
    @jax.jit
    def score_actions(savi_p, sf_p, cls_p, frame0):
        # frame0 [B, 1, H, W, 3]
        _, post_slots, _, _, _ = savi_model.apply(
            {"params": savi_p}, frame0, method="encode",
            rngs={"sample": jax.random.PRNGKey(0)},
        )  # [B, 1, N, C]
        pred = sf_model.apply(
            {"params": sf_p}, post_slots, rollout_len, method="rollout"
        )  # [B, vid_len-1, N, C]
        slots = jax.numpy.concatenate([post_slots, pred], axis=1)
        logits = cls_model.apply({"params": cls_p}, {"slots": slots})["logits"]
        return jax.nn.sigmoid(logits)

    # ---- PHYRE eval split: 25 tasks x 10k candidate actions
    protocal = params.phyre_protocal
    fold = params.phyre_fold
    eval_setup = f"ball_{protocal}_template"
    _, _, tasks = phyre.get_fold(eval_setup, fold)
    tasks = [t for t in tasks if t.split(":")[0] in
             [f"{i:05d}" for i in range(25)]]
    simulator = phyre.initialize_simulator(
        tasks, phyre.eval_setup_to_action_tier(eval_setup)
    )
    num_tasks = len(tasks)
    num_acts = args.num_acts
    cache = phyre.get_default_100k_cache("ball")
    act_lst = cache.action_array[:num_acts]
    sim_statuses = np.array(cache.get_sample(tasks, None)["simulation_statuses"])

    pairs = [(t, a) for t in range(num_tasks) for a in range(num_acts)]
    if args.split != -1:
        per = len(pairs) // args.total_split
        lo = per * args.split
        hi = per * (args.split + 1) if args.split < args.total_split - 1 else len(pairs)
        pairs = pairs[lo:hi]

    all_pred_conf = np.full((num_tasks, num_acts), -100.0)
    all_gt_status = np.full((num_tasks, num_acts), -100.0)

    bs = args.bs
    for i0 in range(0, len(pairs), bs):
        chunk = pairs[i0 : i0 + bs]
        frames, metas = [], []
        for t_id, a_id in chunk:
            status = int(sim_statuses[t_id, a_id])
            if status == INVALID:
                all_pred_conf[t_id, a_id] = -1.0
                all_gt_status[t_id, a_id] = status
                continue
            sim = simulator.simulate_action(
                t_id, act_lst[a_id], stride=60, need_images=True,
                need_featurized_objects=False,
            )
            img = tf(
                np.ascontiguousarray(
                    observations_to_uint8_rgb(sim.images[0], reverse_color)
                )
            )
            frames.append(img)
            metas.append((t_id, a_id, status))
        if not frames:
            continue
        batch = np.stack(frames)[:, None].astype(np.float32)  # [B, 1, H, W, 3]
        from ..parallel import pad_rows

        true_b = batch.shape[0]
        batch = pad_rows(batch, bs)
        conf = np.asarray(score_actions(savi_tree, sf_tree, cls_tree, batch))
        for k, (t_id, a_id, status) in enumerate(metas):
            all_pred_conf[t_id, a_id] = conf[k]
            all_gt_status[t_id, a_id] = status
        print(f"  {min(i0 + bs, len(pairs))}/{len(pairs)}", flush=True)

    save_path = os.path.join(
        os.path.dirname(os.path.abspath(args.task_cls_weight)), "test"
    )
    os.makedirs(save_path, exist_ok=True)
    tag = max(args.split, 0)
    np.save(os.path.join(save_path, f"pred_conf-{tag}.npy"), all_pred_conf)
    np.save(os.path.join(save_path, f"gt_status-{tag}.npy"), all_gt_status)
    print(f"[test_phyre_planning] shard saved -> {save_path}")
    if args.split == -1:
        score, s = auccess_from_conf(all_pred_conf, all_gt_status)
        print(f"AUCCESS = {score:.2f}")


if __name__ == "__main__":
    main()
