"""Unit tests for the runtime core (params, io, meters, schedules, ckpt)."""

import os

import numpy as np
import pytest

from slotformer_tpu.runtime import (
    AverageMeter,
    BaseParams,
    DataLoader,
    MeterBank,
    cosine_anneal,
    cosine_annealing_warmup,
    default_collate,
    dump_obj,
    graft,
    latest_checkpoint,
    load_checkpoint,
    load_obj,
    load_params,
    save_checkpoint,
)


class _Params(BaseParams):
    lr = 1e-3
    slot_dict = dict(num_slots=7)
    post_recon_loss_w = 1.0
    kld_loss_w = 1e-4


def test_params_attr_and_get():
    p = _Params()
    assert p.lr == 1e-3
    assert p.get("lr") == 1e-3
    assert p.get("missing", 42) == 42
    # instance mutation does not leak to class or other instances
    p.slot_dict["num_slots"] = 3
    p.lr = 5.0
    q = _Params()
    assert q.slot_dict["num_slots"] == 7
    assert q.lr == 1e-3


def test_params_loss_weights():
    p = _Params()
    assert p.loss_weights() == {"post_recon_loss": 1.0, "kld_loss": 1e-4}


def test_load_params_from_file(tmp_path):
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from slotformer_tpu.runtime import BaseParams\n"
        "class SlotFormerParams(BaseParams):\n"
        "    lr = 0.5\n"
    )
    p = load_params(str(cfg))
    assert p.lr == 0.5


def test_io_roundtrip(tmp_path):
    obj = {"train": {"vid_0.mp4": np.ones((4, 7, 16), np.float32)}}
    path = str(tmp_path / "slots.pkl")
    dump_obj(obj, path)
    loaded = load_obj(path)
    np.testing.assert_array_equal(loaded["train"]["vid_0.mp4"], obj["train"]["vid_0.mp4"])

    jpath = str(tmp_path / "meta.json")
    dump_obj({"a": 1}, jpath)
    assert load_obj(jpath) == {"a": 1}


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, n=1)
    m.update(3.0, n=3)
    assert m.avg == pytest.approx(2.5)
    bank = MeterBank()
    bank.update({"loss": 2.0}, n=2)
    bank.update({"loss": 4.0}, n=2)
    assert bank.averages()["loss"] == pytest.approx(3.0)


def test_cosine_warmup_schedule():
    sched = cosine_annealing_warmup(1000, max_lr=1.0, min_lr=0.01, warmup_steps=100)
    assert float(sched(0)) == pytest.approx(0.01)
    assert float(sched(100)) == pytest.approx(1.0, abs=1e-2)
    assert float(sched(1000)) == pytest.approx(0.01, abs=1e-3)
    # monotone decreasing after warmup
    vals = [float(sched(s)) for s in range(100, 1000, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_cosine_anneal_scalar():
    assert cosine_anneal(0, 1.0, 0.1, 0, 100) == pytest.approx(1.0)
    assert cosine_anneal(100, 1.0, 0.1, 0, 100) == pytest.approx(0.1)
    assert cosine_anneal(200, 1.0, 0.1, 0, 100) == pytest.approx(0.1)
    mid = cosine_anneal(50, 1.0, 0.1, 0, 100)
    assert 0.1 < mid < 1.0


def test_checkpoint_roundtrip_and_latest(tmp_path):
    params = {"enc": {"w": np.ones((3, 3), np.float32)}, "dec": {"b": np.zeros(4)}}
    p1 = str(tmp_path / "model_100.ckpt.pkl")
    p2 = str(tmp_path / "model_200.ckpt.pkl")
    save_checkpoint(p1, params, step=100)
    save_checkpoint(p2, params, step=200)
    ck = load_checkpoint(p1)
    assert ck["step"] == 100
    np.testing.assert_array_equal(ck["state_dict"]["enc"]["w"], params["enc"]["w"])
    assert latest_checkpoint(str(tmp_path)) == p2


def test_graft_subtree():
    dst = {"decoder": {"w": np.zeros((2, 2))}, "rollouter": {"w": np.ones(3)}}
    src = {"decoder": {"w": np.full((2, 2), 7.0)}, "encoder": {"w": np.ones(5)}}
    out = graft(dst, src, {"decoder": "decoder"})
    np.testing.assert_array_equal(out["decoder"]["w"], 7.0 * np.ones((2, 2)))
    np.testing.assert_array_equal(out["rollouter"]["w"], np.ones(3))
    # originals untouched
    np.testing.assert_array_equal(dst["decoder"]["w"], np.zeros((2, 2)))
    # structure mismatch raises
    with pytest.raises((KeyError, ValueError)):
        graft(dst, {"decoder": {"other": np.zeros(1)}}, {"decoder": "decoder"})


class _ToyDataset:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.float32), "idx": i}


def test_dataloader_determinism_and_shapes():
    ds = _ToyDataset(10)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=7, num_workers=2)
    dl.set_epoch(3)
    b1 = [b["idx"].tolist() for b in dl]
    dl.set_epoch(3)
    b2 = [b["idx"].tolist() for b in dl]
    assert b1 == b2  # same epoch -> same order
    dl.set_epoch(4)
    b3 = [b["idx"].tolist() for b in dl]
    assert b1 != b3  # different epoch -> different order
    assert len(b1) == 2  # drop_last: 10 // 4
    for b in DataLoader(ds, batch_size=4, num_workers=0):
        assert b["x"].shape[1] == 2


def test_default_collate_types():
    out = default_collate(
        [{"a": np.ones(3), "b": 1, "c": 0.5, "d": "x"}, {"a": np.zeros(3), "b": 2, "c": 1.5, "d": "y"}]
    )
    assert out["a"].shape == (2, 3)
    assert out["b"].dtype == np.int32
    assert out["c"].dtype == np.float32
    assert out["d"] == ["x", "y"]


def test_dataloader_abandoned_iterator_no_thread_leak():
    """Abandoning a partially-consumed iterator must not leak the producer
    thread (regression test for the blocking q.put)."""
    import gc
    import threading
    import time

    ds = _ToyDataset(64)
    dl = DataLoader(ds, batch_size=4, num_workers=2, prefetch=1)
    before = threading.active_count()
    it = iter(dl)
    next(it)
    it.close()  # abandon
    gc.collect()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, (
        f"leaked threads: {threading.enumerate()}"
    )


def test_checkpoint_format_version(tmp_path):
    """Every saved ckpt is stamped; unstamped (round-1) payloads containing
    ConvTranspose kernels hard-fail (old deconv geometry loads without a
    shape error when in==out channels — round 3 lost a hardware window to
    one loading silently); future versions hard-fail too."""
    import pickle

    from slotformer_tpu.runtime import checkpoint as C

    p = str(tmp_path / "x.ckpt.pkl")
    tree = {"decoder": {"deconv_0": {"ConvTranspose_0": {
        "kernel": np.zeros((3, 3, 4, 4), np.float32)}}}}
    C.save_checkpoint(p, tree)
    payload = C.load_checkpoint(p)
    assert payload["format_version"] == C.FORMAT_VERSION

    del payload["format_version"]
    with open(p, "wb") as f:
        pickle.dump(payload, f)
    with pytest.raises(ValueError, match="deconv geometry"):
        C.load_checkpoint(p)

    payload["format_version"] = C.FORMAT_VERSION + 1
    with open(p, "wb") as f:
        pickle.dump(payload, f)
    with pytest.raises(ValueError, match="format_version"):
        C.load_checkpoint(p)


def test_dataloader_iter_from_skips_at_index_level():
    """iter_from(k) must yield exactly the batches after k of the SAME epoch
    order, without touching the skipped samples (mid-epoch resume cost)."""
    touched = []

    class DS:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            touched.append(i)
            return {"x": np.full((2,), i, np.float32)}

    dl = DataLoader(DS(), batch_size=4, shuffle=True, drop_last=True,
                    seed=3, num_workers=0)
    dl.set_epoch(1)
    full = [b["x"].copy() for b in dl]
    touched.clear()
    tail = [b["x"].copy() for b in dl.iter_from(3)]
    assert len(tail) == len(full) - 3
    for a, b in zip(tail, full[3:]):
        np.testing.assert_array_equal(a, b)
    # only the tail's samples were loaded
    assert len(touched) == 4 * len(tail)


def test_sgd_with_weight_decay_is_not_adamw():
    """optimizer='SGD' + weight_decay must build SGD with additive decay —
    not silently hijack the config into AdamW (no Adam moment state), and
    the update must equal -lr * (g + wd * p)."""
    import jax
    import jax.numpy as jnp

    from slotformer_tpu.runtime import BaseParams
    from slotformer_tpu.runtime.schedules import build_optimizer

    class P(BaseParams):
        optimizer = "SGD"
        lr = 0.1
        weight_decay = 0.5
        warmup_steps_pct = 0.0

    tx = build_optimizer(P(), total_steps=10)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    assert "Adam" not in str(jax.tree_util.tree_structure(state))
    grads = {"w": jnp.full((3,), 2.0)}
    updates, _ = tx.update(grads, state, params)
    # step 0 of the cosine schedule with no warmup is max_lr
    np.testing.assert_allclose(
        np.asarray(updates["w"]), -0.1 * (2.0 + 0.5 * 1.0), rtol=1e-6)
