"""LPIPS golden parity: jnp forward vs an independent torch implementation.

Fixture produced by tests/golden/gen_lpips_golden.py (torch mirror of the
lpips-package forward with the same weight arrays). Passing means the
architecture and the converted-weight layout are exactly right, so an
officially converted weight file (scripts/convert_lpips.py) reproduces the
reference metric (/root/reference/slotformer/video_prediction/test_vp.py:21-23).
"""

import os

import numpy as np
import pytest

from slotformer_tpu.metrics.lpips import (
    _build_lpips_fn,
    load_lpips,
    untrained_lpips_weights,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "lpips_golden.npz")


@pytest.fixture(scope="module")
def golden():
    assert os.path.isfile(GOLDEN), "run tests/golden/gen_lpips_golden.py"
    return np.load(GOLDEN)


def test_lpips_matches_torch_golden(golden):
    w = untrained_lpips_weights(int(golden["weight_seed"]))
    fn = _build_lpips_fn(w, source="untrained")
    got = np.asarray(fn(golden["x"], golden["y"]))
    np.testing.assert_allclose(got, golden["expected"], rtol=2e-4, atol=1e-6)


def test_lpips_self_distance_zero(golden):
    w = untrained_lpips_weights(int(golden["weight_seed"]))
    fn = _build_lpips_fn(w, source="untrained")
    got = np.asarray(fn(golden["x"], golden["x"]))
    np.testing.assert_allclose(got, golden["expected_self"], atol=1e-6)
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


@pytest.mark.slow
def test_load_lpips_fallback_and_file_roundtrip(tmp_path):
    # no path, no fallback -> None (silent-missing contract)
    assert load_lpips("") is None
    # untrained fallback is flagged via .source
    fn = load_lpips("", fallback="untrained")
    assert fn is not None and fn.source == "untrained"
    # weights written by the converter's --untrained mode load as "file"
    # and agree with the in-memory fallback
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.convert_lpips import main as convert_main

    out = str(tmp_path / "lpips_untrained.npz")
    convert_main(["--untrained", "--seed", "0", "-o", out])
    fn_file = load_lpips(out)
    assert fn_file.source == "file"
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fn_file(x, y)), np.asarray(fn(x, y)), rtol=1e-6
    )
    # distances behave like a metric: monotone under growing distortion
    d_small = np.asarray(fn(x, np.clip(x + 0.05, -1, 1)))
    d_big = np.asarray(fn(x, np.clip(x + 0.5, -1, 1)))
    assert (d_big > d_small).all()
