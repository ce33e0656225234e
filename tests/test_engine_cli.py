"""Engine + CLI integration tests on a hermetic fake ImageFolder."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.data.imagenet import DataLoader, ImageFolder, build_transform
from diffvit_tpu.data.synthetic import gaussian_calibration, make_fake_imagefolder
from diffvit_tpu.engine import QuantizedViT, validate
from diffvit_tpu.models import vit


TINY = vit.ViTSpec("test_tiny", embed_dim=64, depth=2, num_heads=2,
                   num_classes=4)


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("imagenet")
    make_fake_imagefolder(str(root / "train"), num_classes=4, per_class=3)
    make_fake_imagefolder(str(root / "val"), num_classes=4, per_class=2, seed=1)
    return str(root)


@pytest.mark.quick
def test_imagefolder_and_loader(fake_data):
    tf = build_transform()
    ds = ImageFolder(os.path.join(fake_data, "val"), tf)
    assert len(ds) == 8
    img, label = ds[0]
    assert img.shape == (3, 224, 224)
    dl = DataLoader(ds, batch_size=3, num_workers=2)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0][0].shape == (3, 3, 224, 224)
    assert batches[-1][0].shape == (2, 3, 224, 224)


def test_transform_matches_torchvision_semantics(fake_data):
    """Resize-shorter-side + center-crop on a non-square image."""
    from PIL import Image

    tf = build_transform(crop_pct=0.875)
    img = Image.new("RGB", (300, 400), (255, 0, 0))
    out = tf(img)
    assert out.shape == (3, 224, 224)


def test_transform_long_side_truncates_like_torchvision():
    """torchvision functional.resize TRUNCATES the long side
    (int(size * long / short)); rounding is off by 1px on e.g. 499x375
    (256 * 499/375 = 340.65 -> 340, not 341), which moves the crop window.
    Pin the full chain bit-exactly against a manual PIL reference."""
    from PIL import Image

    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 255, (375, 499, 3), dtype=np.uint8),
                          "RGB")
    tf = build_transform(crop_pct=0.875)
    got = tf(img)

    # manual torchvision chain: Resize(256, bicubic) -> CenterCrop(224)
    # -> ToTensor -> Normalize, with torchvision's exact geometry
    size = 256
    w, h = img.size
    assert w > h
    ow, oh = int(size * w / h), size
    assert ow == 340  # the truncation case (round would give 341)
    r = img.resize((ow, oh), Image.BICUBIC)
    left = int(round((ow - 224) / 2.0))
    top = int(round((oh - 224) / 2.0))
    c = r.crop((left, top, left + 224, top + 224))
    arr = np.asarray(c, np.uint8).transpose(2, 0, 1).astype(np.float32) / 255.0
    mean = np.asarray((0.485, 0.456, 0.406), np.float32).reshape(3, 1, 1)
    std = np.asarray((0.229, 0.224, 0.225), np.float32).reshape(3, 1, 1)
    np.testing.assert_array_equal(got, (arr - mean) / std)

    # the native decode path shares the geometry
    from diffvit_tpu.data import native_decode

    try:
        native_decode.load_library()
    except Exception:
        native_decode = None
    if native_decode is not None:
        import io

        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=95)
        dec = Image.open(io.BytesIO(buf.getvalue())).convert("RGB")
        want = tf(dec)
        out = native_decode.decode_preprocess(
            buf.getvalue(), mean=(0.485, 0.456, 0.406),
            std=(0.229, 0.224, 0.225))
        np.testing.assert_array_equal(out, want)


@pytest.mark.quick
def test_engine_validate(fake_data):
    import jax

    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    model = QuantizedViT(TINY, QuantConfig(), params=params)
    model.calibrate(gaussian_calibration(4))
    assert model.global_distance.shape == (4 * TINY.depth + 1, 4)

    tf = build_transform()
    ds = ImageFolder(os.path.join(fake_data, "val"), tf)
    dl = DataLoader(ds, batch_size=4, num_workers=2)
    loss, p1, p5 = validate(model, dl, print_freq=0)
    assert 0 <= p1 <= 100 and 0 <= p5 <= 100
    # fp path too
    loss, p1f, _ = validate(model, dl, quant=False, print_freq=0)
    assert np.isfinite(loss)


def test_mixed_precision_search_logic():
    from diffvit_tpu.analysis import mixed_precision as mp
    import random

    flops = vit.flops_list(TINY)
    rng = random.Random(0)
    # at depth 2 the patch conv dominates FLOPs, so the 1.1x constraint can
    # never fit the forced 8-bit first layer — same math as the reference;
    # widen the budget for the toy spec
    assert mp.sample_candidates(flops, rng, max_candidates=20) == []
    cands = mp.sample_candidates(flops, rng, max_candidates=20, factor=1.5)
    assert cands and all(len(c) == len(flops) for c in cands)
    assert all(c[0] == 8 for c in cands)
    # pairs share bits
    for c in cands:
        inner = c[1:-1]
        assert all(inner[2 * i] == inner[2 * i + 1]
                   for i in range(len(inner) // 2))
    gd = np.abs(np.random.default_rng(0).normal(size=(len(flops) - 1, 4)))
    hess = list(np.random.default_rng(1).random(len(flops) - 1))
    ranked = mp.omega_rank(cands, flops, hess, gd)
    assert ranked[0][1] <= ranked[-1][1]

    evals = []

    def fake_eval(bc):
        evals.append(bc)
        return float(sum(bc))  # favors 8-bit

    pop = mp.evolutionary_search(ranked, flops, fake_eval, pop_size=4,
                                 evo_iter=1, mutate_size=2, crossover_size=2,
                                 log=lambda *_: None)
    assert pop and pop[0][1] >= pop[-1][1]
    assert evals


def test_hessian_traces_smoke():
    import jax

    from diffvit_tpu.analysis.hessian import (hessian_sensitivity,
                                              hessian_target_names,
                                              hessian_traces)

    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    names = hessian_target_names(TINY)
    assert len(names) == 4 * TINY.depth + 1
    x = np.random.default_rng(0).standard_normal((2, 3, 224, 224)).astype("float32")
    y = np.array([0, 1])
    sel = [names[0], names[-1]]
    got_names, traces = hessian_traces(params, TINY, x, y,
                                       jax.random.PRNGKey(0), max_iter=3,
                                       names=sel)
    assert len(traces) == 2 and all(np.isfinite(traces))

    mh = hessian_sensitivity(params, TINY, [(x, y)], jax.random.PRNGKey(0),
                             max_iter=2, log=lambda *_: None)
    assert len(mh) == 4 * TINY.depth + 1
    assert all(0.0 <= v <= 1.0 for v in mh)


@pytest.mark.quick
def test_calibration_save_load(tmp_path):
    import jax

    from diffvit_tpu.engine import QuantizedViT

    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    m = QuantizedViT(TINY, QuantConfig(), params=params)
    m.calibrate(gaussian_calibration(2))
    x = gaussian_calibration(2, seed=3)
    ref = np.asarray(m(x))
    path = str(tmp_path / "calib.npz")
    m.save_calibration(path)

    m2 = QuantizedViT(TINY, QuantConfig(), params=params)
    m2.load_calibration(path)
    got = np.asarray(m2(x))
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(m2.global_distance, m.global_distance)


def test_hessian_traces_joint_matches_perleaf_estimand():
    import jax

    from diffvit_tpu.analysis.hessian import (hessian_traces,
                                              hessian_traces_joint)

    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((2, 3, 224, 224)).astype("float32")
    y = np.array([0, 1])
    names = ["blocks.0.attn.qkv.weight", "head.weight"]
    _, t_joint = hessian_traces_joint(params, TINY, x, y,
                                      jax.random.PRNGKey(0), max_iter=40,
                                      tol=0.0, names=names)
    _, t_leaf = hessian_traces(params, TINY, x, y, jax.random.PRNGKey(1),
                               max_iter=40, tol=0.0, names=names)
    # same estimand, independent probes: agree loosely at 40 samples
    for a, b in zip(t_joint, t_leaf):
        assert np.isfinite(a) and np.isfinite(b)
        denom = max(abs(a), abs(b), 1e-3)
        assert abs(a - b) / denom < 1.5, (a, b)


def test_bench_device_guard_and_matrix_attach(tmp_path):
    """bench.py's driver-facing contract when the chip is unreachable: the
    probe rejects a CPU-only backend (chip rows must not be measured on 1
    CPU core against the 5000 img/s target) and the matrix attach is
    best-effort (a truncated/missing BENCH_MATRIX.json must never prevent
    the one JSON line)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # test env backend is CPU-only -> guard must refuse with a reason
    ok, err = bench._device_ready(timeout_s=60)
    assert not ok and "CPU" in err

    out = bench._attach_matrix({"metric": "m"})
    assert "extra" in out  # repo matrix is present and well-formed

    bench.MATRIX_PATH = str(tmp_path / "missing.json")
    assert "extra" not in bench._attach_matrix({"metric": "m"})
    trunc = tmp_path / "trunc.json"
    trunc.write_text('{"rows": [')
    bench.MATRIX_PATH = str(trunc)
    assert "extra" not in bench._attach_matrix({"metric": "m"})
