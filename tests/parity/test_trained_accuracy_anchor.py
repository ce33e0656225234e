"""Trained-weights ACCURACY anchor (round-3 VERDICT missing-evidence #3).

Every other parity cell runs random weights and compares logits; this cell
anchors the *accuracy semantics* of the PTQ pipeline: a depth-4
deit-tiny-geometry model is TRAINED in the reference framework (torch,
fresh-sample stream of near-boundary prototype mixtures — small decision
margins so quantization noise genuinely flips predictions), the weights are
shared bit-for-bit with the rebuild, and both frameworks then measure FP /
W8 / W4 top-1 on a held-out val split across three quantization configs:

  * ptf+lis minmax, single-image calibration (the lossy regime: misfit
    scales, ~5-point drops),
  * legacy (ptf=lis=False, test_legacy_config's subset),
  * A4 (BIT_TYPE_A=int4, shimmed post-construction like the Swin cells;
    the collapse regime),

plus an 18-slot single-layer restore sweep (layerwise_quant_compare.py
semantics: bit_config=[4]*18 with one slot restored to 8) whose per-slot
accuracies and induced ordering must agree.

Assertions are tolerance-1-image (100/256 = 0.391): measured agreement is
EXACT on every cell (see PARITY.md "Trained-weights accuracy anchor"
table), the slack only guards against future torch/XLA rounding drift.

Reference match: accuracy-delta semantics of
/root/reference/restore_4_layers.txt:1 and the sweep loop of
/root/reference/layerwise_quant_compare.py:137-231;
calibration/eval composition per /root/reference/test_quant.py:222-249.
"""
from functools import partial

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.usefixtures("reference_available")

N_CLASSES, N_VAL, BS = 8, 256, 64
IMG, STEPS, ALPHA = 64, 250, 0.5
SLOTS = 4 * 4 + 2  # depth 4
TOL = 100.0 / N_VAL + 1e-6  # one val image


def _ref_model(cfg):
    from models.ptq import QIntLayerNorm
    from models.vit_fquant import VisionTransformer

    torch.manual_seed(0)
    return VisionTransformer(
        img_size=IMG, patch_size=16, embed_dim=192, depth=4, num_heads=3,
        mlp_ratio=4, qkv_bias=True, num_classes=N_CLASSES,
        norm_layer=partial(QIntLayerNorm, eps=1e-6),
        input_quant=True, cfg=cfg)


def _calibrate_ref(model, calib):
    model.eval()
    model.model_open_calibrate()
    with torch.no_grad():
        model.model_open_last_calibrate()
        model(torch.from_numpy(calib), plot=False)
    model.model_close_calibrate()
    model.model_quant()
    return model


def _torch_preds(model, x, bit_config=None):
    outs = []
    with torch.no_grad():
        for i in range(0, len(x), BS):
            out = model(torch.from_numpy(x[i:i + BS]), bit_config, False)
            logits = out[0] if isinstance(out, tuple) else out
            outs.append(logits.argmax(1).numpy())
    return np.concatenate(outs)


def _acc(preds, y):
    return 100.0 * (preds == y).mean()


@pytest.fixture(scope="module")
def trained():
    """Train the reference model on near-boundary mixtures; return the
    trained torch model + the identical jax param pytree + data."""
    from config import Config

    model = _ref_model(Config(ptf=True, lis=True, quant_method="minmax"))
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    lossf = torch.nn.CrossEntropyLoss()
    rng = np.random.default_rng(0)
    protos = rng.normal(0, 1, (N_CLASSES, 3, IMG, IMG)).astype(np.float32)

    def draw(r, n):
        a = r.integers(0, N_CLASSES, n)
        b = (a + r.integers(1, N_CLASSES, n)) % N_CLASSES
        w = r.uniform(0.42, 0.58, n).astype(np.float32)[:, None, None, None]
        y = np.where(w[:, 0, 0, 0] > 0.5, a, b).astype(np.int64)
        x = (ALPHA * (w * protos[a] + (1 - w) * protos[b])
             + r.normal(0, 1, (n, 3, IMG, IMG))).astype(np.float32)
        return x, y

    g = np.random.default_rng(3)
    model.train()
    torch.manual_seed(1)
    for _ in range(STEPS):
        xb, yb = draw(g, BS)
        out = model(torch.from_numpy(xb), None, False)
        logits = out[0] if isinstance(out, tuple) else out
        loss = lossf(logits, torch.from_numpy(yb))
        opt.zero_grad()
        loss.backward()
        opt.step()
    model.eval()

    xv, yv = draw(np.random.default_rng(2), N_VAL)
    calib, _ = draw(np.random.default_rng(7), 1)  # single-image calibration

    from diffvit_tpu.models import vit
    from diffvit_tpu.models.load import convert_vit_torch_state_dict

    spec = vit.ViTSpec("anchor_tiny", embed_dim=192, depth=4, num_heads=3,
                       img_size=IMG, num_classes=N_CLASSES)
    params = convert_vit_torch_state_dict(model.state_dict(), spec)
    return model, spec, params, xv, yv, calib


def _jax_cells(spec, params, cfg, calib, xv, bit_configs):
    """Calibrate once and return per-image preds for every bit_config via
    the one-compile bit-traced vmapped forward (engine.forward_bits)."""
    import jax.numpy as jnp

    from diffvit_tpu.engine import QuantizedViT
    from diffvit_tpu.models import vit

    m = QuantizedViT(spec, cfg, params=params)
    m.calibrate(jnp.asarray(calib))
    bits = np.asarray([list(b) for b in bit_configs], np.int32)
    preds = []
    for i in range(0, len(xv), BS):
        lg = np.asarray(m.forward_bits(xv[i:i + BS], bits))
        preds.append(lg.argmax(-1))
    del vit
    return [p for p in np.concatenate(preds, axis=1)]


@pytest.fixture(scope="module")
def cells(trained):
    """Compute every (framework, config, bit_config) accuracy cell once."""
    from config import Config

    model, spec, params, xv, yv, calib = trained
    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import vit as jvit
    from diffvit_tpu.ops.bit_types import BIT_TYPE_DICT as JBITS

    import jax
    import jax.numpy as jnp

    out = {"yv": yv}

    # ---- FP ----
    out["ref_fp_preds"] = _torch_preds(model, xv)
    ffp = jax.jit(lambda x: jvit.forward_fp(params, spec, x))
    out["my_fp_preds"] = np.concatenate([
        np.asarray(ffp(jnp.asarray(xv[i:i + BS]))).argmax(1)
        for i in range(0, len(xv), BS)])

    w8, w4 = [8] * SLOTS, [4] * SLOTS
    restores = []
    for idx in range(SLOTS):
        bc = [4] * SLOTS
        bc[idx] = 8
        restores.append(bc)

    # ---- ptf+lis (main, includes the restore sweep) ----
    main = _calibrate_ref(model, calib)  # trained model, calibrate in place
    out["ref_main"] = {"w8": _torch_preds(main, xv, w8),
                       "w4": _torch_preds(main, xv, w4),
                       "restore": [_torch_preds(main, xv, bc)
                                   for bc in restores]}
    jp = _jax_cells(spec, params,
                    QuantConfig(ptf=True, lis=True, quant_method="minmax"),
                    calib, xv, [w8, w4] + restores)
    out["my_main"] = {"w8": jp[0], "w4": jp[1], "restore": jp[2:]}

    # ---- legacy (ptf=lis=False) ----
    legacy = _ref_model(Config(ptf=False, lis=False, quant_method="minmax"))
    legacy.load_state_dict(model.state_dict(), strict=False)
    _calibrate_ref(legacy, calib)
    out["ref_legacy"] = {"w8": _torch_preds(legacy, xv, w8),
                         "w4": _torch_preds(legacy, xv, w4)}
    jp = _jax_cells(spec, params,
                    QuantConfig(ptf=False, lis=False, quant_method="minmax"),
                    calib, xv, [w8, w4])
    out["my_legacy"] = {"w8": jp[0], "w4": jp[1]}

    # ---- A4 (collapse regime; BIT_TYPE_A shimmed post-construction) ----
    from models import BIT_TYPE_DICT as RBITS

    a4cfg = Config(ptf=True, lis=True, quant_method="minmax")
    a4cfg.BIT_TYPE_A = RBITS["int4"]
    a4 = _ref_model(a4cfg)
    a4.load_state_dict(model.state_dict(), strict=False)
    _calibrate_ref(a4, calib)
    out["ref_a4"] = {"w8": _torch_preds(a4, xv, w8),
                     "w4": _torch_preds(a4, xv, w4)}
    jp = _jax_cells(spec, params,
                    QuantConfig(ptf=True, lis=True, quant_method="minmax",
                                bit_a=JBITS["int4"]),
                    calib, xv, [w8, w4])
    out["my_a4"] = {"w8": jp[0], "w4": jp[1]}
    return out


@pytest.fixture(scope="module")
def mode2_cells(trained):
    """Mode-2 (generated-data) calibration accuracy cell (VERDICT r4 item
    6): synthesize a calibration batch from the trained FP prior with
    analysis/datagen.generate_data — the PSAQ-ViT pipeline the reference's
    ``--mode 2`` runs (/root/reference/generate_data.py:33-160,
    model_utility.py:128-176) — feed the SAME images to both frameworks'
    calibration, and measure W8/W4 top-1.  Cross-framework RNG/autodiff
    streams can't coincide over 2x60 Adam steps, so the generator runs
    once (ours, prior = the shared trained weights) and its images are
    shared; step-level generator-semantics parity is pinned separately
    (tests/test_analysis.py attention-entropy/KDE/TV cells).  This closes
    the one calibration mode that had no end-to-end accuracy evidence."""
    from diffvit_tpu.analysis.datagen import generate_data
    from diffvit_tpu.config import QuantConfig

    model, spec, params, xv, yv, _ = trained
    gen = np.asarray(generate_data(
        params, spec, batch_size=8, seed=5, iters_per_epoch=60),
        np.float32)
    assert gen.shape == (8, 3, IMG, IMG)

    w8, w4 = [8] * SLOTS, [4] * SLOTS
    # reference: fresh model, trained weights, calibrate on the generated
    # batch (mode-2 composition: model_utility.calibrate_model feeds the
    # generated loader straight into the same calibrate loop)
    m2 = _ref_model(__import__("config").Config(
        ptf=True, lis=True, quant_method="minmax"))
    m2.load_state_dict(model.state_dict(), strict=False)
    _calibrate_ref(m2, gen)
    ref = {"w8": _torch_preds(m2, xv, w8), "w4": _torch_preds(m2, xv, w4)}
    jp = _jax_cells(spec, params,
                    QuantConfig(ptf=True, lis=True, quant_method="minmax"),
                    gen, xv, [w8, w4])
    return {"yv": yv, "ref": ref, "my": {"w8": jp[0], "w4": jp[1]}}


def test_mode2_generated_calibration_accuracy_tracks(mode2_cells, cells):
    """W8/W4 top-1 after mode-2 (generated-image) calibration agrees
    between frameworks within one val image, and the generated batch is a
    USABLE calibration set (W8 lands within a few points of the
    real-image-calibrated W8 — PSAQ's claim, scaled to the anchor task)."""
    yv = mode2_cells["yv"]
    for bits in ("w8", "w4"):
        r = _acc(mode2_cells["ref"][bits], yv)
        m = _acc(mode2_cells["my"][bits], yv)
        assert abs(r - m) <= TOL, (bits, r, m)
    m2_w8 = _acc(mode2_cells["ref"]["w8"], yv)
    real_w8 = _acc(cells["ref_main"]["w8"], yv)
    fp = _acc(cells["ref_fp_preds"], yv)
    assert m2_w8 >= 30.0, m2_w8            # not collapsed
    assert abs(m2_w8 - real_w8) <= 15.0, (m2_w8, real_w8)
    print(f"\nmode-2 W8 ref/my: {m2_w8:.3f} / "
          f"{_acc(mode2_cells['my']['w8'], yv):.3f} "
          f"(real-calib W8 {real_w8:.3f}, FP {fp:.3f})")
    print(f"mode-2 W4 ref/my: {_acc(mode2_cells['ref']['w4'], yv):.3f} / "
          f"{_acc(mode2_cells['my']['w4'], yv):.3f}")


def test_fp_top1_identical(cells):
    """Identical weights -> identical float preds, image for image."""
    np.testing.assert_array_equal(cells["my_fp_preds"],
                                  cells["ref_fp_preds"])


def test_quant_accuracy_deltas_track(cells):
    """FP/W8/W4 top-1 across all three configs agree within one val image
    per cell (measured: exactly), so the quantization DELTAS track within
    two images; the main config's drop is non-trivial (>=1 point), i.e.
    the cells actually exercise accuracy damage, not a saturated task."""
    yv = cells["yv"]
    fp = _acc(cells["ref_fp_preds"], yv)
    table = []
    for config in ("main", "legacy", "a4"):
        for bits in ("w8", "w4"):
            r = _acc(cells[f"ref_{config}"][bits], yv)
            m = _acc(cells[f"my_{config}"][bits], yv)
            table.append((config, bits, r, m))
            assert abs(r - m) <= TOL, (config, bits, r, m)
    # informative-cell guards (values are computed, not golden: training
    # runs fresh; these only assert the regimes stay distinguishable)
    ref_main_w8 = _acc(cells["ref_main"]["w8"], yv)
    ref_a4_w4 = _acc(cells["ref_a4"]["w4"], yv)
    assert fp >= 55.0, fp                     # training succeeded
    assert fp - ref_main_w8 >= 1.0, (fp, ref_main_w8)  # real damage
    assert ref_a4_w4 <= fp - 20.0             # the collapse regime collapses
    print("\nFP ref/my: %.3f / %.3f" % (fp, _acc(cells["my_fp_preds"], yv)))
    for config, bits, r, m in table:
        print(f"{config:7s} {bits}: ref {r:7.3f}  rebuild {m:7.3f}")


def test_restore_sweep_same_ordering(cells):
    """The 18-slot single-restore sweep: per-slot top-1 within one image
    (measured: exact), and for any two slots the reference separates by
    MORE than the tolerance, the rebuild orders them identically."""
    yv = cells["yv"]
    ref = np.array([_acc(p, yv) for p in cells["ref_main"]["restore"]])
    my = np.array([_acc(p, yv) for p in cells["my_main"]["restore"]])
    np.testing.assert_allclose(my, ref, atol=TOL)
    assert len(np.unique(ref)) >= 2, ref  # the sweep differentiates slots
    clear_pairs = 0
    for i in range(SLOTS):
        for j in range(i + 1, SLOTS):
            if abs(ref[i] - ref[j]) > TOL:
                clear_pairs += 1
                assert np.sign(my[i] - my[j]) == np.sign(ref[i] - ref[j]), (
                    i, j, ref[i], ref[j], my[i], my[j])
    assert clear_pairs > 0, ref
    print("\nrestore sweep ref:", [f"{a:.2f}" for a in ref])
    print("restore sweep my: ", [f"{a:.2f}" for a in my])
