"""Analysis toolkit: CKA math, activation harvesting, PGD, DDV, restore."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.engine import QuantizedViT
from diffvit_tpu.models import vit
from diffvit_tpu.analysis import cka as cka_mod
from diffvit_tpu.analysis.activations import get_activations
from diffvit_tpu.analysis.pgd import AttackPGD
from diffvit_tpu.analysis.ddv import compute_ddv, ddv_similarities
from diffvit_tpu.analysis.restore import (k_layer_combinations,
                                          run_restore_sweep)

TINY = vit.ViTSpec("t", embed_dim=64, depth=2, num_heads=2, num_classes=10)


@pytest.fixture(scope="module")
def model():
    m = QuantizedViT(TINY, QuantConfig(),
                     params=vit.init_params(TINY, jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 224, 224))
    m.calibrate(x)
    return m


def test_cka_identical_models_diag_one(rng):
    acts = [jnp.asarray(rng.normal(size=(8, 16)).astype("float32"))
            for _ in range(3)]
    cka = cka_mod.MinibatchCKA(3)
    cka.update_state(acts)
    r = np.asarray(cka.result())
    np.testing.assert_allclose(np.diag(r), 1.0, rtol=1e-5)
    assert np.all(r <= 1.0 + 1e-5)


def test_adv_cka_result_shape(rng):
    a = [jnp.asarray(rng.normal(size=(8, 16)).astype("float32"))
         for _ in range(3)]
    b = [x + 0.01 for x in a]
    adv = cka_mod.MinibatchAdvCKA(3)
    adv.update_state(a, b, a, b)
    r = np.asarray(adv.result())
    assert r.shape == (3, 3)
    np.testing.assert_allclose(np.diag(r), 1.0, rtol=1e-4)


def test_get_activations_sets(model):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 224, 224))
    fp_acts = get_activations(model, x, bit_config=None, quant=False)
    # module-tap set: 1 + 6/block + 1
    assert len(fp_acts) == 1 + 6 * TINY.depth + 1
    bc = (4,) * vit.num_bit_slots(TINY)
    q_acts = get_activations(model, x, bit_config=bc, quant=True)
    # conv/linear set: 1 + 4/block + 1 (the 50-tap contract at depth 12)
    assert len(q_acts) == 1 + 4 * TINY.depth + 1
    # duplicate rows: attn tap == qkv tap
    np.testing.assert_array_equal(np.asarray(fp_acts[1]),
                                  np.asarray(fp_acts[2]))
    one, info = get_activations(model, x, bit_config=bc, quant=True,
                                layer_indices=3)
    assert len(one) == 1 and info[0]["relative_index"] == 3


def test_pgd_moves_inputs_within_ball(model):
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 224, 224))
    y = jnp.asarray([1, 2])
    atk = AttackPGD(model, epsilon=0.06, step_size=0.01, num_steps=3,
                    quant=False)
    adv = atk.gen_adv_inputs(x, y)
    d = np.abs(np.asarray(adv) - np.asarray(x))
    assert d.max() <= 0.06 + 1e-5
    assert d.max() > 1e-4  # actually moved


def test_profiling_attack_honors_swin_per_slot_bits():
    """Regression: the attack drivers used to truncate a Swin per-slot
    bit_config to bit_config[0] (the always-8 patch slot), so profiling
    inputs were generated against a uniform-8 model instead of the mixed
    one.  The attacked forward (pgd._engine_forward — exactly what
    gen_profiling_adv_inputs/AttackPGD differentiate through) must see
    the mixed weights: its logits must differ from uniform-8's.  (The
    adversarial *inputs* themselves are too weak a discriminator here:
    sign(grad) agrees everywhere at this tiny scale.)"""
    from diffvit_tpu.analysis.pgd import _engine_forward
    from diffvit_tpu.models import swin

    spec = swin.SwinSpec("swin_pgd", embed_dim=32, depths=(1, 1),
                         num_heads=(2, 4), img_size=56, num_classes=10)
    m = QuantizedViT(spec, QuantConfig(),
                     params=swin.init_swin_params(spec,
                                                  jax.random.PRNGKey(0)))
    m.calibrate(jax.random.normal(jax.random.PRNGKey(1), (2, 3, 56, 56)))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 56, 56))
    n = swin.num_bit_slots(spec)
    mixed = tuple(8 if i % 2 == 0 else 4 for i in range(n))
    l_mixed = np.asarray(_engine_forward(m, True, mixed)(x))
    l_uni8 = np.asarray(_engine_forward(m, True, 8)(x))
    assert not np.allclose(l_mixed, l_uni8)
    # and the uniform tuple collapses to the same compiled fn as the int
    np.testing.assert_array_equal(
        np.asarray(_engine_forward(m, True, tuple([8] * n))(x)), l_uni8)


def test_ddv_similarity_self_is_100(model):
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 224, 224))
    adv = x + 0.05
    ddv = compute_ddv(model, x, adv, quant=False)
    sims = ddv_similarities(ddv, ddv, log=lambda *_: None)
    for v in sims.values():
        assert abs(v - 100.0) < 1e-3


def test_restore_sweep(model, tmp_path):
    calls = []

    def fake_validate(bc):
        calls.append(bc)
        return 60.0 + sum(b == 8 for b in bc), 80.0

    out = str(tmp_path / "restore_2_layers.txt")
    res = run_restore_sweep(model, None, [(0, 1), (2, 3)], out_path=out,
                            validate_fn=fake_validate, log=lambda *_: None)
    assert len(res) == 3
    lines = open(out).read().splitlines()
    assert lines[0].startswith("Restore Index: nothing")
    assert "Restore Index: [0, 1]" in lines[1]
    assert calls[1][0] == 8 and calls[1][1] == 8 and calls[1][2] == 4


def test_k_layer_combinations():
    c = k_layer_combinations(2, slots=5)
    assert len(c) == 10


def test_ddv_hessian_smoke(model):
    from diffvit_tpu.analysis.ddv_hessian import DDVHessian

    x = np.random.default_rng(0).standard_normal((2, 3, 224, 224)).astype("float32")
    adv = x + 0.01
    ddvh = DDVHessian(model, model, (x, np.array([0, 1])), adv,
                      layer_indices=2, max_iter=2)
    names, traces = ddvh.trace(param_names=["blocks.0.attn.qkv.weight"])
    assert len(traces) == 1 and np.isfinite(traces[0])


def test_ddv_hessian_param_selection(model):
    """Reference get_params_grad: with a selected layer, probe only params
    up to AND including the first target weight containing the tap's module
    name (pyhessian/utils.py:61-99); unmatched taps (patch conv) keep all."""
    from diffvit_tpu.analysis.ddv_hessian import DDVHessian, params_up_to
    from diffvit_tpu.analysis.hessian import hessian_target_names

    all_names = hessian_target_names(TINY)  # 2*4+1 = 9 targets
    assert params_up_to(all_names, "blocks.0.attn.qkv") == \
        ["blocks.0.attn.qkv.weight"]
    assert params_up_to(all_names, "blocks.1.mlp") == all_names[:7]
    assert params_up_to(all_names, "head") == all_names
    assert params_up_to(all_names, "patch_embed.proj") == all_names  # warn

    x = np.random.default_rng(0).standard_normal(
        (2, 3, 224, 224)).astype("float32")
    adv = x + 0.01
    # tap 2 = blocks.0.attn.qkv -> exactly one probed param
    ddvh = DDVHessian(model, model, (x, np.array([0, 1])), adv,
                      layer_indices=2, max_iter=2)
    assert ddvh.param_names == ["blocks.0.attn.qkv.weight"]
    # tap 10 = blocks.1.mlp -> everything up to blocks.1.mlp.fc1
    ddvh = DDVHessian(model, model, (x, np.array([0, 1])), adv,
                      layer_indices=10, max_iter=2)
    assert ddvh.param_names == all_names[:7]
    # no selection -> all targets
    ddvh = DDVHessian(model, model, (x, np.array([0, 1])), adv, max_iter=2)
    assert ddvh.param_names == all_names


def test_top_eigenvalues_and_density(model):
    from diffvit_tpu.analysis.hessian import (eigenvalue_density,
                                              top_eigenvalues)

    x = np.random.default_rng(0).standard_normal((2, 3, 224, 224)).astype("float32")
    y = np.array([0, 1])
    names = ["blocks.0.attn.qkv.weight"]
    eigs, vecs = top_eigenvalues(model.params, TINY, x, y,
                                 jax.random.PRNGKey(0), top_n=2, max_iter=5,
                                 names=names)
    assert len(eigs) == 2 and all(np.isfinite(e) for e in eigs)
    evals, weights = eigenvalue_density(model.params, TINY, x, y,
                                        jax.random.PRNGKey(0), iters=5,
                                        names=names)
    assert len(evals[0]) >= 1
    assert abs(sum(weights[0]) - 1.0) < 1e-4


def test_modeldiff_blackbox_smoke(model):
    from diffvit_tpu.analysis.modeldiff import gen_profiling_inputs_blackbox

    x = np.random.default_rng(0).standard_normal((3, 3, 224, 224)).astype("float32")

    def f1(a):
        return np.asarray(vit.forward_fp(model.params, TINY, jnp.asarray(a)))

    out = gen_profiling_inputs_blackbox(f1, f1, x, max_iterations=3)
    assert out.shape == x.shape


def test_datagen_smoke():
    from diffvit_tpu.analysis.datagen import generate_data

    spec = vit.ViTSpec("dg", embed_dim=32, depth=1, num_heads=2,
                       num_classes=10)
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    img = generate_data(params, spec, batch_size=2, iters_per_epoch=2,
                        epochs=1)
    assert img.shape == (2, 3, 224, 224)
    assert np.all(np.isfinite(np.asarray(img)))
    # clipped to the ImageNet-normalized range
    assert float(jnp.max(img)) <= (1 - 0.406) / 0.224 + 1e-3


def test_datagen_swin_smoke():
    from diffvit_tpu.analysis.datagen import generate_data
    from diffvit_tpu.models import swin

    spec = swin.SwinSpec("dg_swin", embed_dim=32, depths=(1, 1),
                         num_heads=(2, 4), img_size=56, num_classes=10)
    params = swin.init_swin_params(spec, jax.random.PRNGKey(0))
    img = generate_data(params, spec, batch_size=2, iters_per_epoch=2,
                        epochs=1)
    assert img.shape == (2, 3, 56, 56)
    assert np.all(np.isfinite(np.asarray(img)))


def test_attention_entropy_matches_reference_formula():
    """Our head-averaged-context entropy term vs a torch transcription of
    the reference's hook consumption (generate_data.py:99-111): the hook
    captures matmul2's output (B, H, N, hd); feature.mean(dim=1)[:, 1:, :]
    rows go through pairwise cosine similarity -> KDE -> -entropy."""
    import torch

    from diffvit_tpu.analysis.datagen import attention_entropy

    rng = np.random.default_rng(3)
    b, nh, n, hd = 2, 2, 9, 8
    per_head = rng.standard_normal((b, nh, n, hd)).astype("float32")

    # torch side: straight from the reference loop
    att = torch.from_numpy(per_head)
    attention_p = att.mean(dim=1)[:, 1:, :]
    sims = torch.cosine_similarity(attention_p.unsqueeze(1),
                                   attention_p.unsqueeze(2), dim=3)
    flat = sims.view(b, -1)
    start_p, end_p = sims.min().item(), sims.max().item()
    x_plot = torch.linspace(start_p, end_p, steps=10).repeat(b, 1)
    var = 0.01**2
    coef = 1.0 / np.sqrt(2 * np.pi * var)
    kde = (coef * torch.exp(-((x_plot[:, :, None] - flat[:, None, :]) ** 2)
                            / (2 * var))).mean(dim=-1)
    pdf = kde + 1e-4
    ref = float(-torch.trapezoid(-pdf * torch.log(pdf), x_plot,
                                 dim=-1).mean())

    # our side consumes the merged (B, N, H*hd) tap; (B,H,N,hd) merges by
    # transpose(0,2,1,3).reshape — the exact layout forward_fp taps
    merged = jnp.asarray(per_head.transpose(0, 2, 1, 3).reshape(b, n, -1))
    got = float(attention_entropy(merged, nh, b))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_attention_entropy_swin_window_pooling():
    """Swin hooks see (B*nW, H, n, hd) windows; the reference pools all of
    an image's windows into one KDE row via ``sims.view(batch_size, -1)``
    (generate_data.py:106).  Pin that pooling (batch_size < leading dim)."""
    import torch

    from diffvit_tpu.analysis.datagen import attention_entropy

    rng = np.random.default_rng(7)
    b, nw, nh, n, hd = 2, 4, 2, 9, 4
    per_head = rng.standard_normal((b * nw, nh, n, hd)).astype("float32")

    att = torch.from_numpy(per_head)
    attention_p = att.mean(dim=1)[:, 1:, :]
    sims = torch.cosine_similarity(attention_p.unsqueeze(1),
                                   attention_p.unsqueeze(2), dim=3)
    flat = sims.view(b, -1)
    start_p, end_p = sims.min().item(), sims.max().item()
    x_plot = torch.linspace(start_p, end_p, steps=10).repeat(b, 1)
    var = 0.01**2
    coef = 1.0 / np.sqrt(2 * np.pi * var)
    kde = (coef * torch.exp(-((x_plot[:, :, None] - flat[:, None, :]) ** 2)
                            / (2 * var))).mean(dim=-1)
    pdf = kde + 1e-4
    ref = float(-torch.trapezoid(-pdf * torch.log(pdf), x_plot,
                                 dim=-1).mean())

    merged = jnp.asarray(
        per_head.transpose(0, 2, 1, 3).reshape(b * nw, n, -1))
    got = float(attention_entropy(merged, nh, b))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_plotting_roundtrip(tmp_path):
    import pickle

    from diffvit_tpu.analysis.plotting import (load_and_plot_diagonal,
                                               plot_cka_map)

    cka = np.random.default_rng(0).random((50, 50)).astype("float32")
    d = tmp_path / "myheat"
    d.mkdir()
    with open(d / "myheat_heatmap.pkl", "wb") as f:
        pickle.dump(cka, f)
    out = plot_cka_map("myheat", "plots", str(tmp_path))
    assert out["qkv"].shape == (12, 12)
    diag = load_and_plot_diagonal(str(tmp_path / "plots" / "cka_qkv.pkl"))
    assert diag.shape == (12,)
