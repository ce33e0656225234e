"""npz-loading parity: a random AugReg/Flax-layout .npz with vit_base
geometry loaded by BOTH the reference's mapping (models/utils.py:12-197,
driven through upstream vit_base) and ours (models/load.convert_vit_npz),
then compared on the float forward — pinning the conv-kernel flatten, the
per-head q/k/v concat, the Dense transposes, and the pos-embed bicubic
resize path (the fixture ships a 24x24-grid pos table so resize engages on
both sides; VERDICT r2 'broaden the parity matrix')."""
import os

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.usefixtures("reference_available")

DEPTH, C, HEADS, HD = 12, 768, 12, 64


def _make_npz(path, rng, grid=24):
    arr = {}

    def a(key, *shape, scale=0.02):
        arr[key] = (scale * rng.standard_normal(shape)).astype(np.float32)

    a("embedding/kernel", 16, 16, 3, C)
    a("embedding/bias", C)
    a("cls", 1, 1, C)
    a("Transformer/posembed_input/pos_embedding", 1, grid * grid + 1, C)
    arr["Transformer/encoder_norm/scale"] = np.ones(C, np.float32)
    a("Transformer/encoder_norm/bias", C)
    a("head/kernel", C, 1000)
    a("head/bias", 1000)
    for i in range(DEPTH):
        p = f"Transformer/encoderblock_{i}/"
        at = p + "MultiHeadDotProductAttention_1/"
        arr[p + "LayerNorm_0/scale"] = np.ones(C, np.float32)
        a(p + "LayerNorm_0/bias", C)
        arr[p + "LayerNorm_2/scale"] = np.ones(C, np.float32)
        a(p + "LayerNorm_2/bias", C)
        for n in ("query", "key", "value"):
            a(at + n + "/kernel", C, HEADS, HD)
            a(at + n + "/bias", HEADS, HD)
        a(at + "out/kernel", HEADS, HD, C)
        a(at + "out/bias", C)
        a(p + "MlpBlock_3/Dense_0/kernel", C, 4 * C)
        a(p + "MlpBlock_3/Dense_0/bias", 4 * C)
        a(p + "MlpBlock_3/Dense_1/kernel", 4 * C, C)
        a(p + "MlpBlock_3/Dense_1/bias", C)
    np.savez(path, **arr)
    return path


def test_npz_vit_base_float_forward_parity(tmp_path):
    import jax.numpy as jnp

    from config import Config
    from models import vit_base_patch16_224
    from models.utils import load_weights_from_npz

    from diffvit_tpu.models import vit
    from diffvit_tpu.models.load import load_vit_npz

    rng = np.random.default_rng(0)
    npz_path = _make_npz(str(tmp_path / "fixture.npz"), rng)

    # reference side: place the fixture where _download_cached_file
    # resolves it (hub cache, matching basename) so no network is touched
    hub_ckpts = os.path.join(torch.hub.get_dir(), "checkpoints")
    os.makedirs(hub_ckpts, exist_ok=True)
    cached = os.path.join(hub_ckpts, "npz_parity_fixture.npz")
    import shutil

    shutil.copy(npz_path, cached)

    torch.manual_seed(0)
    model = vit_base_patch16_224(pretrained=False,
                                 cfg=Config(True, True, "minmax"))
    model.eval()
    with torch.no_grad():
        load_weights_from_npz(model, "npz_parity_fixture.npz",
                              check_hash=False)

    spec = vit.VIT_SPECS["vit_base"]
    params = load_vit_npz(npz_path, spec)

    # weight-level parity first (sharp): qkv concat + out flatten + patch conv
    np.testing.assert_allclose(
        np.asarray(params["blocks"][3]["qkv"]["w"]),
        model.blocks[3].attn.qkv.weight.detach().numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["blocks"][3]["proj"]["w"]),
        model.blocks[3].attn.proj.weight.detach().numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["patch_embed"]["w"]),
        model.patch_embed.proj.weight.detach().numpy().reshape(C, -1),
        rtol=1e-6)
    # pos-embed resize parity (24x24 -> 14x14 bicubic, cls row preserved)
    np.testing.assert_allclose(
        np.asarray(params["pos_embed"]),
        model.pos_embed.detach().numpy(), rtol=1e-4, atol=1e-5)

    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = model(x)
        if isinstance(ref, tuple):
            ref = ref[0]
        ref = ref.numpy()
    got = np.asarray(vit.forward_fp(params, spec, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, ref, atol=2e-3)
    corr = np.corrcoef(got.reshape(-1), ref.reshape(-1))[0, 1]
    assert corr > 0.9999, corr
