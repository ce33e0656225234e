"""Bit-exact parity of the quantization core vs the actual reference code.

Each test runs the reference's torch implementation (CPU, .cuda() no-op'd)
and the JAX rebuild on identical inputs and compares outputs."""
import numpy as np
import pytest
import torch

from diffvit_tpu.ops.bit_types import BIT_TYPE_DICT as J_BITS
from diffvit_tpu.ops import quant as jquant
from diffvit_tpu.ops.int_layernorm import int_layernorm
from diffvit_tpu.ops.lis import log_int_softmax, int_softmax
from diffvit_tpu.calib import observers as jobs

pytestmark = [pytest.mark.usefixtures("reference_available"),
              pytest.mark.quick]


def _ref_bits():
    from models.ptq.bit_type import BIT_TYPE_DICT
    return BIT_TYPE_DICT


def test_bit_type_bounds():
    ref = _ref_bits()
    for name, jbt in J_BITS.items():
        assert jbt.upper_bound == ref[name].upper_bound
        assert jbt.lower_bound == ref[name].lower_bound
        assert jbt.range == ref[name].range


def test_round_ln_parity(rng):
    x = np.abs(rng.normal(size=(64,))).astype(np.float32) + 1e-3
    # reference round_ln lives nested inside the observer; replicate via the
    # exact formula it computes (minmax.py:65-73) in torch
    tx = torch.tensor(x)
    y = torch.floor(torch.log(tx) / torch.log(torch.tensor([2.0])))
    ref = (torch.gt(tx - 2**y, 2 ** (y + 1) - tx) + y).numpy()
    mine = np.asarray(jquant.round_ln(x))
    np.testing.assert_allclose(mine, ref)


@pytest.mark.parametrize("bit,channel_wise", [
    ("int4", True), ("int8", False), ("uint3", True), ("uint4", True),
])
def test_minmax_weight_observer_parity(rng, bit, channel_wise):
    from models.ptq.observer.minmax import MinmaxObserver

    ref_bits = _ref_bits()
    w = rng.normal(size=(12, 20)).astype(np.float32) * 0.1
    x = rng.normal(size=(2, 7, 20)).astype(np.float32)
    bias = rng.normal(size=(12,)).astype(np.float32)

    # The reference builds weight observers with the signed BIT_TYPE_W and
    # mutates bit_type during the sweep without updating `symmetric`
    # (layers.py:156) — emulate exactly.
    obs = MinmaxObserver("linear_weight", ref_bits["int4"],
                         "channel_wise" if channel_wise else "layer_wise")
    obs.bit_type = ref_bits[bit]
    obs.update(torch.tensor(w))
    ref_scale, ref_zp = obs.get_quantization_params(
        torch.tensor(x), others=[torch.tensor(bias)])

    scale, zp = jobs.minmax_weight_qparams(w, x, J_BITS[bit], channel_wise)
    np.testing.assert_allclose(np.asarray(scale), ref_scale.numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(zp),
                               ref_zp.numpy().astype(np.float32))


def test_minmax_act_observer_parity(rng):
    from models.ptq.observer.minmax import MinmaxObserver

    ref_bits = _ref_bits()
    x = rng.normal(size=(2, 7, 16)).astype(np.float32) * 3.0
    obs = MinmaxObserver("activation", ref_bits["int8"], "layer_wise")
    obs.update(torch.tensor(x))
    ref_scale, ref_zp = obs.get_quantization_params(torch.tensor(x))

    scale, zp = jobs.minmax_act_qparams(x, J_BITS["int8"])
    np.testing.assert_allclose(np.asarray(scale), ref_scale.numpy(),
                               rtol=1e-6)


def test_ptf_observer_parity(rng):
    from models.ptq.observer.ptf import PtfObserver

    ref_bits = _ref_bits()
    x = rng.normal(size=(2, 5, 8)).astype(np.float32)
    x[..., 3] *= 10  # force distinct per-channel factors
    x[..., 6] *= 0.1
    obs = PtfObserver("activation", ref_bits["int8"], "channel_wise")
    obs.update(torch.tensor(x))
    ref_scale, ref_zp = obs.get_quantization_params(torch.tensor(x))

    scale, zp = jobs.ptf_act_qparams(x, J_BITS["int8"])
    np.testing.assert_allclose(np.asarray(scale), ref_scale.numpy(),
                               rtol=1e-6)


def test_ema_observer_parity(rng):
    from models.ptq.observer.ema import EmaObserver

    ref_bits = _ref_bits()
    x = rng.normal(size=(3, 9, 12)).astype(np.float32)
    obs = EmaObserver("activation", ref_bits["int8"], "layer_wise")
    obs.update(torch.tensor(x))
    ref_scale, _ = obs.get_quantization_params()
    scale, _ = jobs.ema_act_qparams(x, J_BITS["int8"])
    np.testing.assert_allclose(np.asarray(scale), ref_scale.numpy(), rtol=1e-6)


def test_omse_observer_parity(rng):
    from models.ptq.observer.omse import OmseObserver

    ref_bits = _ref_bits()
    x = rng.normal(size=(2, 6, 10)).astype(np.float32)
    obs = OmseObserver("activation", ref_bits["int8"], "layer_wise")
    obs.update(torch.tensor(x))
    ref_scale, ref_zp = obs.get_quantization_params(torch.tensor(x))
    scale, zp = jobs.omse_act_qparams(x, J_BITS["int8"])
    np.testing.assert_allclose(np.asarray(scale), ref_scale.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(zp), ref_zp.numpy(), rtol=1e-5)


def test_percentile_observer_parity(rng):
    from models.ptq.observer.percentile import PercentileObserver

    ref_bits = _ref_bits()
    x = rng.normal(size=(4, 11, 13)).astype(np.float32)
    obs = PercentileObserver("activation", ref_bits["int8"], "layer_wise")
    obs.update(torch.tensor(x))
    ref_scale, _ = obs.get_quantization_params()
    scale, _ = jobs.percentile_act_qparams(x, J_BITS["int8"])
    np.testing.assert_allclose(np.asarray(scale), ref_scale.numpy(), rtol=1e-4)


def test_uniform_fake_quant_parity(rng):
    """quant→dequant round trip vs UniformQuantizer semantics."""
    x = rng.normal(size=(5, 8)).astype(np.float32)
    scale, zp = np.float32(0.03), np.float32(0.0)
    bt = J_BITS["int8"]
    tq = torch.clamp(torch.round(torch.tensor(x) / scale + zp),
                     bt.lower_bound, bt.upper_bound)
    ref = ((tq - zp) * scale).numpy()
    mine = np.asarray(jquant.fake_quant(x, scale, zp, bt))
    np.testing.assert_allclose(mine, ref)


def test_int_layernorm_parity(rng):
    from models.ptq.layers import QIntLayerNorm

    c = 16
    x_raw = rng.normal(size=(2, 5, c)).astype(np.float32)
    in_scale = (2.0 ** rng.integers(-8, -4, size=c)).astype(np.float32)
    # input arrives fake-quantized on the in_scale grid, like a PTF QAct output
    x = np.round(x_raw / in_scale) * in_scale
    out_scale = np.float32(2.0**-6)
    ln = QIntLayerNorm(c)
    ln.mode = "int"
    with torch.no_grad():
        ln.weight.copy_(torch.tensor(rng.normal(size=c).astype(np.float32)))
        ln.bias.copy_(torch.tensor(rng.normal(size=c).astype(np.float32)))

    class Q:
        def __init__(self, s):
            self.scale = torch.tensor(s)

    ref = ln(torch.tensor(x), Q(in_scale), Q(out_scale)).detach().numpy()
    mine = np.asarray(int_layernorm(
        x, ln.weight.detach().numpy(), ln.bias.detach().numpy(),
        in_scale, out_scale))
    np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-7)


def test_int_layernorm_channel_scale_parity(rng):
    """out_quantizer_scale (SmoothQuant channel scale) path, layers.py:264-267."""
    from models.ptq.layers import QIntLayerNorm

    c = 8
    in_scale = (2.0 ** rng.integers(-8, -4, size=c)).astype(np.float32)
    x = np.round(rng.normal(size=(2, 3, c)).astype(np.float32) / in_scale) * in_scale
    out_scale = np.float32(2.0**-5)
    ch = (2.0 ** rng.integers(-2, 3, size=c)).astype(np.float32)
    ln = QIntLayerNorm(c)
    ln.mode = "int"

    class Q:
        def __init__(self, s):
            self.scale = torch.tensor(s)

    ref = ln(torch.tensor(x), Q(in_scale), Q(out_scale),
             torch.tensor(ch)).detach().numpy()
    mine = np.asarray(int_layernorm(
        x, ln.weight.detach().numpy(), ln.bias.detach().numpy(),
        in_scale, out_scale, out_scale_channel=ch))
    np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-7)


def test_log_int_softmax_parity(rng):
    from models.ptq.layers import QIntSoftmax

    ref_bits = _ref_bits()
    scale = np.float32(0.05)
    a = rng.normal(size=(2, 3, 7, 7)).astype(np.float32) * 4
    a = (np.round(a / scale) * scale).astype(np.float32)

    sm = QIntSoftmax(log_i_softmax=True, bit_type=ref_bits["uint4"])
    ref = sm(torch.tensor(a), torch.tensor(scale)).numpy()
    mine = np.asarray(log_int_softmax(a, scale, J_BITS["uint4"]))
    np.testing.assert_allclose(mine, ref, rtol=1e-6)


def test_int_softmax_intermediate_parity(rng):
    from models.ptq.layers import QIntSoftmax

    scale = np.float32(0.08)
    a = rng.normal(size=(2, 5, 5)).astype(np.float32) * 3
    a = (np.round(a / scale) * scale).astype(np.float32)
    ref_exp, ref_sum = QIntSoftmax.int_softmax(torch.tensor(a),
                                               torch.tensor(scale))
    exp, s = int_softmax(a, scale)
    np.testing.assert_allclose(np.asarray(exp), ref_exp.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s), ref_sum.numpy(), rtol=1e-6)


def test_log2_quantizer_parity(rng):
    from models.ptq.quantizer.log2 import Log2Quantizer

    ref_bits = _ref_bits()
    x = np.abs(rng.normal(size=(3, 9)).astype(np.float32)) + 1e-4
    x = x / x.sum(-1, keepdims=True)  # softmax-like
    q = Log2Quantizer(ref_bits["uint4"], None, "activation")
    ref = q.dequantize(q.quant(torch.tensor(x))).numpy()

    codes, mask = jquant.log2_quant(x, J_BITS["uint4"])
    mine = np.asarray(jquant.log2_dequant(codes, mask))
    np.testing.assert_allclose(mine, ref, rtol=1e-6)


def test_minmax_attn_replay_observer_parity(rng):
    """The observer's attention-replay scoring path (get_attn,
    minmax.py:77-117): candidates scored through a qkv->softmax->v replay."""
    from models.ptq.observer.minmax import MinmaxObserver

    from diffvit_tpu.calib.observers import make_attn_replay

    ref_bits = _ref_bits()
    heads, dim, n = 2, 8, 5
    scale = (dim // heads) ** -0.5
    x = (rng.normal(size=(2, n, 3 * dim)) * 3).astype(np.float32)

    obs = MinmaxObserver("activation", ref_bits["int8"], "layer_wise")
    obs.update(torch.tensor(x))
    ref_scale, _ = obs.get_quantization_params(
        torch.tensor(x), attn=True, attn_para=[heads, dim, scale])

    replay = make_attn_replay(heads, dim, scale)
    mine, _ = jobs.minmax_act_qparams(x, J_BITS["int8"], attn_replay=replay)
    np.testing.assert_allclose(np.asarray(mine), ref_scale.numpy(), rtol=1e-6)


def test_pos_embed_resize_matches_torch_bicubic(rng):
    """resize_pos_embed vs torch F.interpolate(bicubic, align_corners=False)
    — the reference's npz pos-embed resize (models/utils.py:85-109)."""
    import torch.nn.functional as F

    from diffvit_tpu.models.load import resize_pos_embed

    c = 6
    pos = rng.normal(size=(1, 1 + 14 * 14, c)).astype(np.float32)
    grid = torch.tensor(pos[0, 1:].reshape(1, 14, 14, c).transpose(0, 3, 1, 2))
    ref_grid = F.interpolate(grid, size=(24, 24), mode="bicubic",
                             align_corners=False)
    ref = torch.cat(
        [torch.tensor(pos[:, :1]),
         ref_grid.permute(0, 2, 3, 1).reshape(1, 24 * 24, c)], dim=1).numpy()
    got = resize_pos_embed(pos, 1 + 24 * 24)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
