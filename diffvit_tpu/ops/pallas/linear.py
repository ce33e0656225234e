"""Generic fused integer linear kernel (Pallas/Mosaic, TPU).

The XLA path runs int8 linears as exact-in-bf16 dots (~114 TFLOP/s MXU
peak; XLA's own int8 dot lowering is ~10 TOP/s on this backend), and then
pays separate HBM passes for the f32 output, the scale/bias epilogue and
the fake-quant/requant fence.  This kernel runs the dot in native int8
(int8 x int8 -> int32, ~228 TOP/s Mosaic peak — 2x bf16) and folds the
whole epilogue (mult/bias, then optional quantization to the consumer's
grid) into the same pass, so the (R, N) f32 stream never touches HBM.

Status: measured ALTERNATIVE, not wired into the default path.  Routing
the Swin qkv/proj/downsample linears through it at swin_tiny int8 b128
was SLOWER than XLA's dot + fused epilogue both with native int8 dots
(56.5 -> 69.9 ms/step) and with bf16 dots (70.9 ms): XLA output-fuses the
epilogue into its matmul already, Mosaic int8 matmuls only beat bf16 with
K-packing >= 256 (Swin K's are 96..768), and the kernel's int8 stores of
partial lane tiles (N=96/288) relayout badly.  Kept for shapes where a
custom epilogue is needed (e.g. a consumer grid XLA cannot fuse) — its
numerics are exact and tested (tests/test_fused_linear.py).

Reference semantics: QLinear/QConv2d forward + the following QAct
(/root/reference/models/ptq/layers.py:205-262) on the integer path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _linear_kernel(x_ref, w_ref, v_ref, out_ref, *, sub, n_sub, mode,
                   bf16_dot):
    # x_ref: (M, K) int8 row block; w_ref: (K, N) int8
    # v_ref: (4, N) f32 — [mult, bias, out_scale, 1/out_scale]
    # out_ref: (M, N) int8 codes (mode="codes") or f32 (mode "fq"/"raw")
    # bf16_dot: run the dot in bf16 (exact while K*128*wbound < 2^24 —
    # caller checks); measured FASTER than the native int8 dot at the
    # Swin K's (96..768): int8 MXU rate only wins with K-packing >= 256
    mult = v_ref[0][None, :]
    bias = v_ref[1][None, :]
    out_scale = v_ref[2][None, :]
    inv_out = v_ref[3][None, :]

    for i in range(n_sub):
        sl = pl.ds(i * sub, sub)
        if bf16_dot:
            acc = jax.lax.dot_general(
                x_ref[sl, :].astype(jnp.bfloat16),
                w_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc = jax.lax.dot_general(
                x_ref[sl, :], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        y = acc.astype(jnp.float32) * mult + bias
        if mode == "raw":
            out_ref[sl, :] = y
        else:
            codes = jnp.clip(jnp.round(y * inv_out), -128.0, 127.0)
            if mode == "codes":
                out_ref[sl, :] = codes.astype(jnp.int8)
            else:  # "fq"
                out_ref[sl, :] = codes * out_scale


def fused_int_linear(x_i8, w_int, mult, bias, *, out_scale=None,
                     emit_codes=False, block_rows=512, sub=256,
                     bf16_dot=True, interpret=False):
    """(R, K) int8 @ (K, N) int8 -> epilogue, one kernel.

    mult/bias: (N,) or scalar f32 — y = acc*mult + bias.
    out_scale None: return y (R, N) f32.
    out_scale set: quantize to that grid — int8 codes with
    ``emit_codes=True``, else fake-quant f32 (codes * out_scale).
    R must be a multiple of block_rows (caller pads; int8 zero rows are
    exact) and block_rows a multiple of sub."""
    r, k = x_i8.shape
    n = w_int.shape[1]
    assert r % block_rows == 0 and block_rows % sub == 0
    if out_scale is None:
        mode = "raw"
        out_b = jnp.ones((n,), jnp.float32)
    else:
        mode = "codes" if emit_codes else "fq"
        out_b = jnp.broadcast_to(jnp.asarray(out_scale, jnp.float32), (n,))
    v = jnp.stack([jnp.broadcast_to(jnp.asarray(mult, jnp.float32), (n,)),
                   jnp.broadcast_to(jnp.asarray(bias, jnp.float32), (n,)),
                   out_b, 1.0 / out_b]).astype(jnp.float32)

    kernel = functools.partial(_linear_kernel, sub=sub,
                               n_sub=block_rows // sub, mode=mode,
                               bf16_dot=bf16_dot)
    return pl.pallas_call(
        kernel,
        grid=(r // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (r, n), jnp.int8 if mode == "codes" else jnp.float32),
        interpret=interpret,
    )(x_i8, w_int, v)
