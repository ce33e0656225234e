"""Prototype for tests/parity/test_swin_trained_anchor.py (VERDICT r4 item 4).

Times/validates each stage on CPU before committing the test: shimmed
upstream Swin at anchor geometry trains, weights convert, FP preds match,
W8/W4 cells agree, restore sweep orders identically.

Run: PYTHONPATH=/root/.axon_site python scripts/proto_swin_anchor.py
(backend forced to CPU in-process — the JAX_PLATFORMS env var initializes
the axon backend at import and stalls on a busy/broken tunnel)
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

os.environ.pop("JAX_PLATFORMS", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

N_CLASSES, N_VAL, BS = 8, 256, 64
IMG, STEPS, ALPHA = 56, 200, 0.5


def install_shims():
    import models.layers_quant as lq
    from models.ptq.layers import QIntLayerNorm

    orig_mlp = lq.Mlp.forward
    orig_pe = lq.PatchEmbed.forward
    orig_ln = QIntLayerNorm.forward

    def mlp_fwd(self, x, FLOPs=None, global_distance=None,
                ffn_bit_config=None, **kw):
        kw.setdefault("smoothquant", False)
        return orig_mlp(self, x, FLOPs if FLOPs is not None else [],
                        global_distance if global_distance is not None else [],
                        ffn_bit_config, **kw)

    def pe_fwd(self, x, FLOPs=None, bit_config=None):
        return orig_pe(self, x, FLOPs if FLOPs is not None else [], bit_config)

    def ln_fwd(self, x, in_quantizer=None, out_quantizer=None,
               out_quantizer_scale=None, in_scale_expand=1):
        if isinstance(out_quantizer_scale, int):
            in_scale_expand = out_quantizer_scale
            out_quantizer_scale = None
        return orig_ln(self, x, in_quantizer, out_quantizer,
                       out_quantizer_scale, in_scale_expand)

    lq.Mlp.forward = mlp_fwd
    lq.PatchEmbed.forward = pe_fwd
    QIntLayerNorm.forward = ln_fwd


def draw(r, n):
    rng0 = np.random.default_rng(0)
    protos = rng0.normal(0, 1, (N_CLASSES, 3, IMG, IMG)).astype(np.float32)
    a = r.integers(0, N_CLASSES, n)
    b = (a + r.integers(1, N_CLASSES, n)) % N_CLASSES
    w = r.uniform(0.42, 0.58, n).astype(np.float32)[:, None, None, None]
    y = np.where(w[:, 0, 0, 0] > 0.5, a, b).astype(np.int64)
    x = (ALPHA * (w * protos[a] + (1 - w) * protos[b])
         + r.normal(0, 1, (n, 3, IMG, IMG))).astype(np.float32)
    return x, y


def torch_preds(model, x, bs=BS):
    outs = []
    with torch.no_grad():
        for i in range(0, len(x), bs):
            out = model(torch.from_numpy(x[i:i + bs]))
            logits = out[0] if isinstance(out, tuple) else out
            outs.append(logits.argmax(1).numpy())
    return np.concatenate(outs)


def acc(p, y):
    return 100.0 * (p == y).mean()


def main():
    install_shims()
    from config import Config
    from models.ptq.layers import QIntLayerNorm
    from models.swin_quant import SwinTransformer

    torch.manual_seed(0)
    t0 = time.time()
    model = SwinTransformer(
        img_size=IMG, patch_size=4, embed_dim=24, depths=(2, 2),
        num_heads=(2, 4), window_size=7, num_classes=N_CLASSES,
        drop_path_rate=0.0, norm_layer=QIntLayerNorm, input_quant=True,
        cfg=Config(ptf=True, lis=True, quant_method="minmax"))
    print(f"build: {time.time()-t0:.1f}s", flush=True)

    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    lossf = torch.nn.CrossEntropyLoss()
    g = np.random.default_rng(3)
    model.train()
    torch.manual_seed(1)
    t0 = time.time()
    for s in range(STEPS):
        xb, yb = draw(g, BS)
        out = model(torch.from_numpy(xb))
        logits = out[0] if isinstance(out, tuple) else out
        loss = lossf(logits, torch.from_numpy(yb))
        opt.zero_grad(); loss.backward(); opt.step()
        if s % 50 == 0:
            print(f"step {s}: loss {loss.item():.3f} "
                  f"[{time.time()-t0:.0f}s]", flush=True)
    model.eval()
    print(f"train: {time.time()-t0:.1f}s", flush=True)

    xv, yv = draw(np.random.default_rng(2), N_VAL)
    calib, _ = draw(np.random.default_rng(7), 1)

    # FP preds both sides
    ref_fp = torch_preds(model, xv)
    print("ref FP acc:", acc(ref_fp, yv), flush=True)

    import jax
    import jax.numpy as jnp
    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import swin
    from diffvit_tpu.models.swin import convert_swin_torch_state_dict

    spec = swin.SwinSpec("anchor_swin", embed_dim=24, depths=(2, 2),
                         num_heads=(2, 4), img_size=IMG,
                         num_classes=N_CLASSES)
    assert swin.num_bit_slots(spec) == 19
    params = convert_swin_torch_state_dict(model.state_dict(), spec)
    ffp = jax.jit(lambda x: swin.forward_fp(params, spec, x))
    my_fp = np.concatenate([
        np.asarray(ffp(jnp.asarray(xv[i:i + BS]))).argmax(1)
        for i in range(0, len(xv), BS)])
    print("my FP acc:", acc(my_fp, yv),
          "identical:", (my_fp == ref_fp).all(), flush=True)

    # zero-bias the reductions (observer crash workaround), calibrate
    t0 = time.time()
    for layer in model.layers:
        if layer.downsample is not None:
            red = layer.downsample.reduction
            red.bias = torch.nn.Parameter(torch.zeros(red.out_features))
    model.model_open_calibrate()
    with torch.no_grad():
        model.model_open_last_calibrate()
        model(torch.from_numpy(calib))
    model.model_close_calibrate()
    model.model_quant()
    print(f"ref calib: {time.time()-t0:.1f}s", flush=True)

    from models.ptq import BIT_TYPE_DICT as RBITS
    from models.ptq.layers import QConv2d, QLinear

    def slot_modules(m):
        mods = [m.patch_embed.proj]
        for layer in m.layers:
            for blk in layer.blocks:
                mods += [blk.attn.qkv, blk.attn.proj,
                         blk.mlp.fc1, blk.mlp.fc2]
            if layer.downsample is not None:
                mods.append(layer.downsample.reduction)
        mods.append(m.head)
        return mods

    mods = slot_modules(model)
    assert len(mods) == 19
    assert all(isinstance(m, (QLinear, QConv2d)) for m in mods)

    def set_bits(bits):
        for m, b in zip(mods, bits):
            m.quantizer.bit_type = RBITS[f"int{b}"]
            m.observer.bit_type = RBITS[f"int{b}"]

    t0 = time.time()
    set_bits([8] * 19)
    ref_w8 = torch_preds(model, xv)
    set_bits([4] * 19)
    ref_w4 = torch_preds(model, xv)
    ref_restore = []
    for r in range(19):
        bits = [4] * 19
        bits[r] = 8
        set_bits(bits)
        ref_restore.append(torch_preds(model, xv))
    set_bits([8] * 19)
    print(f"ref quant evals: {time.time()-t0:.1f}s", flush=True)
    print("ref W8/W4:", acc(ref_w8, yv), acc(ref_w4, yv), flush=True)

    # our side
    t0 = time.time()
    cfg = QuantConfig(ptf=True, lis=True, quant_method="minmax")
    qp, _ = swin.calibrate(params, spec, cfg, jnp.asarray(calib))
    print(f"my calib: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    fqb = jax.jit(jax.vmap(
        lambda b, x: swin.forward_q_bits(params, qp, spec, cfg, x, b),
        in_axes=(0, None)))
    bit_mat = [np.full(19, 8), np.full(19, 4)]
    for r in range(19):
        bits = np.full(19, 4)
        bits[r] = 8
        bit_mat.append(bits)
    bit_mat = jnp.asarray(np.stack(bit_mat).astype(np.int32))
    preds = []
    for i in range(0, len(xv), BS):
        lg = np.asarray(fqb(bit_mat, jnp.asarray(xv[i:i + BS])))
        preds.append(lg.argmax(-1))
    preds = np.concatenate(preds, axis=1)
    print(f"my quant evals: {time.time()-t0:.1f}s", flush=True)
    my_w8, my_w4, my_restore = preds[0], preds[1], preds[2:]
    print("my W8/W4:", acc(my_w8, yv), acc(my_w4, yv), flush=True)
    print("restore ref:", [f"{acc(p, yv):.2f}" for p in ref_restore],
          flush=True)
    print("restore my: ", [f"{acc(p, yv):.2f}" for p in my_restore],
          flush=True)
    print("W8 agree:", (my_w8 == ref_w8).mean(),
          "W4 agree:", (my_w4 == ref_w4).mean(), flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
