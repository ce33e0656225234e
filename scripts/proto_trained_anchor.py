"""Prototype for the trained-weights accuracy anchor (VERDICT r3 item 3):
train a depth-4 deit-tiny-geometry model in torch on synthetic data, then
measure FP / W8 / W4 top-1 in BOTH frameworks.  Used to tune the task
difficulty before pinning the parity test."""
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

import types

import numpy as np
import torch

# conftest-style stubs
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
timm = types.ModuleType("timm"); tm = types.ModuleType("timm.models")
tvt = types.ModuleType("timm.models.vision_transformer")
tsw = types.ModuleType("timm.models.swin_transformer")
class _A: pass
tvt.Attention = _A; tsw.WindowAttention = _A
tm.vision_transformer = tvt; tm.swin_transformer = tsw; tm.__path__ = []
timm.models = tm; timm.create_model = lambda *a, **k: None
for n, m in [("timm", timm), ("timm.models", tm),
             ("timm.models.vision_transformer", tvt),
             ("timm.models.swin_transformer", tsw)]:
    sys.modules[n] = m

ALPHA = float(sys.argv[1]) if len(sys.argv) > 1 else 0.35
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 300
N_CLASSES, N_TRAIN, N_VAL, BS = 8, 768, 256, 64


def make_data(seed=0):
    # samples sit NEAR class boundaries: each is a convex mix of two class
    # prototypes with mixing weight w ~ U(0.25, 0.75), labeled by the
    # dominant one — small decision margins, so quantization noise can
    # actually flip predictions (a saturated task shows zero deltas)
    rng = np.random.default_rng(seed)
    protos = rng.normal(0, 1, (N_CLASSES, 3, 64, 64)).astype(np.float32)
    def draw(n, seed2):
        r = np.random.default_rng(seed2)
        a = r.integers(0, N_CLASSES, n)
        b = (a + r.integers(1, N_CLASSES, n)) % N_CLASSES
        w = r.uniform(0.42, 0.58, n).astype(np.float32)[:, None, None, None]
        y = np.where(w[:, 0, 0, 0] > 0.5, a, b)
        x = ALPHA * (w * protos[a] + (1 - w) * protos[b]) \
            + r.normal(0, 1, (n, 3, 64, 64)).astype(np.float32)
        return x.astype(np.float32), y.astype(np.int64)
    return draw(N_TRAIN, 1), draw(N_VAL, 2)


def build_model():
    from functools import partial

    from config import Config
    from models.vit_fquant import VisionTransformer
    from models.ptq import QIntLayerNorm

    torch.manual_seed(0)
    return VisionTransformer(
        img_size=64, patch_size=16, embed_dim=192, depth=4, num_heads=3,
        mlp_ratio=4, qkv_bias=True, num_classes=N_CLASSES,
        norm_layer=partial(QIntLayerNorm, eps=1e-6),
        input_quant=True, cfg=Config(ptf=True, lis=True,
                                     quant_method="minmax"))


def torch_acc(model, x, y, bit_config=None, bs=BS):
    correct = 0
    with torch.no_grad():
        for i in range(0, len(x), bs):
            out = model(torch.from_numpy(x[i:i + bs]), bit_config, False)
            logits = out[0] if isinstance(out, tuple) else out
            correct += (logits.argmax(1).numpy() == y[i:i + bs]).sum()
    return 100.0 * correct / len(x)


def main():
    (xt, yt), (xv, yv) = make_data()
    model = build_model()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    lossf = torch.nn.CrossEntropyLoss()
    t0 = time.time()
    model.train()
    g = np.random.default_rng(3)
    # fresh noise each step (infinite stream): the boundary generalizes
    # instead of overfitting the finite train noise, so quantization
    # noise DEGRADES accuracy as on real data
    rng_protos = np.random.default_rng(0)
    protos = rng_protos.normal(0, 1, (N_CLASSES, 3, 64, 64)).astype(np.float32)
    for step in range(STEPS):
        a = g.integers(0, N_CLASSES, BS)
        b = (a + g.integers(1, N_CLASSES, BS)) % N_CLASSES
        w = g.uniform(0.42, 0.58, BS).astype(np.float32)[:, None, None, None]
        yb = np.where(w[:, 0, 0, 0] > 0.5, a, b)
        xb = (ALPHA * (w * protos[a] + (1 - w) * protos[b])
              + g.normal(0, 1, (BS, 3, 64, 64))).astype(np.float32)
        out = model(torch.from_numpy(xb), None, False)
        logits = out[0] if isinstance(out, tuple) else out
        loss = lossf(logits, torch.from_numpy(yb.astype(np.int64)))
        opt.zero_grad(); loss.backward(); opt.step()
        if step % 50 == 0:
            print(f"step {step} loss {loss.item():.3f} "
                  f"({time.time()-t0:.0f}s)")
    model.eval()
    fp_train = torch_acc(model, xt[:192], yt[:192])
    fp_val = torch_acc(model, xv, yv)
    print(f"ALPHA={ALPHA} STEPS={STEPS}: FP train {fp_train:.2f} "
          f"val {fp_val:.2f} ({time.time()-t0:.0f}s)")

    # calibrate on 32 train images, then W8 / W4
    calib_mode = sys.argv[3] if len(sys.argv) > 3 else "real"
    if calib_mode == "gauss":
        torch.manual_seed(9)
        calib = torch.randn(32, 3, 64, 64)
        xt_calib = calib.numpy()
    else:
        ncal = int(sys.argv[4]) if len(sys.argv) > 4 else 32
        calib = torch.from_numpy(xt[:ncal])
        xt_calib = xt[:ncal]
    model.model_open_calibrate()
    with torch.no_grad():
        model.model_open_last_calibrate()
        model(calib, plot=False)
    model.model_close_calibrate()
    model.model_quant()
    slots = 4 * 4 + 2
    w8 = torch_acc(model, xv, yv, [8] * slots)
    w4 = torch_acc(model, xv, yv, [4] * slots)
    print(f"torch: FP {fp_val:.2f}  W8 {w8:.2f}  W4 {w4:.2f} "
          f"(deltas {fp_val-w8:+.2f} / {fp_val-w4:+.2f})")

    # our side
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import vit
    from diffvit_tpu.models.load import convert_vit_torch_state_dict
    from diffvit_tpu.ops.bit_types import BIT_TYPE_DICT as JBITS

    spec = vit.ViTSpec("anchor_tiny", embed_dim=192, depth=4, num_heads=3,
                       img_size=64, num_classes=N_CLASSES)
    params = convert_vit_torch_state_dict(model.state_dict(), spec)
    cfg = QuantConfig(ptf=True, lis=True, quant_method="minmax")

    def jax_acc(fn):
        correct = 0
        for i in range(0, len(xv), BS):
            logits = np.asarray(fn(jnp.asarray(xv[i:i + BS])))
            correct += (logits.argmax(1) == yv[i:i + BS]).sum()
        return 100.0 * correct / len(xv)

    ffp = jax.jit(lambda x: vit.forward_fp(params, spec, x))
    my_fp = jax_acc(ffp)
    qp, _ = vit.calibrate(params, spec, cfg, jnp.asarray(xt_calib))
    f8 = jax.jit(lambda x: vit.forward_q(params, qp, spec, cfg, x,
                                         (8,) * slots))
    f4 = jax.jit(lambda x: vit.forward_q(params, qp, spec, cfg, x,
                                         (4,) * slots))
    my8, my4 = jax_acc(f8), jax_acc(f4)
    print(f"jax:   FP {my_fp:.2f}  W8 {my8:.2f}  W4 {my4:.2f} "
          f"(deltas {my_fp-my8:+.2f} / {my_fp-my4:+.2f})")

    # ---- legacy config (ptf=lis=False): the lossier path ----
    from config import Config
    from models.vit_fquant import VisionTransformer
    from models.ptq import QIntLayerNorm
    from functools import partial

    legacy = VisionTransformer(
        img_size=64, patch_size=16, embed_dim=192, depth=4, num_heads=3,
        mlp_ratio=4, qkv_bias=True, num_classes=N_CLASSES,
        norm_layer=partial(QIntLayerNorm, eps=1e-6),
        input_quant=True, cfg=Config(ptf=False, lis=False,
                                     quant_method="minmax"))
    missing = legacy.load_state_dict(model.state_dict(), strict=False)
    legacy.eval()
    legacy.model_open_calibrate()
    with torch.no_grad():
        legacy.model_open_last_calibrate()
        legacy(calib, plot=False)
    legacy.model_close_calibrate()
    legacy.model_quant()
    lw8 = torch_acc(legacy, xv, yv, [8] * slots)
    lw4 = torch_acc(legacy, xv, yv, [4] * slots)
    print(f"torch legacy: W8 {lw8:.2f}  W4 {lw4:.2f}")

    lcfg = QuantConfig(ptf=False, lis=False, quant_method="minmax")
    lqp, _ = vit.calibrate(params, spec, lcfg, jnp.asarray(xt_calib))
    lf8 = jax.jit(lambda x: vit.forward_q(params, lqp, spec, lcfg, x,
                                          (8,) * slots))
    lf4 = jax.jit(lambda x: vit.forward_q(params, lqp, spec, lcfg, x,
                                          (4,) * slots))
    print(f"jax legacy:   W8 {jax_acc(lf8):.2f}  W4 {jax_acc(lf4):.2f}")

    # ---- A4 variant: activations at int4 (post-construction shim) ----
    from models import BIT_TYPE_DICT as REF_BITS
    a4cfg = Config(ptf=True, lis=True, quant_method="minmax")
    a4cfg.BIT_TYPE_A = REF_BITS["int4"]
    a4 = VisionTransformer(
        img_size=64, patch_size=16, embed_dim=192, depth=4, num_heads=3,
        mlp_ratio=4, qkv_bias=True, num_classes=N_CLASSES,
        norm_layer=partial(QIntLayerNorm, eps=1e-6),
        input_quant=True, cfg=a4cfg)
    a4.load_state_dict(model.state_dict(), strict=False)
    a4.eval()
    a4.model_open_calibrate()
    with torch.no_grad():
        a4.model_open_last_calibrate()
        a4(calib, plot=False)
    a4.model_close_calibrate()
    a4.model_quant()
    aw8 = torch_acc(a4, xv, yv, [8] * slots)
    aw4 = torch_acc(a4, xv, yv, [4] * slots)
    print(f"torch A4: W8 {aw8:.2f}  W4 {aw4:.2f}")

    acfg = QuantConfig(ptf=True, lis=True, quant_method="minmax",
                       bit_a=JBITS["int4"])
    aqp, _ = vit.calibrate(params, spec, acfg, jnp.asarray(xt_calib))
    af8 = jax.jit(lambda x: vit.forward_q(params, aqp, spec, acfg, x,
                                          (8,) * slots))
    af4 = jax.jit(lambda x: vit.forward_q(params, aqp, spec, acfg, x,
                                          (4,) * slots))
    print(f"jax A4:   W8 {jax_acc(af8):.2f}  W4 {jax_acc(af4):.2f}")

    # ---- restore-sweep spread at A4/W4 both sides ----
    taccs, jaccs = [], []
    for idx in range(slots):
        bc = [4] * slots
        bc[idx] = 8
        taccs.append(torch_acc(model, xv, yv, bc))
    import jax.numpy as jnp2
    from diffvit_tpu.engine import QuantizedViT
    qm = QuantizedViT(spec, cfg, params=params)
    qm.qparams = qp
    bits = []
    for idx in range(slots):
        bc = [4] * slots
        bc[idx] = 8
        bits.append(bc)
    bits = np.asarray(bits, np.int32)
    correct = np.zeros(slots, np.int64)
    for i in range(0, len(xv), BS):
        lg = np.asarray(qm.forward_bits(xv[i:i+BS], bits))
        correct += (lg.argmax(-1) == yv[i:i+BS][None, :]).sum(1)
    jaccs = 100.0 * correct / len(xv)
    print("restore spread torch:", [f"{a:.2f}" for a in taccs])
    print("restore spread jax:  ", [f"{a:.2f}" for a in jaccs])
    import numpy as _np
    print("orderings:", _np.argsort(taccs).tolist(), _np.argsort(jaccs).tolist())
    print(f"total {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
