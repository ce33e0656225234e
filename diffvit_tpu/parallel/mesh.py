"""Device-mesh parallelism for quantized eval.

The reference is strictly single-process/single-GPU (SURVEY.md §2.7) — its
only "multi-GPU" story is separate shell jobs.  The TPU-native rebuild scales
the eval/search loops over a ``jax.sharding.Mesh`` instead:

* **dp** axis: the validation batch is sharded — embarrassingly parallel.
* **tp** axis: attention/MLP weights are megatron-sharded (qkv/fc1 row-wise,
  proj/fc2 column-wise) so XLA GSPMD inserts the reduce-scatter/all-gather
  collectives over ICI.  At ViT scale tp is not needed for memory, but the
  sharding rules keep every kernel shard_map/GSPMD-compatible and demonstrate
  the full layout story for larger derivatives.
* **sp** axis (optional, megatron sequence-parallel): the (B, N, C) residual
  stream is token-sharded between blocks via a `with_sharding_constraint` on
  the fake-quant forward (`vit.forward_q(act_constraint=...)`); GSPMD
  all-gathers tokens where attention needs full key/value visibility and
  keeps LN/MLP/elementwise work token-partitioned.  Cuts per-device
  activation memory ~sp-fold for long-token derivatives; non-divisible N
  (e.g. 197) is handled by XLA's implicit shard padding.

Quantization parameters (scales) are small and replicated; GSPMD reshards
them on the fly where a matmul needs a sharded operand's scale.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              tp: int | None = None, sp: int | None = None,
              pp: int | None = None, devices=None) -> Mesh:
    """Create a (dp, tp[, sp][, pp]) mesh.  Defaults: use every device,
    all-dp.  The sp/pp axes are only materialized when > 1 (2-axis meshes
    stay the common case and every P() spec that doesn't name them is
    unaffected).  pp is last so neighboring pipeline stages land on
    adjacent devices (stage-to-stage ppermute rides one ICI hop)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    sp_ = 1 if sp is None else sp
    pp_ = 1 if pp is None else pp
    if dp is None and tp is None:
        dp, tp = n // (sp_ * pp_), 1
    elif dp is None:
        dp = n // (tp * sp_ * pp_)
    elif tp is None:
        tp = n // (dp * sp_ * pp_)
    assert dp * tp * sp_ * pp_ == n, \
        f"mesh {dp}x{tp}x{sp_}x{pp_} != {n} devices"
    names, dims = ["dp", "tp"], [dp, tp]
    if sp_ > 1:
        names.append("sp")
        dims.append(sp_)
    if pp_ > 1:
        names.append("pp")
        dims.append(pp_)
    dev = np.asarray(devices).reshape(dims)
    return Mesh(dev, axis_names=tuple(names))


def _param_pspec(path: str, arr) -> P:
    """Megatron sharding rules for the ViT param pytree (torch (out,in)
    weight layout): qkv/fc1 shard the out dim, proj/fc2 shard the in dim."""
    if path.endswith("qkv.w") or path.endswith("fc1.w"):
        return P("tp", None)
    if path.endswith("proj.w") or path.endswith("fc2.w"):
        return P(None, "tp")
    if path.endswith("qkv.b") or path.endswith("fc1.b"):
        return P("tp")
    return P()  # replicate: norms, biases of col-sharded layers, embeddings


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for the model params under ``mesh``.  The patch
    conv is excluded from tp (its out dim (embed) feeds LN which needs the
    full channel axis; it is tiny anyway)."""
    def spec(path, arr):
        ps = _path_str(path)
        if "patch_embed" in ps:
            return NamedSharding(mesh, P())
        p = _param_pspec(ps, arr)
        # guard: only shard dims divisible by the tp size
        tp = mesh.shape["tp"]
        for axis, name in enumerate(p):
            if name == "tp" and arr.shape[axis] % tp != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, p)

    return jax.tree_util.tree_map_with_path(spec, params)


def replicated(mesh: Mesh, tree):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("dp"))


def act_constraint(mesh: Mesh | None):
    """Sequence-parallel residual-stream constraint for vit.forward_q's
    ``act_constraint`` hook: token-shard (B, N, C) activations over the sp
    axis (batch stays dp-sharded).  Returns None when the mesh has no sp
    axis (or sp == 1) so the forward stays untouched in the common case."""
    if mesh is None or "sp" not in mesh.shape or mesh.shape["sp"] == 1:
        return None
    sh = NamedSharding(mesh, P("dp", "sp", None))
    return lambda h: jax.lax.with_sharding_constraint(h, sh)


def shard_params(mesh: Mesh, params):
    return jax.device_put(params, param_shardings(mesh, params))


def shard_replicated(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh, tree))


def int_param_shardings(mesh: Mesh, ip):
    """Sharding pytree for a prepare_int() integer-model pytree.  The baked
    weights live transposed as (Cin, Cout): qkv/fc1 shard Cout (megatron
    row-parallel in torch terms), proj/fc2 shard Cin (column-parallel), so
    GSPMD inserts the same ICI collectives as the fake-quant path.
    Per-head kernel layouts (wq_h/wk_h/wv_h, (H, Cin, D)) shard the head
    axis.  Non-array leaves (bit_config, fp flags) pass through."""
    tp = mesh.shape["tp"]

    def spec(path, arr):
        if not hasattr(arr, "shape") or not hasattr(arr, "dtype"):
            return NamedSharding(mesh, P())  # placeholder; not applied
        ps = _path_str(path)
        p = P()
        if ps.endswith("qkv.w_int") or ps.endswith("fc1.w_int"):
            p = P(None, "tp")
        elif ps.endswith("proj.w_int") or ps.endswith("fc2.w_int"):
            p = P("tp", None)
        elif ps.endswith("_h") and getattr(arr, "ndim", 0) == 3 \
                and "qkv" in ps:
            p = P("tp", None, None)
        for axis, name in enumerate(p):
            if name == "tp" and arr.shape[axis] % tp != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, p)

    return jax.tree_util.tree_map_with_path(spec, ip)


def shard_int_params(mesh: Mesh, ip):
    shardings = int_param_shardings(mesh, ip)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, s)
        if hasattr(a, "shape") and hasattr(a, "dtype") else a,
        ip, shardings)
