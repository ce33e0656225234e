"""GPipe-style pipeline parallelism (the ``pp`` mesh axis) for the
integer execution path.

The reference is strictly single-GPU (SURVEY.md §2.7); dp/tp/sp (mesh.py)
shard the batch, the weight matrices, and the token axis.  pp shards the
remaining dimension — DEPTH: stage ``s`` owns blocks
``[s*L/pp, (s+1)*L/pp)`` and microbatches flow through the stages in the
classic GPipe schedule (Huang et al., NeurIPS 2019).  TPU-native choices:

* **shard_map + ppermute, not send/recv**: each tick every stage runs its
  blocks on its current microbatch, then one ``jax.lax.ppermute`` shifts
  the residual stream to the next stage.  The pp axis is the innermost
  mesh axis (mesh.py) so the shift is a single ICI hop per stage.
* **the wire is int8 codes**: between fused int blocks the residual
  stream already rides as int8 quant codes (vit_int._block_int's ``hc``);
  the stage-to-stage transfer reuses that representation, so pp moves 4x
  less ICI traffic than a f32 pipeline would.  (On hosts where the fused
  codes path is off — CPU tests — the wire degrades to the f32 stream,
  same schedule.)
* **one trace, SPMD stages**: the schedule is a ``lax.scan`` over
  T = M + pp - 1 ticks; stage identity is ``lax.axis_index("pp")`` data,
  not Python control flow, so XLA compiles ONE program for all stages.
  Bubble ticks compute on stale/garbage microbatches whose results are
  never recorded (the standard GPipe bubble, fraction (pp-1)/T).

Single-device semantics are preserved exactly: each block applies
vit_int._block_int — the same function forward_q_int loops over — so the
pipelined forward is bit-identical to forward_q_int modulo nothing
(integer math; tests/test_pipeline_parallel.py asserts equality).

Scope: ViT/DeiT-family int models (uniform block geometry — a Swin stage
changes resolution mid-network, so its depth axis is not SPMD-uniform);
all sites quantized, no -1 (fp32-restored) layers.  ``prepare_pp``
validates and raises otherwise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models import vit_int
from ..models.vit import ViTSpec
from ..config import QuantConfig

_SITES = ("qkv", "proj", "fc1", "fc2")


def _clean_block(ib):
    """Copy of one int-block pytree with the static 'fp' leaves stripped
    (they would otherwise be stacked into traced arrays and break the
    static branch structure); validates every site is quantized."""
    out = {}
    for k, v in ib.items():
        if isinstance(v, dict):
            if v.get("fp", False):
                raise ValueError(
                    f"pipeline parallelism requires every site quantized; "
                    f"'{k}' is fp32 (bit -1 or unquantized)")
            # the per-head qkv relayout (wq_h/...) serves only the
            # fused_attention_block alternative kernel — dropping it
            # halves the stage weight footprint
            out[k] = {kk: vv for kk, vv in v.items()
                      if kk not in ("fp", "wq_h", "wk_h", "wv_h",
                                    "mult_h", "bias_h")}
        else:
            out[k] = v
    return out


def prepare_pp(ip, spec: ViTSpec, cfg: QuantConfig, pp: int, *,
               use_pallas: bool | None = None):
    """Bake a prepared int-model pytree (vit_int.prepare_int) into a
    pipeline plan: per-block leaves stacked along a leading (L,) depth
    axis (sharded P("pp") by the runner, so stage s holds only its own
    L/pp blocks) + per-block input grid scales + the host-resolved static
    flags (codes mode, fast-LIS gate) the SPMD stage body needs."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    blocks = ip["blocks"]
    L = len(blocks)
    if L % pp != 0:
        raise ValueError(f"depth {L} not divisible by pp={pp}")
    bc = ip["bit_config"]
    if any(b == -1 for b in bc):
        raise ValueError("pipeline parallelism does not support -1 "
                         "(fp32-restored) layers: stage programs are SPMD")

    cleaned = [_clean_block(ib) for ib in blocks]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cleaned)
    in_scales = jnp.stack(
        [jnp.asarray(ip["qact1"]["scale"] if i == 0
                     else blocks[i - 1]["qact4"]["scale"])
         for i in range(L)])

    sym_acts = bool(ip.get("sym_acts", False))
    codes_mode = bool(use_pallas and cfg.int_norm and cfg.smoothquant
                      and sym_acts)
    # Host-resolved fast-LIS gate: inside the stage body every scale is a
    # traced array slice, so _block_int's concrete-scale gate can't fire;
    # resolve it here (scales are concrete post-calibration) and require
    # it to hold for EVERY block — stages share one SPMD program.  The
    # fused attention path runs whenever fused2 conditions hold (not only
    # codes_mode — sym_acts isn't required for it), so gate on those.
    from ..ops.pallas.attention import lis_fast_ok

    lis_fast = False
    if use_pallas and cfg.int_norm and cfg.smoothquant and cfg.lis:
        svs = [float(jax.device_get(ib["attn.qact_attn1"]["scale"]))
               for ib in blocks]
        lis_fast = all(lis_fast_ok(sv) for sv in svs)
    return {
        "stacked": stacked,        # leaves (L, ...) — shard P("pp")
        "in_scales": in_scales,    # (L,)
        "pp": pp,
        "lps": L // pp,            # blocks per stage
        "codes_mode": codes_mode,
        "use_pallas": use_pallas,
        "lis_fast": lis_fast,
        # bits are only consulted for static != -1 branching inside
        # _block_int (weights/scales are already baked); -1 was excluded
        # above, so one representative tuple serves every stage
        "bits4": tuple(bc[1:5]),
    }


def plan_shardings(mesh, plan):
    """NamedSharding pytree for the plan's stacked leaves: the leading
    depth axis shards P("pp"); when the mesh also has a tp axis, the baked
    weights keep the megatron layout of mesh.int_param_shardings on their
    trailing dims ((L, Cin, Cout): qkv/fc1 shard Cout, proj/fc2 shard Cin).
    Inside the stage body those dims are AUTO (partial-manual shard_map),
    so GSPMD applies the same gather/partition decisions as the non-pp
    integer path."""
    from jax.sharding import NamedSharding

    from .mesh import _path_str

    tp = mesh.shape.get("tp", 1)

    def spec(path, arr):
        dims = [None] * arr.ndim
        dims[0] = "pp"
        ps = _path_str(path)
        if tp > 1 and arr.ndim == 3:
            if (ps.endswith("qkv.w_int") or ps.endswith("fc1.w_int")) \
                    and arr.shape[2] % tp == 0:
                dims[2] = "tp"
            elif (ps.endswith("proj.w_int") or ps.endswith("fc2.w_int")) \
                    and arr.shape[1] % tp == 0:
                dims[1] = "tp"
        return NamedSharding(mesh, P(*dims))

    stacked = jax.tree_util.tree_map_with_path(spec, plan["stacked"])
    return dict(plan, stacked=jax.tree.map(jax.device_put, plan["stacked"],
                                           stacked),
                in_scales=jax.device_put(
                    plan["in_scales"], NamedSharding(mesh, P("pp"))))


def forward_q_int_pp(ip, plan, spec: ViTSpec, cfg: QuantConfig, x, mesh, *,
                     n_micro: int | None = None, pallas_interpret=False):
    """Pipeline-parallel integer forward over a (…, pp) mesh.

    The embed front (patchify/fences) and head tail run under plain GSPMD
    (they are ~1% of the FLOPs); the block stack runs inside a shard_map
    over the pp axis with the GPipe tick schedule.  Composes with a dp
    axis (the microbatch's batch dim stays dp-sharded; each dp slice is
    an independent pipeline).  ``n_micro`` defaults to 2*pp — bubble
    overhead (pp-1)/(n_micro+pp-1) ≈ 1/3 at the default, amortize with
    larger batches/more microbatches."""
    pp = mesh.shape["pp"]
    assert pp == plan["pp"], f"plan built for pp={plan['pp']}, mesh has {pp}"
    M = n_micro if n_micro is not None else 2 * pp
    B = x.shape[0]
    assert B % M == 0, f"batch {B} not divisible by n_micro={M}"
    bt_a = cfg.bit_a
    codes_mode = plan["codes_mode"]
    lps, lis_fast = plan["lps"], plan["lis_fast"]
    use_pallas, bits4 = plan["use_pallas"], plan["bits4"]

    h = vit_int._embed_front(ip, spec, cfg, x)
    N, C = h.shape[1], h.shape[2]
    if codes_mode:
        wire = jnp.clip(jnp.round(h / ip["qact1"]["scale"]),
                        bt_a.lower_bound, bt_a.upper_bound).astype(jnp.int8)
    else:
        wire = h
    wire = wire.reshape(M, B // M, N, C)

    def stage_body(stacked, in_scales, wire):
        s = jax.lax.axis_index("pp")
        T = M + pp - 1

        def run_stage(state):
            hloc, hcloc = (None, state) if codes_mode else (state, None)
            for j in range(lps):  # static unroll: per-block leaves/scales
                ib = jax.tree.map(lambda leaf: leaf[j], stacked)
                for site in _SITES:
                    ib[site]["fp"] = False
                hloc, hcloc = vit_int._block_int(
                    ib, bits4, in_scales[j], hloc, hcloc, spec, cfg,
                    use_pallas=use_pallas, pallas_interpret=pallas_interpret,
                    sym_acts=codes_mode, lis_fast_override=lis_fast)
            return hcloc if codes_mode else hloc

        def tick(carry, t):
            state, outs = carry
            # stage 0 injects microbatch t; ppermute delivers zeros to it
            # (no inbound edge), so during drain ticks (t >= M) it re-runs
            # the clamped last microbatch instead — real data, never the
            # zeros row that would hit integer-LN's 1/std singularity
            # (NaN garbage is discarded either way, but it would trip
            # jax_debug_nans).  Drain outputs are never recorded.
            inject = jax.lax.dynamic_index_in_dim(
                wire, jnp.minimum(t, M - 1), 0, keepdims=False)
            state = jnp.where(s == 0, inject, state)
            out = run_stage(state)
            # shift the residual stream one stage downstream (one ICI hop)
            nxt = jax.lax.ppermute(out, "pp",
                                   [(k, k + 1) for k in range(pp - 1)])
            # the last stage finished microbatch m = t - (pp - 1)
            m = t - (pp - 1)
            mc = jnp.clip(m, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, mc, 0, keepdims=False)
            rec = jnp.where((s == pp - 1) & (m >= 0), out, cur)
            outs = jax.lax.dynamic_update_index_in_dim(outs, rec, mc, 0)
            return (nxt, outs), None

        # warm state = microbatch 0 (values are discarded until real data
        # arrives, but unlike zeros they can't hit LN's 1/std singularity)
        carry0 = (wire[0], jnp.zeros_like(wire))
        (_, outs), _ = jax.lax.scan(tick, carry0, jnp.arange(T))
        return outs[None]  # (1, M, Bm, N, C): this stage's slot

    # Partial-manual shard_map: only the pp axis is manual (the ppermute
    # schedule); dp/tp stay AUTO, so GSPMD keeps batch sharding and the
    # megatron weight layouts working *inside* the stage body — pp
    # composes with dp and tp without re-deriving their collectives here.
    outs = jax.shard_map(
        stage_body, mesh=mesh,
        in_specs=(P("pp"), P("pp"), P()),
        out_specs=P("pp", None, None, None, None),
        axis_names={"pp"},
        check_vma=False,
    )(plan["stacked"], plan["in_scales"], wire)
    last = outs[-1].reshape(B, N, C)  # the last stage's recorded outputs
    if codes_mode:
        return vit_int._head_tail(ip, spec, cfg, None, last)
    return vit_int._head_tail(ip, spec, cfg, last, None)
