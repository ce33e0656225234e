"""Hessian sensitivity via Hutchinson trace estimation.

Rebuild of /root/reference/pyhessian/hessian.py + utils.py on JAX: the
reference's ``loss.backward(create_graph=True)`` double-backward becomes a
forward-over-reverse ``jvp(grad(loss))`` HVP.  Per reference semantics
(hessian.py:163-211):

* traces are per-parameter *diagonal-block* estimates: the probe vector and
  the HVP touch one weight matrix at a time
  (``hessian_vector_product(i_grad, i_param, v)``),
* target parameters skip norm/bias/cls_token/pos_embed/patch_embed
  (utils.py:79-85) -> per block [qkv, proj, fc1, fc2] weights + head = 49
  entries for a 12-block model, matching the global_distance ordering,
* Rademacher probes, maxIter=150, early stop when the running mean moves
  less than tol=5e-3 relative.

``hessian_sensitivity`` wraps the 10-batch driver of test_quant.py:147-191
(per-batch |trace| min-max normalization, then per-layer mean across
batches) — with the reference's uninitialized ``mean_hessian`` list fixed
(SURVEY.md §2.3 ⚠️3; ddv_hessian_calc_test.py:221 has the corrected form).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import vit as vit_mod


def _is_swin(spec):
    return hasattr(spec, "depths")


def hessian_target_names(spec) -> list[str]:
    """Reference parameter order (torch named_parameters filtered by
    utils.py:79-85): skip norm/bias/cls_token/pos_embed/patch_embed.  For
    Swin the same filter over swin_quant's module tree yields per block
    [qkv, proj, fc1, fc2] + each stage's downsample reduction + head —
    matching the Swin global_distance ordering."""
    names = []
    if _is_swin(spec):
        for s in range(spec.num_layers):
            for b in range(spec.depths[s]):
                p = f"layers.{s}.blocks.{b}"
                names += [f"{p}.attn.qkv.weight", f"{p}.attn.proj.weight",
                          f"{p}.mlp.fc1.weight", f"{p}.mlp.fc2.weight"]
            if s < spec.num_layers - 1:
                names.append(f"layers.{s}.downsample.reduction.weight")
        names.append("head.weight")
        return names
    for i in range(spec.depth):
        names += [f"blocks.{i}.attn.qkv.weight", f"blocks.{i}.attn.proj.weight",
                  f"blocks.{i}.mlp.fc1.weight", f"blocks.{i}.mlp.fc2.weight"]
    names.append("head.weight")
    return names


_SUB = {"attn": {"qkv": "qkv", "proj": "proj"},
        "mlp": {"fc1": "fc1", "fc2": "fc2"}}


def _get_leaf(params, name):
    if name == "head.weight":
        return params["head"]["w"]
    parts = name.split(".")
    if parts[0] == "layers":  # swin
        s = int(parts[1])
        if parts[2] == "downsample":
            return params["layers"][s]["downsample"]["reduction"]["w"]
        b = int(parts[3])
        return params["layers"][s]["blocks"][b][_SUB[parts[4]][parts[5]]]["w"]
    _, idx, mod, sub, _ = parts
    return params["blocks"][int(idx)][_SUB[mod][sub]]["w"]


def _set_leaf(params, name, value):
    params = jax.tree.map(lambda a: a, params)  # shallow copy of the pytree
    if name == "head.weight":
        params["head"] = dict(params["head"], w=value)
        return params
    parts = name.split(".")
    if parts[0] == "layers":  # swin
        s = int(parts[1])
        layers = list(params["layers"])
        stage = dict(layers[s])
        if parts[2] == "downsample":
            stage["downsample"] = dict(
                stage["downsample"],
                reduction=dict(stage["downsample"]["reduction"], w=value))
        else:
            b = int(parts[3])
            key = _SUB[parts[4]][parts[5]]
            blocks = list(stage["blocks"])
            blocks[b] = dict(blocks[b], **{key: dict(blocks[b][key], w=value)})
            stage["blocks"] = blocks
        layers[s] = stage
        params["layers"] = layers
        return params
    _, idx, mod, sub, _ = parts
    key = _SUB[mod][sub]
    blocks = list(params["blocks"])
    blocks[int(idx)] = dict(blocks[int(idx)], **{key: dict(blocks[int(idx)][key], w=value)})
    params["blocks"] = blocks
    return params


def _fp_forward(params, spec, inputs):
    if _is_swin(spec):
        from ..models import swin as swin_mod

        return swin_mod.forward_fp(params, spec, inputs)
    return vit_mod.forward_fp(params, spec, inputs)


def _ce_loss(logits, targets):
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=1))


def make_block_hvp(params, spec, inputs, targets, name):
    """Jitted diagonal-block HVP for one weight matrix: v -> H_w v where
    H_w = d²/dw² CE(forward_fp(params|w), targets)."""

    def loss_w(w):
        p = _set_leaf(params, name, w)
        return _ce_loss(_fp_forward(p, spec, inputs), targets)

    @jax.jit
    def hvp(w, v):
        return jax.jvp(jax.grad(loss_w), (w,), (v,))[1]

    return hvp


def _chunked_keys(key, n):
    """The same subkey sequence the sequential loop would draw (key, sub =
    split(key) per iteration), materialized n at a time."""
    subs = []
    for _ in range(n):
        key, sub = jax.random.split(key)
        subs.append(sub)
    return key, jnp.stack(subs)


def hutchinson_trace(hvp, w, key, max_iter=150, tol=5e-3, chunk=15):
    """Reference stopping rule (hessian.py:178-204): accumulate v.Hv samples,
    stop when |mean - prev_mean| / (|prev_mean| + 1e-6) < tol.

    Probes are evaluated ``chunk`` at a time via one vmapped device call and
    the stop rule is walked per-probe on the host — bit-identical traces to
    the one-probe-per-dispatch loop (same subkey sequence, same stop
    point) with chunk-times fewer device round-trips; probes computed past
    the stop point are discarded."""

    @jax.jit
    def vhv_chunk(subs):
        def one(sub):
            v = jax.random.rademacher(sub, w.shape, dtype=w.dtype)
            return jnp.sum(hvp(w, v) * v)

        return jax.vmap(one)(subs)

    samples = []
    trace = 0.0
    while len(samples) < max_iter:
        key, subs = _chunked_keys(key, min(chunk, max_iter - len(samples)))
        block = np.asarray(vhv_chunk(subs))
        for vhv in block:
            samples.append(float(vhv))
            mean = float(np.mean(samples))
            if abs(mean - trace) / (abs(trace) + 1e-6) < tol:
                return trace, len(samples)
            trace = mean
    return trace, max_iter


def hessian_traces(params, spec, inputs, targets, key, max_iter=150,
                   tol=5e-3, names=None):
    """(names, traces) for all 4*depth+1 target weights on one batch —
    the JAX equivalent of pyhessian.hessian(...).trace() with the
    reference's per-leaf (diagonal-block) HVPs.  Compiles one HVP per
    target leaf — use ``hessian_traces_joint`` for the one-compile
    variant."""
    names = names or hessian_target_names(spec)
    inputs = jnp.asarray(inputs)
    targets = jnp.asarray(targets)
    traces = []
    for name in names:
        w = _get_leaf(params, name)
        hvp = make_block_hvp(params, spec, inputs, targets, name)
        key, sub = jax.random.split(key)
        t, _ = hutchinson_trace(hvp, w, sub, max_iter, tol)
        traces.append(t)
    return names, traces


def hessian_traces_joint(params, spec, inputs, targets, key, max_iter=150,
                         tol=5e-3, names=None):
    """Per-leaf Hutchinson traces from JOINT probes: one jitted HVP over the
    dict of all target leaves; per-leaf vhv = sum(v_i * (Hv)_i).  With
    independent Rademacher components per leaf the cross-block terms have
    zero expectation, so each per-leaf estimate is unbiased for its diagonal
    block — same estimand as the reference, 49x fewer compiles (upstream
    PyHessian's own trace() uses joint probes; the reference switched to
    per-leaf ones, hessian.py:178-186).  Early stop when the mean of the
    per-leaf running means stabilizes (same tol form as hessian.py:198)."""
    names = names or hessian_target_names(spec)
    inputs = jnp.asarray(inputs)
    targets = jnp.asarray(targets)
    ws0, hvp = _multi_leaf_fns(params, spec, inputs, targets, names)

    def sample(key):
        ks = jax.random.split(key, len(names))
        v = {n: jax.random.rademacher(k, ws0[n].shape, dtype=ws0[n].dtype)
             for n, k in zip(names, ks)}
        hv = hvp(ws0, v)
        return jnp.stack([jnp.sum(v[n] * hv[n]) for n in names])

    # chunked vmapped probes, host-walked stop rule — same estimates/stop
    # point as one dispatch per probe, ~chunk x fewer device round trips
    chunk = 15
    vsample = jax.jit(jax.vmap(sample))
    samples = []
    trace = 0.0
    stop = False
    while len(samples) < max_iter and not stop:
        key, subs = _chunked_keys(key, min(chunk, max_iter - len(samples)))
        block = np.asarray(vsample(subs))
        for row in block:
            samples.append(row)
            means = np.mean(samples, axis=0)
            mean = float(np.mean(means))
            if abs(mean - trace) / (abs(trace) + 1e-6) < tol:
                stop = True
                break
            trace = mean
    return names, np.mean(samples, axis=0).tolist()


def _multi_leaf_fns(params, spec, inputs, targets, names):
    """Joint loss over a dict of target leaves (the reference's eigenvalues /
    density operate on the full selected-parameter vector jointly,
    hessian.py:114-161, 213-288)."""

    def set_all(ws):
        p = params
        for n, w in ws.items():
            p = _set_leaf(p, n, w)
        return p

    def loss_ws(ws):
        return _ce_loss(_fp_forward(set_all(ws), spec, inputs), targets)

    ws0 = {n: _get_leaf(params, n) for n in names}

    @jax.jit
    def hvp(ws, vs):
        return jax.jvp(jax.grad(loss_ws), (ws,), (vs,))[1]

    return ws0, hvp


def _dot(a, b):
    return sum(jnp.sum(x * y) for x, y in zip(jax.tree.leaves(a),
                                              jax.tree.leaves(b)))


def _normalize(v):
    s = jnp.sqrt(_dot(v, v)) + 1e-6
    return jax.tree.map(lambda x: x / s, v)


def top_eigenvalues(params, spec, inputs, targets, key, top_n=1,
                    max_iter=100, tol=1e-3, names=None):
    """Power iteration with deflation for the top Hessian eigenvalues
    (pyhessian/hessian.py:114-161)."""
    names = names or hessian_target_names(spec)
    inputs, targets = jnp.asarray(inputs), jnp.asarray(targets)
    ws0, hvp = _multi_leaf_fns(params, spec, inputs, targets, names)

    eigenvalues, eigenvectors = [], []
    for _ in range(top_n):
        key, sub = jax.random.split(key)
        ks = jax.random.split(sub, len(names))
        v = {n: jax.random.normal(k, ws0[n].shape)
             for n, k in zip(names, ks)}
        v = _normalize(v)
        eig = None
        for _ in range(max_iter):
            # deflate against previously found eigenvectors
            for prev in eigenvectors:
                coef = _dot(v, prev)
                v = jax.tree.map(lambda a, b: a - coef * b, v, prev)
            v = _normalize(v)
            hv = hvp(ws0, v)
            new_eig = float(_dot(hv, v))
            v = _normalize(hv)
            if eig is not None and abs(new_eig - eig) / (abs(eig) + 1e-6) < tol:
                eig = new_eig
                break
            eig = new_eig
        eigenvalues.append(eig)
        eigenvectors.append(v)
    return eigenvalues, eigenvectors


def eigenvalue_density(params, spec, inputs, targets, key, iters=100, n_v=1,
                       names=None):
    """Stochastic Lanczos quadrature eigenvalue density
    (pyhessian/hessian.py:213-288; the reference's torch.eig call is removed
    upstream — we diagonalize the tridiagonal matrix with numpy)."""
    names = names or hessian_target_names(spec)
    inputs, targets = jnp.asarray(inputs), jnp.asarray(targets)
    ws0, hvp = _multi_leaf_fns(params, spec, inputs, targets, names)

    all_eigs, all_weights = [], []
    for _ in range(n_v):
        key, sub = jax.random.split(key)
        ks = jax.random.split(sub, len(names))
        v = {n: jnp.sign(jax.random.rademacher(k, ws0[n].shape,
                                               dtype=jnp.float32))
             for n, k in zip(names, ks)}
        v = _normalize(v)
        vs = [v]
        alphas, betas = [], []
        w_prev = None
        for i in range(iters):
            hv = hvp(ws0, vs[-1])
            alpha = float(_dot(hv, vs[-1]))
            alphas.append(alpha)
            w = jax.tree.map(lambda a, b: a - alpha * b, hv, vs[-1])
            if w_prev is not None:
                w = jax.tree.map(lambda a, b: a - betas[-1] * b, w, w_prev)
            beta = float(jnp.sqrt(_dot(w, w)))
            if beta < 1e-8 or i == iters - 1:
                break
            betas.append(beta)
            w_prev = vs[-1]
            vs.append(jax.tree.map(lambda a: a / beta, w))
        t = np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
        evals, evecs = np.linalg.eigh(t)
        all_eigs.append(evals.tolist())
        all_weights.append((evecs[0] ** 2).tolist())
    return all_eigs, all_weights


def hessian_sensitivity(params, spec, batches, key, max_iter=150, tol=5e-3,
                        log=print, joint=False):
    """test_quant.py:147-191: per-batch traces -> |.| -> min-max normalize ->
    mean over batches.  ``batches``: iterable of (inputs, targets); the
    reference uses 10 calibration-loader batches.  ``joint=False`` (default)
    is the reference's committed per-leaf HVP loop (hessian.py:163-211);
    ``joint=True`` probes all leaves in one compiled HVP — same estimand,
    different per-sample variance, ~49x fewer compiles (the CLI exposes this
    as --hessian-estimator)."""
    fn = hessian_traces_joint if joint else hessian_traces
    trace_list = []
    for bi, (inputs, targets) in enumerate(batches):
        key, sub = jax.random.split(key)
        _, traces = fn(params, spec, inputs, targets, sub, max_iter, tol)
        trace_list.append(traces)
        log(f"hessian batch {bi}: done")
    normalized = []
    for traces in trace_list:
        t = np.abs(np.asarray(traces))
        lo, hi = t.min(), t.max()
        normalized.append((t - lo) / (hi - lo))
    mean_hessian = np.stack(normalized).mean(axis=0)
    return mean_hessian.tolist()
