"""DDV-Hessian sensitivity.

Rebuild of /root/reference/pyhessian/ddv_hessian.py: the loss is the summed
MSE between the reference model's clean x adversarial activation Grams
("DDVs", detached constants) and the target model's, and the sensitivity is
the per-layer Hutchinson trace of that loss's Hessian w.r.t. the target
model's weights (ddv_hessian.py:131-190, 302-359).

Note on fidelity: the committed reference driver
(ddv_hessian_calc_test.py:124-126) never calibrates or quant-switches its
"int4_model" — both models run the float path, which is also what makes the
gradients non-zero (fake-quant rounding has zero derivative).  We therefore
compute on the float forward; activations use the module-tap set
(bit_config=None semantics) with optional single-layer selection.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import vit as vit_mod
from .hessian import (_get_leaf, _set_leaf, hessian_target_names,
                      hutchinson_trace)


def params_up_to(all_names, name_selected):
    """Reference get_params_grad semantics (pyhessian/utils.py:61-99):
    collect target params in named_parameters order, stopping AFTER the
    first whose name contains ``name_selected`` (substring test, so
    'blocks.1.attn' stops at blocks.1 — blocks.11 comes later).  If no
    name matches (e.g. the selected tap is the patch conv, whose params
    the target filter skips), the reference warns and keeps everything."""
    out = []
    for n in all_names:
        out.append(n)
        if name_selected in n:
            return out
    print(f"Warning: Target layer {name_selected} not found in model")
    return out


def _taps_for_layer(params, spec, x, layer_indices=None):
    taps: list = []
    vit_mod.forward_fp(params, spec, x, taps=taps)
    from .activations import _order_for

    order = _order_for(spec, module_taps=True)
    d = dict(taps)
    acts = [d[n] for n in order]
    if layer_indices is not None:
        return [acts[layer_indices]], [order[layer_indices]]
    return acts, order


def _ddv_list(params, spec, x, adv_x, layer_indices):
    acts, names = _taps_for_layer(params, spec, x, layer_indices)
    adv_acts, _ = _taps_for_layer(params, spec, adv_x, layer_indices)
    ddvs = []
    for a, b in zip(acts, adv_acts):
        a = a.reshape(a.shape[0], -1)
        b = b.reshape(b.shape[0], -1)
        ddvs.append(a @ b.T)
    return ddvs, names


class DDVHessian:
    """Per-layer Hutchinson traces of the DDV-MSE loss Hessian.

    model:   reference (float) engine model — its DDVs are constants.
    q_model: target engine model whose weight sensitivity is probed.
    """

    def __init__(self, model, q_model, data, adv_data, layer_indices=None,
                 max_iter=100, tol=1e-3):
        self.spec = q_model.spec
        self.q_params = q_model.params
        self.max_iter = max_iter
        self.tol = tol
        self.layer_indices = layer_indices

        inputs, _ = data
        adv_inputs = adv_data[0] if isinstance(adv_data, tuple) else adv_data
        self.inputs = jnp.asarray(inputs)
        self.adv_inputs = jnp.asarray(adv_inputs)

        ref_ddvs, names = _ddv_list(model.params, model.spec, self.inputs,
                                    self.adv_inputs, layer_indices)
        self.ref_ddvs = [jax.lax.stop_gradient(d) for d in ref_ddvs]
        self.tap_names = names
        if layer_indices is not None:
            # reference semantics (pyhessian/utils.py:61-99, used at
            # ddv_hessian.py:198): probe only parameters up to AND including
            # the first target weight whose name contains the selected tap's
            # module name (nameSelected = layer_info[0]['name'])
            self.param_names = params_up_to(hessian_target_names(self.spec),
                                            names[0])
        else:
            self.param_names = hessian_target_names(self.spec)

    def _loss_fn(self, name):
        def loss_w(w):
            p = _set_leaf(self.q_params, name, w)
            q_ddvs, _ = _ddv_list(p, self.spec, self.inputs,
                                  self.adv_inputs, self.layer_indices)
            loss = 0.0
            for qd, rd in zip(q_ddvs, self.ref_ddvs):
                loss = loss + jnp.mean((qd - rd) ** 2)
            return loss

        return loss_w

    def trace(self, key=None, param_names=None):
        """(names, traces) — per-weight diagonal-block Hutchinson traces
        (ddv_hessian.py:302-359)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        names = param_names or self.param_names
        traces = []
        for name in names:
            w = _get_leaf(self.q_params, name)
            loss_w = self._loss_fn(name)

            hvp = jax.jit(lambda w_, v, f=loss_w: jax.jvp(
                jax.grad(f), (w_,), (v,))[1])
            key, sub = jax.random.split(key)
            t, _ = hutchinson_trace(hvp, w, sub, self.max_iter, self.tol)
            traces.append(t)
        return names, traces
