"""Layer-restore sweeps.

Rebuild of /root/reference/layerwise_quant_compare.py: evaluate the all-4-bit
baseline, then flip chosen bit_config indices to 8 and evaluate each
combination, appending result lines to ``restore_<k>_layers.txt`` in the
reference's format (``:137-231``).
"""
from __future__ import annotations

import itertools
import time


def int4_baseline_line(prec1, prec5, elapsed):
    return (f"Restore Index: nothing remains int4, "
            f"Prec@1 {prec1:.3f} Prec@5 {prec5:.3f} Time {elapsed:.3f}\n")


def restore_line(indices, prec1, prec5, elapsed):
    return (f"Restore Index: {list(indices)}, "
            f"Prec@1 {prec1:.3f} Prec@5 {prec5:.3f} Time {elapsed:.3f}\n")


def run_restore_sweep(model, val_loader, combinations, *, base_bits=4,
                      restore_bits=8, out_path=None, validate_fn=None,
                      log=print):
    """``combinations``: iterable of index tuples to restore.  Returns
    [(indices, prec1, prec5), ...]; appends reference-format lines to
    ``out_path`` when given (layerwise_quant_compare.py:176-227)."""
    from ..engine import validate as _validate
    from ..models import vit as vit_mod

    validate_fn = validate_fn or (lambda bc: _validate(
        model, val_loader, bc, print_freq=0, log=lambda *_: None)[1:])
    slots = vit_mod.num_bit_slots(model.spec)
    results = []

    def emit(line):
        if out_path:
            with open(out_path, "a") as f:
                f.write(line)
        log(line.strip())

    t0 = time.time()
    base = [base_bits] * slots
    prec1, prec5 = validate_fn(tuple(base))
    emit(int4_baseline_line(prec1, prec5, time.time() - t0))
    results.append(((), prec1, prec5))

    for combo in combinations:
        t0 = time.time()
        bc = list(base)
        for idx in combo:
            bc[idx] = restore_bits
        prec1, prec5 = validate_fn(tuple(bc))
        emit(restore_line(combo, prec1, prec5, time.time() - t0))
        results.append((tuple(combo), prec1, prec5))
    return results


def k_layer_combinations(k, slots=50, limit=None):
    """All k-subsets of bit_config indices (the reference enumerates these
    per sweep file, layerwise_quant_compare.py:148-172)."""
    combos = itertools.combinations(range(slots), k)
    if limit is not None:
        combos = itertools.islice(combos, limit)
    return list(combos)
