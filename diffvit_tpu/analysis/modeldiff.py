"""ModelDiff profiling-input generation.

Rebuild of /root/reference/dataset_utility.py:193-381: search-based input
generation maximizing divergence x diversity between two models —

* ``metrics_output_diversity``: mean pairwise Euclidean distance of a
  model's outputs (:193-207),
* blackbox variant: single-pixel ±epsilon mutations, keep when the combined
  score improves (:209-302),
* whitebox variant: PGD-generated candidates, keep the best scorer
  (:305-381).
"""
from __future__ import annotations

import numpy as np
from scipy import spatial


def metrics_output_diversity(outputs):
    d = spatial.distance.cdist(list(outputs), list(outputs),
                               metric="euclidean")
    return float(np.mean(d))


def _score(out1, out2, init1, init2):
    m1 = metrics_output_diversity(out1)
    m2 = metrics_output_diversity(out2)
    d1 = float(np.mean(spatial.distance.cdist(
        list(out1), list(init1), metric="euclidean").diagonal()))
    d2 = float(np.mean(spatial.distance.cdist(
        list(out2), list(init2), metric="euclidean").diagonal()))
    return d1 * d2 * m1 * m2


def gen_profiling_inputs_blackbox(forward1, forward2, seed_inputs, *,
                                  epsilon=0.2, max_iterations=1000, seed=0,
                                  log=None):
    """forwardN(x numpy) -> logits numpy.  Single-pixel mutation hill climb
    (dataset_utility.py:209-302)."""
    rng = np.random.default_rng(seed)
    inputs = np.asarray(seed_inputs, np.float32)
    n_inputs = inputs.shape[0]
    shape = inputs.shape[1:]
    ndims = int(np.prod(shape))

    init1 = np.asarray(forward1(inputs))
    init2 = np.asarray(forward2(inputs))

    def evaluate(x):
        return _score(np.asarray(forward1(x)), np.asarray(forward2(x)),
                      init1, init2)

    score = evaluate(inputs)
    for i in range(max_iterations):
        flat = np.zeros(ndims, np.float32)
        flat[rng.integers(0, ndims)] = epsilon
        mutation = np.zeros_like(inputs)
        mutation[rng.integers(0, n_inputs)] = flat.reshape(shape)

        right = inputs + mutation
        right_score = evaluate(right)
        left = inputs - mutation
        left_score = evaluate(left)
        if right_score <= score and left_score <= score:
            continue
        if right_score > left_score:
            inputs, score = right, right_score
        else:
            inputs, score = left, left_score
        if log:
            log(f"mutation {i}: score -> {score:.4f}")
    return inputs


def gen_profiling_inputs_whitebox(forward1, forward2, gen_adv, seed_inputs,
                                  seed_labels, *, max_iterations=20,
                                  log=None):
    """``gen_adv(inputs, labels) -> adversarial inputs`` (an AttackPGD).
    Keeps the best-scoring adversarial batch (dataset_utility.py:305-381)."""
    inputs = np.asarray(seed_inputs, np.float32)
    init1 = np.asarray(forward1(inputs))
    init2 = np.asarray(forward2(inputs))

    def evaluate(x):
        return _score(np.asarray(forward1(x)), np.asarray(forward2(x)),
                      init1, init2)

    score = evaluate(inputs)
    best = None
    for i in range(max_iterations):
        cand = np.asarray(gen_adv(inputs, seed_labels))
        cand_score = evaluate(cand)
        if cand_score > score:
            best, score = cand, cand_score
            if log:
                log(f"iteration {i}: score -> {score:.4f}")
    return best
