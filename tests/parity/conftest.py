"""Parity-test setup: import the reference implementation from
/root/reference on CPU by monkeypatching the hard-coded .cuda() calls
(e.g. models/ptq/quantizer/uniform.py:85, observer/minmax.py:67).

These tests validate that the JAX rebuild reproduces the reference's
numerical semantics bit-for-bit (up to float associativity).  They are
skipped automatically when the reference checkout is absent.
"""
import os
import sys

import pytest

REFERENCE = "/root/reference"

collect_ignore_glob: list = []

if not os.path.isdir(REFERENCE):
    collect_ignore_glob = ["*"]
else:
    import torch

    # Route every .cuda() to a no-op so the reference runs on CPU.
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


@pytest.fixture(scope="session")
def reference_available():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    return True
