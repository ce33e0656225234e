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
    import types

    import torch

    # Route every .cuda() to a no-op so the reference runs on CPU.
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    # timm is not installed; the reference's model_utility ->
    # generate_data -> utils.build_model chain imports it at module level
    # (utils/build_model.py:5-7) even though only the PSAQ-ViT data
    # generator actually uses it.  Stub the import surface so the composed
    # driver (model_utility.calibrate_model/validate) is importable.
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_vt = types.ModuleType("timm.models.vision_transformer")

        class _StubAttention:  # placeholder for isinstance-style uses
            pass

        timm_swin = types.ModuleType("timm.models.swin_transformer")

        class _StubWindowAttention:
            pass

        timm_vt.Attention = _StubAttention
        timm_swin.WindowAttention = _StubWindowAttention
        timm_models.vision_transformer = timm_vt
        timm_models.swin_transformer = timm_swin
        timm_models.__path__ = []  # mark as package for submodule imports

        def _no_timm(*a, **k):
            raise RuntimeError("timm is stubbed in the parity suite")

        timm.create_model = _no_timm
        timm.models = timm_models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.vision_transformer"] = timm_vt
        sys.modules["timm.models.swin_transformer"] = timm_swin


@pytest.fixture(scope="session")
def reference_available():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    return True
