"""Model registry + per-family preprocessing constants.

Rebuild of ``str2model`` (model_utility.py:7-19, test_quant.py:56-68) and the
per-family preprocessing switch (test_quant.py:100-113)."""
from __future__ import annotations

import dataclasses
import os

from .vit import VIT_SPECS, init_params


@dataclasses.dataclass(frozen=True)
class Preprocessing:
    mean: tuple
    std: tuple
    crop_pct: float
    input_size: int = 224


PREPROCESSING = {
    "deit": Preprocessing((0.485, 0.456, 0.406), (0.229, 0.224, 0.225), 0.875),
    "vit": Preprocessing((0.5, 0.5, 0.5), (0.5, 0.5, 0.5), 0.9),
    "swin": Preprocessing((0.485, 0.456, 0.406), (0.229, 0.224, 0.225), 0.9),
}

MODEL_NAMES = (
    "deit_tiny", "deit_small", "deit_base", "vit_base", "vit_large",
    "swin_tiny", "swin_small", "swin_base",
)


def family(name: str) -> str:
    return name.split("_")[0]


def preprocessing_for(name: str) -> Preprocessing:
    return PREPROCESSING[family(name)]


def get_spec(name: str):
    if name in VIT_SPECS:
        return VIT_SPECS[name]
    if name.startswith("swin"):
        from .swin import SWIN_SPECS
        return SWIN_SPECS[name]
    raise KeyError(name)


def build_params(name: str, checkpoint: str | None = None, seed: int = 0):
    """Build a param pytree for ``name``.  ``checkpoint``: local path to a
    torch .pth (DeiT/Swin) or Flax .npz (vit_base/large); falls back to the
    DIFFVIT_CKPT_DIR env var's ``{name}.pth``/``{name}.npz``, then to random
    init (this environment has no network access — the reference downloads
    from torch.hub at vit_fquant.py:822-828)."""
    import jax

    spec = get_spec(name)
    if checkpoint is None:
        ckpt_dir = os.environ.get("DIFFVIT_CKPT_DIR", "")
        for ext in (".pth", ".npz"):
            cand = os.path.join(ckpt_dir, name + ext)
            if ckpt_dir and os.path.exists(cand):
                checkpoint = cand
                break
    if checkpoint is not None:
        if name.startswith("swin"):
            from .swin import load_swin_torch_checkpoint
            return spec, load_swin_torch_checkpoint(checkpoint, spec)
        from .load import load_vit_npz, load_vit_torch_checkpoint
        if checkpoint.endswith(".npz"):
            return spec, load_vit_npz(checkpoint, spec)
        return spec, load_vit_torch_checkpoint(checkpoint, spec)
    if name.startswith("swin"):
        from .swin import init_swin_params
        return spec, init_swin_params(spec, jax.random.PRNGKey(seed))
    return spec, init_params(spec, jax.random.PRNGKey(seed))
