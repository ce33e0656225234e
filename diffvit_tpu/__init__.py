"""diffvit_tpu — TPU-native (JAX/XLA/Pallas) fully-quantized ViT framework.

Brand-new implementation of the capabilities of LeSN-Lab/diff-ViT (P2-ViT /
FQ-ViT lineage): PoT-quantized ViT/DeiT/Swin inference, post-training
calibration, mixed-precision search, and the quant-vs-FP diff-analysis
toolkit.  See SURVEY.md at the repo root for the structural map.
"""
from .config import QuantConfig
from .ops.bit_types import BIT_TYPE_DICT, BIT_TYPE_LIST, BitType

__version__ = "0.1.0"
