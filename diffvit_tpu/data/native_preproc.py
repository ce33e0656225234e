"""ctypes bindings for the native preprocessing library (native/preproc.cpp).

Builds the shared library on first use (g++ -O3 -fopenmp) into
``native/build/`` and exposes a transform compatible with
``data.imagenet.build_transform`` — the resample math replicates Pillow's
fixed-point convolution resampling bit-exactly (verified by
tests/test_native_preproc.py), so the two paths are interchangeable for
accuracy purposes while the native one avoids per-pixel Python overhead and
parallelizes batch assembly outside the GIL.
"""
from __future__ import annotations

import ctypes
import math
import os
import subprocess

import numpy as np

_LIB = None

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "preproc.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(_SRC), "build")
_SO = os.path.join(_BUILD_DIR, "libpreproc.so")


def _build():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.preprocess_rgb.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def preprocess_array(rgb_u8, *, input_size=224, crop_pct=0.875,
                     mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    """uint8 HWC RGB -> float32 CHW, native path."""
    lib = load_library()
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    h, w, _ = rgb_u8.shape
    out = np.empty((3, input_size, input_size), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    size = int(math.floor(input_size / crop_pct))
    lib.preprocess_rgb(
        rgb_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        _fptr(out), size, input_size, _fptr(mean_a), _fptr(std_a))
    return out


def preprocess_batch(rgb_list, *, input_size=224, crop_pct=0.875,
                     mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    """List of uint8 HWC arrays -> (N, 3, size, size) float32, parallel."""
    lib = load_library()
    arrs = [np.ascontiguousarray(a, np.uint8) for a in rgb_list]
    n = len(arrs)
    out = np.empty((n, 3, input_size, input_size), np.float32)
    srcs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for a in arrs])
    shs = (ctypes.c_int * n)(*[a.shape[0] for a in arrs])
    sws = (ctypes.c_int * n)(*[a.shape[1] for a in arrs])
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    size = int(math.floor(input_size / crop_pct))
    lib.preprocess_batch(srcs, shs, sws, n, _fptr(out), size, input_size,
                         _fptr(mean_a), _fptr(std_a))
    return out


def build_native_transform(input_size=224, mean=(0.485, 0.456, 0.406),
                           std=(0.229, 0.224, 0.225), crop_pct=0.875):
    """Drop-in replacement for data.imagenet.build_transform using the
    native resampler (PIL only decodes)."""

    def transform(img):
        rgb = np.asarray(img.convert("RGB"), np.uint8)
        return preprocess_array(rgb, input_size=input_size,
                                crop_pct=crop_pct, mean=mean, std=std)

    return transform
