"""ctypes bindings for the native JPEG decode + preprocess pipeline
(native/decode.cpp + native/preproc.cpp, one shared library).

``decode_preprocess(path_or_bytes)`` replaces the reference eval loop's
PIL decode -> torchvision transform (test_quant.py:504-534) with a single
C call: libjpeg JDCT_ISLOW decode (the method PIL uses — decoded pixels
match PIL, tests/test_native_decode.py) into the bit-exact-Pillow
resample/crop/normalize of preproc.cpp.  The batch entry point loops with
OpenMP outside the GIL.
"""
from __future__ import annotations

import ctypes
import math
import os
import subprocess

import numpy as np

_LIB = None

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRCS = [os.path.join(_NATIVE_DIR, "decode.cpp"),
         os.path.join(_NATIVE_DIR, "preproc.cpp")]
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_SO = os.path.join(_BUILD_DIR, "libdecode.so")


def _build():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp", "-o", _SO,
           *_SRCS, "-ljpeg"]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    if (not os.path.exists(_SO)
            or any(os.path.getmtime(_SO) < os.path.getmtime(s)
                   for s in _SRCS)):
        _build()
    lib = ctypes.CDLL(_SO)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.jpeg_shape.argtypes = [u8p, ctypes.c_ulong, i32p, i32p]
    lib.jpeg_shape.restype = ctypes.c_int
    lib.jpeg_decode_rgb.argtypes = [u8p, ctypes.c_ulong, u8p]
    lib.jpeg_decode_rgb.restype = ctypes.c_int
    lib.jpeg_decode_preprocess.argtypes = [
        u8p, ctypes.c_ulong, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p]
    lib.jpeg_decode_preprocess.restype = ctypes.c_int
    lib.jpeg_decode_preprocess_fast.argtypes = \
        lib.jpeg_decode_preprocess.argtypes
    lib.jpeg_decode_preprocess_fast.restype = ctypes.c_int
    lib.jpeg_decode_preprocess_batch.argtypes = [
        ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_ulong), ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, i32p, ctypes.c_int]
    lib.jpeg_decode_preprocess_u8.argtypes = [
        u8p, ctypes.c_ulong, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.jpeg_decode_preprocess_u8.restype = ctypes.c_int
    lib.jpeg_decode_preprocess_batch_u8.argtypes = [
        ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_ulong), ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int]
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.apply_code_lut.argtypes = [u8p, i8p, i8p, ctypes.c_long,
                                   ctypes.c_long]
    _LIB = lib
    return lib


def apply_code_lut(batch_u8, lut):
    """NCHW (or CHW) uint8 batch -> int8 input codes via the native
    memory-speed LUT pass (the codes-wire encoder; falls back to numpy in
    data/imagenet.encode_input when the native library is unavailable)."""
    lib = load_library()
    x = np.ascontiguousarray(batch_u8)
    if x.dtype != np.uint8:
        raise TypeError(f"apply_code_lut expects uint8, got {x.dtype}")
    chw = x.ndim == 3
    if chw:
        x = x[None]
    if x.ndim != 4 or x.shape[1] != 3:
        raise ValueError(f"expected NCHW with C=3, got shape {x.shape}")
    lut = np.ascontiguousarray(lut, np.int8)
    if lut.shape != (3, 256):
        raise ValueError(f"lut must be (3, 256), got {lut.shape}")
    out = np.empty(x.shape, np.int8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.apply_code_lut(x.ctypes.data_as(u8p), lut.ctypes.data_as(i8p),
                       out.ctypes.data_as(i8p), x.shape[0],
                       x.shape[2] * x.shape[3])
    return out[0] if chw else out


def _u8ptr(b):
    return ctypes.cast(ctypes.c_char_p(b), ctypes.POINTER(ctypes.c_uint8))


def _f32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _read(path_or_bytes):
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return bytes(path_or_bytes)
    with open(path_or_bytes, "rb") as f:
        return f.read()


def decode_rgb(path_or_bytes):
    """JPEG -> uint8 HWC RGB array (PIL-identical pixels)."""
    lib = load_library()
    buf = _read(path_or_bytes)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.jpeg_shape(_u8ptr(buf), len(buf), ctypes.byref(h),
                        ctypes.byref(w))
    if rc:
        raise ValueError(f"not a decodable JPEG (rc={rc})")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.jpeg_decode_rgb(
        _u8ptr(buf), len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc:
        raise ValueError(f"JPEG decode failed (rc={rc})")
    return out


def decode_preprocess(path_or_bytes, *, input_size=224, crop_pct=0.875,
                      mean=(0.485, 0.456, 0.406),
                      std=(0.229, 0.224, 0.225), fast=False):
    """JPEG -> float32 CHW model input, one C call.  ``fast=True`` decodes
    in the DCT domain near the resample target (libjpeg scale_num/denom) —
    several-fold cheaper on large JPEGs, NOT bit-exact vs the default
    full-decode path."""
    lib = load_library()
    buf = _read(path_or_bytes)
    out = np.empty((3, input_size, input_size), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    size = int(math.floor(input_size / crop_pct))
    fn = lib.jpeg_decode_preprocess_fast if fast \
        else lib.jpeg_decode_preprocess
    rc = fn(_u8ptr(buf), len(buf), _f32ptr(out), size, input_size,
            _f32ptr(mean_a), _f32ptr(std_a))
    if rc:
        raise ValueError(f"JPEG decode failed (rc={rc})")
    return out


def decode_preprocess_u8(path_or_bytes, *, input_size=224, crop_pct=0.875,
                         fast=False):
    """JPEG -> uint8 CHW resized+cropped crop (pre-normalize).  The wire
    format for host->device transfer: 4x fewer bytes than f32, and the
    device-side (x/255 - mean)/std (imagenet.device_normalize) reproduces
    the f32 path bit-exactly."""
    lib = load_library()
    buf = _read(path_or_bytes)
    out = np.empty((3, input_size, input_size), np.uint8)
    size = int(math.floor(input_size / crop_pct))
    rc = lib.jpeg_decode_preprocess_u8(
        _u8ptr(buf), len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size, input_size, int(fast))
    if rc:
        raise ValueError(f"JPEG decode failed (rc={rc})")
    return out


def decode_preprocess_batch_u8(paths_or_bytes, *, input_size=224,
                               crop_pct=0.875, fast=False):
    """List of JPEG paths/bytes -> (N, 3, size, size) uint8 (see
    decode_preprocess_u8); OpenMP across images, GIL released."""
    lib = load_library()
    bufs = [_read(p) for p in paths_or_bytes]
    n = len(bufs)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    srcs = (u8p * n)(*[_u8ptr(b) for b in bufs])
    lens = (ctypes.c_ulong * n)(*[len(b) for b in bufs])
    status = (ctypes.c_int * n)()
    out = np.empty((n, 3, input_size, input_size), np.uint8)
    size = int(math.floor(input_size / crop_pct))
    lib.jpeg_decode_preprocess_batch_u8(
        srcs, lens, n, out.ctypes.data_as(u8p), size, input_size, status,
        int(fast))
    bad = [i for i in range(n) if status[i]]
    if bad:
        raise ValueError(f"JPEG decode failed for batch items {bad[:8]}")
    return out


def decode_preprocess_batch(paths_or_bytes, *, input_size=224,
                            crop_pct=0.875, mean=(0.485, 0.456, 0.406),
                            std=(0.229, 0.224, 0.225), fast=False):
    """List of JPEG paths/bytes -> (N, 3, size, size) float32.  The whole
    batch decodes and preprocesses in native code (OpenMP across images,
    GIL released).  ``fast``: DCT-scaled decode (see decode_preprocess)."""
    lib = load_library()
    bufs = [_read(p) for p in paths_or_bytes]
    n = len(bufs)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    srcs = (u8p * n)(*[_u8ptr(b) for b in bufs])
    lens = (ctypes.c_ulong * n)(*[len(b) for b in bufs])
    status = (ctypes.c_int * n)()
    out = np.empty((n, 3, input_size, input_size), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    size = int(math.floor(input_size / crop_pct))
    lib.jpeg_decode_preprocess_batch(srcs, lens, n, _f32ptr(out), size,
                                     input_size, _f32ptr(mean_a),
                                     _f32ptr(std_a), status, int(fast))
    bad = [i for i in range(n) if status[i]]
    if bad:
        raise ValueError(f"JPEG decode failed for batch items {bad[:8]}")
    return out
