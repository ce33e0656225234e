"""ImageNet data pipeline with torchvision-parity preprocessing.

Rebuild of the reference's loader stack (test_quant.py:115-144,504-534):
Resize(shorter side = input/crop_pct, bicubic) -> CenterCrop(input) ->
ToTensor -> Normalize, implemented directly on PIL (torchvision semantics,
validated against PIL's resize convention) and batched with a thread pool.
Output layout is NCHW float32 to match the model input contract.
"""
from __future__ import annotations

import concurrent.futures as cf
import math
import os

import numpy as np
from PIL import Image

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".webp")


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def device_normalize(x, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """On-device ToTensor+Normalize for uint8 NCHW (or CHW) batches.

    The eval pipeline's natural wire format is the uint8 crop (the value
    set right after Resize+CenterCrop, before ToTensor): shipping it
    host->device moves 4x fewer bytes than f32 pixels.  Bit-exactness vs
    the host path matters (a 1-ulp input drift flips ~1 qact_input code
    per ~2^23 elements), and computing (x/255 - mean)/std under jit is NOT
    exact — XLA's algebraic simplifier rewrites the constant divisions
    into reciprocal multiplies (measured: 1-2 ulp).  Since the uint8
    domain has only 256 values/channel, we instead gather from a
    host-precomputed f32 LUT (the same 768 values native/preproc.cpp
    computes) — exact by construction.  Non-uint8 inputs pass through
    untouched, so jitted forwards can prepend this unconditionally (dtype
    is a static trace property)."""
    import jax.numpy as jnp

    if x.dtype != jnp.uint8:
        return x
    v = np.arange(256, dtype=np.float32)
    mean32 = np.asarray(mean, np.float32).reshape(-1)
    std32 = np.asarray(std, np.float32).reshape(-1)
    lut = np.stack([(v / np.float32(255.0) - m) / s
                    for m, s in zip(mean32, std32)])  # (3, 256)
    tb = jnp.asarray(lut)
    xi = x.astype(jnp.int32)
    if x.ndim == 3:
        return jnp.stack([tb[c][xi[c]] for c in range(3)], 0)
    return jnp.stack([tb[c][xi[:, c]] for c in range(3)], 1)


def input_code_lut(scale, zero_point, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                   qmin=-128, qmax=127):
    """(3, 256) int8 LUT composing ToTensor+Normalize with the model's
    input fake-quant: ``lut[c][v]`` is the int8 residual-stream CODE the
    integer path derives for a uint8 pixel ``v`` in channel ``c``
    (``vit_int._embed_front``: ``_requant_i8(fake_quant(normalize(v)))``).

    Why this exists: the u8 wire's on-device LUT normalize is a 12.8M-
    element gather at b256 — measured at ~322 ms/step on the round-5
    backend (scripts/ab_depth_bisect.py: the entire misattributed
    'dispatch wire tax' is this op).  Since the model immediately
    quantizes its input anyway, the whole u8 -> f32 -> code chain
    collapses into one 768-entry table applied HOST-side at memory speed
    (``encode_input``), shipping the SAME byte count (1 byte/pixel) and
    deleting the device gather outright.

    Built in f32 numpy with the exact op sequence of the device path —
    LUT normalize (this module), then quantize/round/clip and the int
    path's requant (ops/quant.py:quantize, vit_int._requant_i8) — so the
    codes are bit-identical to the u8-wire path by construction
    (asserted exhaustively over all 768 values in
    tests/test_codes_wire.py)."""
    v = np.arange(256, dtype=np.float32)
    mean32 = np.asarray(mean, np.float32).reshape(-1)
    std32 = np.asarray(std, np.float32).reshape(-1)
    norm = np.stack([(v / np.float32(255.0) - m) / s
                     for m, s in zip(mean32, std32)])  # (3, 256) f32
    scale = np.float32(np.asarray(scale).reshape(()))
    zp = np.float32(np.asarray(zero_point).reshape(()))
    # fake-quant to the input grid (``qmin``/``qmax`` = the qact_input
    # BitType's bounds — int8 in the committed drivers)
    q = np.clip(np.round(norm / scale + zp), qmin, qmax)
    xq = (q - zp) * scale
    # the integer path's requant back to codes (vit_int._requant_i8)
    codes = np.clip(np.round(xq / scale), -128, 127)
    return codes.astype(np.int8)


def encode_input(x, lut):
    """Apply ``input_code_lut`` host-side: uint8 NCHW (or CHW) batch ->
    int8 input codes, same shape.  Prefers the native one-pass LUT
    (native/preproc.cpp apply_code_lut, ~memory speed); numpy
    fancy-indexing fallback when the native library can't build.  Either
    way vastly cheaper than the ~322 ms/step device gather it replaces."""
    x = np.asarray(x)
    if x.dtype != np.uint8:
        raise TypeError(f"encode_input expects uint8 pixels, got {x.dtype}")
    try:
        from .native_decode import apply_code_lut

        return apply_code_lut(x, lut)
    except Exception:  # no g++/libjpeg: the numpy path is bit-identical
        if x.ndim == 3:
            return np.stack([lut[c][x[c]] for c in range(3)], 0)
        return np.stack([lut[c][x[:, c]] for c in range(3)], 1)


class CodesLoader:
    """Wrap a (images, labels) loader so images arrive as int8 input
    codes (``encode_input`` applied on the host thread).  Drop-in for
    engine.validate / DevicePrefetcher; pairs with the int forward's
    int8 ingest (vit_int/swin_int dtype dispatch)."""

    def __init__(self, loader, lut):
        self.loader, self.lut = loader, np.asarray(lut)

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for imgs, labels in self.loader:
            yield encode_input(imgs, self.lut), labels


def build_transform(input_size=224, interpolation="bicubic",
                    mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                    crop_pct=0.875, normalize=True):
    """Returns fn(PIL.Image) -> float32 CHW array, matching
    test_quant.py:504-534 / torchvision Resize+CenterCrop+ToTensor+Normalize.
    ``normalize=False`` stops at the uint8 CHW crop (the host->device wire
    format; pair with device_normalize)."""
    size = int(math.floor(input_size / crop_pct))
    resample = {
        "bicubic": Image.BICUBIC,
        "lanczos": Image.LANCZOS,
        "hamming": Image.HAMMING,
        "bilinear": Image.BILINEAR,
    }[interpolation]
    mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
    std = np.asarray(std, np.float32).reshape(3, 1, 1)

    def transform(img: Image.Image):
        img = img.convert("RGB")
        w, h = img.size
        # torchvision Resize(int): scale shorter side to `size`, keep ratio.
        # The long side TRUNCATES (int(size * long / short), torchvision
        # functional.resize) — rounding diverges by 1px on some aspect
        # ratios, which moves the crop window and flips occasional top-1s.
        if w <= h:
            ow, oh = size, max(1, int(size * h / w))
        else:
            oh, ow = size, max(1, int(size * w / h))
        if (ow, oh) != (w, h):
            img = img.resize((ow, oh), resample)
        # CenterCrop(input_size) — torchvision rounding convention
        left = int(round((ow - input_size) / 2.0))
        top = int(round((oh - input_size) / 2.0))
        img = img.crop((left, top, left + input_size, top + input_size))
        arr = np.asarray(img, np.uint8).transpose(2, 0, 1)  # HWC -> CHW
        if not normalize:
            return arr
        return (arr.astype(np.float32) / 255.0 - mean) / std

    # advertised so consumers (NativeJpegLoader) can derive/validate their
    # preprocessing against the dataset's transform instead of trusting
    # callers to pass matching kwargs
    transform.params = dict(input_size=input_size, interpolation=interpolation,
                            mean=tuple(np.asarray(mean).reshape(-1).tolist()),
                            std=tuple(np.asarray(std).reshape(-1).tolist()),
                            crop_pct=crop_pct, normalize=normalize)
    return transform


class ImageFolder:
    """Minimal torchvision.datasets.ImageFolder equivalent: classes =
    sorted subdirectories, samples sorted within class."""

    def __init__(self, root, transform):
        self.root = root
        self.transform = transform
        self.classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples = []
        for c in self.classes:
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append((os.path.join(cdir, fn),
                                         self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        path, label = self.samples[i]
        with Image.open(path) as img:
            return self.transform(img), label


class DataLoader:
    """Threaded batcher: yields (images NCHW float32, labels int32) numpy
    batches.  Decode/preprocess runs in a thread pool and prefetches the
    next batch while the accelerator consumes the current one."""

    def __init__(self, dataset, batch_size, shuffle=False, num_workers=16,
                 drop_last=False, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0  # advances per __iter__ for fresh epoch shuffles

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else math.ceil(
            n / self.batch_size)

    def _load(self, idx):
        img, label = self.dataset[idx]
        return img, label

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # fresh shuffle per epoch (deterministic in (seed, epoch)) — the
            # reference reshuffles on every get_dataset call / epoch
            # (dataset_utility.py:45-80, torch DataLoader shuffle=True);
            # reusing one fixed seed would make every epoch identical and
            # degenerate multi-iteration CKA/DDV averages to one repeated
            # epoch.  Epoch 0 keeps the legacy rng(seed) stream so
            # single-epoch consumers (calibration batch choice) see the
            # exact order previous rounds pinned.
            key = self.seed if self._epoch == 0 else (self.seed, self._epoch)
            np.random.default_rng(key).shuffle(order)
            self._epoch += 1
        nb = len(self)
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            def submit(bi):
                idxs = order[bi * self.batch_size:(bi + 1) * self.batch_size]
                return [pool.submit(self._load, i) for i in idxs]

            pending = submit(0) if nb else None
            for bi in range(nb):
                futs = pending
                pending = submit(bi + 1) if bi + 1 < nb else None
                out = [f.result() for f in futs]
                imgs = np.stack([o[0] for o in out])
                labels = np.asarray([o[1] for o in out], np.int32)
                yield imgs, labels


class NativeJpegLoader:
    """Native-pipeline DataLoader: each batch of JPEGs decodes AND
    preprocesses in one C call (libjpeg JDCT_ISLOW decode — PIL-identical
    pixels — into the bit-exact-Pillow resample/crop/normalize of
    native/preproc.cpp; OpenMP across images, GIL released), with a
    background thread preparing batch i+1 while the accelerator consumes
    batch i.  Non-JPEG samples fall back to the dataset's PIL transform,
    so outputs are float-identical to DataLoader's in every case
    (tests/test_native_decode.py)."""

    def __init__(self, dataset: ImageFolder, batch_size, drop_last=False,
                 input_size=None, crop_pct=None, mean=None, std=None,
                 fast=False, emit="f32", code_lut=None):
        from . import native_decode

        native_decode.load_library()  # build/verify up front
        self._nd = native_decode
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        # fast=True: DCT-scaled decode near the resample target — several-
        # fold cheaper host-side, NOT bit-exact vs the PIL/exact path (and
        # PIL fallback items in a mixed batch stay exact); keep the default
        # for parity runs
        self.fast = bool(fast)
        # emit="u8": yield the uint8 CHW crop (pre-normalize) — the 4x-
        # smaller host->device wire format; the consumer applies
        # device_normalize (bit-exact vs f32 emit, tests/test_u8_pipeline.py)
        # emit="codes": the uint8 crop through ``code_lut`` (IntModel.
        # input_lut) — int8 qact_input codes, same wire bytes as u8 but
        # ZERO on-device ingest (the codes wire; tests/test_codes_wire.py)
        if emit not in ("f32", "u8", "codes"):
            raise ValueError(
                f"emit must be 'f32', 'u8' or 'codes', got {emit!r}")
        if (emit == "codes") != (code_lut is not None):
            raise ValueError("emit='codes' requires code_lut (and code_lut "
                             "requires emit='codes')")
        self.code_lut = None if code_lut is None else \
            np.ascontiguousarray(code_lut, np.int8)
        self.emit = emit
        # Derive preprocessing from the dataset's transform when it
        # advertises its params (build_transform does), so native items and
        # PIL-fallback items in one batch can never be preprocessed
        # differently; explicit kwargs must agree with the transform.
        tf_params = getattr(getattr(dataset, "transform", None), "params", None)
        defaults = dict(input_size=224, crop_pct=0.875,
                        mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
        explicit = dict(input_size=input_size, crop_pct=crop_pct,
                        mean=mean, std=std)
        self.kw = {}
        for k, v in explicit.items():
            if v is None:
                v = tf_params[k] if tf_params is not None else defaults[k]
            if tf_params is not None and \
                    not np.allclose(np.asarray(v, np.float64),
                                    np.asarray(tf_params[k], np.float64)):
                raise ValueError(
                    f"NativeJpegLoader {k}={v!r} disagrees with the "
                    f"dataset transform's {k}={tf_params[k]!r}; native and "
                    "PIL-fallback items would be preprocessed differently")
            self.kw[k] = v
        if tf_params is not None and tf_params["interpolation"] != "bicubic":
            raise ValueError(
                "the native pipeline implements bicubic resampling only; "
                f"dataset transform uses {tf_params['interpolation']!r}")
        if emit == "f32" and tf_params is not None \
                and not tf_params.get("normalize", True):
            raise ValueError(
                "emit='f32' normalizes, but the dataset transform has "
                "normalize=False — PIL-fallback items would stay uint8; "
                "use emit='u8' with an un-normalized consumer instead")

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else math.ceil(
            n / self.batch_size)

    def _pil_fallback(self, idx):
        if self.emit == "f32":
            return self.dataset[idx][0]
        # u8/codes emit: the dataset transform normalizes; rebuild the
        # same geometry stopping at the uint8 crop (codes batches apply
        # the LUT after assembly in _make)
        if not hasattr(self, "_u8_transform"):
            self._u8_transform = build_transform(
                input_size=self.kw["input_size"], crop_pct=self.kw["crop_pct"],
                normalize=False)
        path = self.dataset.samples[idx][0]
        with Image.open(path) as img:
            return self._u8_transform(img)

    def _make(self, idxs):
        samples = [self.dataset.samples[i] for i in idxs]
        labels = np.asarray([s[1] for s in samples], np.int32)
        paths = [s[0] for s in samples]
        if self.emit in ("u8", "codes"):
            geo = dict(input_size=self.kw["input_size"],
                       crop_pct=self.kw["crop_pct"])
            batch_fn = lambda ps: self._nd.decode_preprocess_batch_u8(
                ps, fast=self.fast, **geo)
            item_fn = lambda p: self._nd.decode_preprocess_u8(
                p, fast=self.fast, **geo)
        else:
            batch_fn = lambda ps: self._nd.decode_preprocess_batch(
                ps, fast=self.fast, **self.kw)
            item_fn = lambda p: self._nd.decode_preprocess(
                p, fast=self.fast, **self.kw)
        try:
            imgs = batch_fn(paths)
        except ValueError:
            # mixed/broken content: per-item native with PIL fallback
            outs = []
            for i, p in zip(idxs, paths):
                try:
                    outs.append(item_fn(p))
                except ValueError:
                    outs.append(self._pil_fallback(i))
            imgs = np.stack(outs)
        if self.emit == "codes":
            imgs = self._nd.apply_code_lut(imgs, self.code_lut)
        return imgs, labels

    def __iter__(self):
        nb = len(self)
        order = np.arange(len(self.dataset))
        with cf.ThreadPoolExecutor(1) as pool:
            def submit(bi):
                idxs = order[bi * self.batch_size:(bi + 1) * self.batch_size]
                return pool.submit(self._make, idxs)

            pending = submit(0) if nb else None
            for bi in range(nb):
                fut = pending
                pending = submit(bi + 1) if bi + 1 < nb else None
                yield fut.result()


class DevicePrefetcher:
    """Pipeline the host->device transfer: a background thread pulls
    batches from ``loader`` and issues ``jax.device_put`` immediately, so
    the wire transfer of batch i+1 (and i+2, up to ``depth``) overlaps the
    decode of later batches AND the device compute of batch i.  Without
    it, the eval loop's ``jnp.asarray(imgs)`` serializes transfer with
    both (the round-3 e2e gap: transfers ride the same tunnel RPC channel
    as dispatches, one at a time).

    Yields ``(device_images, labels)`` in loader order; the images are
    already committed device arrays, safe to pass straight into a jitted
    forward.  ``depth`` bounds device memory (depth batches resident
    beyond the one being consumed).  ``sharding``: optional
    jax.sharding.Sharding for the image transfer (e.g. the dp batch
    sharding) so mesh runs land batches in their final layout instead of
    committing to device 0 and re-sharding on entry."""

    def __init__(self, loader, depth=2, sharding=None):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self.loader = loader
        self.depth = depth
        self.sharding = sharding

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        import jax

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _END = object()
        stop = threading.Event()

        def put(item):
            # bounded put that aborts if the consumer walked away early
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def feeder():
            try:
                for imgs, labels in self.loader:
                    # device_put returns as soon as the transfer is
                    # enqueued; blocking happens in the consumer only if
                    # it outruns the wire
                    try:
                        dev = jax.device_put(imgs, self.sharding)
                    except ValueError:
                        # ragged final batch not divisible by the mesh's
                        # batch shards: ship unsharded; the engine's
                        # _dp_pad path re-lays it out as it always did
                        dev = jax.device_put(imgs)
                    if not put((dev, labels)):
                        return
                put(_END)
            except BaseException as e:  # surface loader errors in consumer
                put(e)

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            t.join(timeout=5.0)
