#!/usr/bin/env python
"""One-off: re-measure the b1/b8 serving rows with device-side chaining
(bench._chained_throughput(device_chain=True)) on the real chip."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

ROWS = [
    ("deit_small_int4_int_b1",
     dict(model="deit_small", bits=4, path="int", batch=1, steps=100,
          device_chain=True)),
    ("deit_small_int4_int_b8",
     dict(model="deit_small", bits=4, path="int", batch=8, steps=100,
          device_chain=True)),
    ("deit_small_int8_int_b1",
     dict(model="deit_small", bits=8, path="int", batch=1, steps=100,
          device_chain=True)),
    ("deit_small_int4_serve_b1",
     dict(model="deit_small", bits=4, path="serve", batch=1, steps=100,
          device_chain=True)),
    ("swin_tiny_int8_int_b1",
     dict(model="swin_tiny", bits=8, batch=1, steps=60,
          device_chain=True)),
    ("swin_tiny_int8_int_b8",
     dict(model="swin_tiny", bits=8, batch=8, steps=60,
          device_chain=True)),
]

for name, kw in ROWS:
    fn = bench.bench_swin if name.startswith("swin") else bench.bench_vit
    v = fn(**kw)
    b = kw["batch"]
    print(f"{name:32s} {v:8.1f} img/s  {1e3 * b / v:6.3f} ms", flush=True)
