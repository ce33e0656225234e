#!/usr/bin/env python
"""Plot restore-sweep results from restore_<k>_layers.txt files.

Script equivalent of the reference's layerwise_restore_plot.ipynb: parse the
result lines written by layerwise_quant_compare.py and plot Prec@1 against
restored-layer choice.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import re

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

LINE = re.compile(
    r"Restore Index: (nothing remains int4|\[[^\]]*\]), "
    r"Prec@1 ([\d.]+) Prec@5 ([\d.]+)")


def parse(path):
    rows = []
    for line in open(path):
        m = LINE.match(line.strip())
        if not m:
            continue
        idx = m.group(1)
        indices = [] if idx.startswith("nothing") else eval(idx)
        rows.append((indices, float(m.group(2)), float(m.group(3))))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("files", nargs="+", help="restore_<k>_layers.txt files")
    p.add_argument("--out", default="restore_plot.png")
    args = p.parse_args(argv)

    fig = plt.figure(figsize=(9, 5))
    for path in args.files:
        rows = parse(path)
        base = rows[0][1] if rows and not rows[0][0] else None
        xs = [",".join(map(str, r[0])) or "base" for r in rows]
        ys = [r[1] for r in rows]
        plt.plot(range(len(ys)), ys, marker="o", label=path)
        if base is not None:
            plt.axhline(base, ls="--", alpha=0.4)
    plt.xlabel("restore combination")
    plt.ylabel("Prec@1")
    plt.legend()
    plt.savefig(args.out, dpi=200)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
