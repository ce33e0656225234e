"""Did the int8-codes residual stream move the throughput sweet spot?

The b256 sweet spot was swept late round 2, right when the codes stream
landed.  Re-sweep deit_small int4 over larger batches on today's chip
(chained timing; ~1 compile per batch size, a few minutes each)."""
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    for b in (192, 256, 320, 384, 512):
        r = bench.bench_vit("deit_small", bits=4, path="int", batch=b,
                            steps=10)
        print(f"deit_small int4 b{b}: {r:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
