#!/usr/bin/env python3
"""Corpus throughput/ratio comparison harness (reference benches/ +
benchmarks/src/main.rs analog): block and frame formats, host and device
engines, across the in-repo corpora. Prints a table; does not gate.

Usage: python benchmarks/compare.py [--device] [--iters N]

Without --device only the host (native C++) engine runs — suitable for any
machine. With --device the TPU kernels run too (first call per shape pays a
remote compile on the dev setup; see PERF.md).
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from lz4_flex_tpu import block, frame

CORPORA = {
    "1k": "compression_1k.txt",
    "34k": "compression_34k.txt",
    "65k": "compression_65k.txt",
    "66k_JSON": "compression_66k_JSON.txt",
}
BENCH_DIR = pathlib.Path("/root/reference/benches")


def timeit(fn, iters):
    fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    rows = []
    for name, fname in CORPORA.items():
        p = BENCH_DIR / fname
        if not p.exists():
            continue
        data = p.read_bytes()
        n = len(data)
        comp = block.compress(data)
        t_c = timeit(lambda: block.compress(data), args.iters)
        t_d = timeit(lambda: block.decompress(comp, n), args.iters)
        rows.append(
            (f"block/host/{name}", n / t_c / 2**20, n / t_d / 2**20, len(comp) / n)
        )
        fcomp = frame.compress(data)
        t_fc = timeit(lambda: frame.compress(data), args.iters)
        t_fd = timeit(lambda: frame.decompress(fcomp), args.iters)
        rows.append(
            (f"frame/host/{name}", n / t_fc / 2**20, n / t_fd / 2**20, len(fcomp) / n)
        )
        if args.device:
            from lz4_flex_tpu.ops import compress_block_device, decode_block_device

            dcomp = compress_block_device(data, verify=False)
            t_dc = timeit(
                lambda: compress_block_device(data, verify=False), args.iters
            )
            t_dd = timeit(lambda: decode_block_device(comp, n), args.iters)
            rows.append(
                (
                    f"block/device/{name}",
                    n / t_dc / 2**20,
                    n / t_dd / 2**20,
                    len(dcomp) / n,
                )
            )

    if args.device:
        print(
            "note: device rows at these corpus sizes (1-66 KB) are bound by "
            "per-call dispatch latency\n(the axon dev tunnel adds ~10-30 ms "
            "RPC per call); bench.py measures the big-buffer\nsteady state "
            "the engines are built for.",
        )
    print(f"{'config':<24} {'comp MiB/s':>12} {'decomp MiB/s':>13} {'ratio':>8}")
    for cfg, c, d, r in rows:
        print(f"{cfg:<24} {c:>12.0f} {d:>13.0f} {r:>8.4f}")


if __name__ == "__main__":
    main()
