#!/usr/bin/env python3
"""Round-2 probe: which unaligned-row-gather formulation is fast on TPU?

expand2's `_row_gather` (vmap of 1-D dynamic_slice) was measured scalar on
the real chip.  Candidates, all producing (N, w)-shaped reads at arbitrary
starts from a big word buffer:

  A vmap_ds      vmap(dynamic_slice)           — round-1 form (baseline)
  B aligned2d    tbl2d[idx] whole-row gather   — the measured-fast XLA form
  C pair+rolls   2 aligned rows + static-roll select extraction
  D pair+tala    2 aligned rows + take_along_axis extraction
  E row_scatter  arr.at[idx].set(rows) row-granular scatter (write side)
  F pallas_rot   per-row variable rotate as a Pallas kernel (128 lanes)

Rates decide the production pull kernel's shape.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

_FETCH = None


def device_time(fn, sync, iters=10, warmup=2):
    global _FETCH
    r = None
    for _ in range(warmup):
        r = fn()
    np.asarray(sync(r))
    if _FETCH is None:
        lats = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(sync(r))
            lats.append(time.perf_counter() - t0)
        _FETCH = float(np.median(lats))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    np.asarray(sync(r))
    return max((time.perf_counter() - t0 - _FETCH) / iters, 1e-9)


def report(name, t, n_rows, w):
    print(
        f"{name:14s} w={w:3d} N={n_rows//1000}k: {t*1e3:8.2f} ms  "
        f"{n_rows/t/1e6:8.1f} M rows/s  {n_rows*w/t/1e6:9.0f} M elem/s",
        flush=True,
    )


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}/{dev.device_kind}", flush=True)
    rng = np.random.default_rng(0)
    NW = 2_621_440  # 10 MB of u32 words
    N = 1_048_576
    tbl = jnp.asarray(rng.integers(0, 2**31, NW, dtype=np.int64).astype(np.int32))
    starts = jnp.asarray(rng.integers(0, NW - 64, N, dtype=np.int64).astype(np.int32))

    # A: vmap dynamic_slice (current _row_gather)
    for w in (4, 8):
        f = jax.jit(
            lambda s, w=w: jax.vmap(
                lambda b: jax.lax.dynamic_slice(tbl, (b,), (w,))
            )(s)
        )
        t = device_time(lambda: f(starts), sync=lambda r: r[:1, :1])
        report("A vmap_ds", t, N, w)

    # B: aligned whole-row 2-D gather
    for w in (4, 8, 16, 32):
        tbl2 = tbl[: (NW // w) * w].reshape(-1, w)
        ridx = starts % tbl2.shape[0]
        f = jax.jit(lambda i, t2=tbl2: t2[i])
        t = device_time(lambda: f(ridx), sync=lambda r: r[:1, :1])
        report("B aligned2d", t, N, w)

    # C: unaligned via 2 aligned rows + static-roll select
    for w in (4, 8, 16):
        R = NW // w
        tbl2 = tbl[: R * w].reshape(R, w)

        def unaligned_rolls(s, tbl2=tbl2, w=w, R=R):
            q = s // w
            sh = s % w
            a = tbl2[jnp.clip(q, 0, R - 1)]
            b = tbl2[jnp.clip(q + 1, 0, R - 1)]
            rows2 = jnp.concatenate([a, b], axis=1)  # (N, 2w)
            out = jnp.zeros((s.shape[0], w), jnp.int32)
            for t_ in range(w):
                rolled = rows2[:, t_ : t_ + w]
                out = jnp.where((sh == t_)[:, None], rolled, out)
            return out

        f = jax.jit(unaligned_rolls)
        t = device_time(lambda: f(starts), sync=lambda r: r[:1, :1])
        report("C pair+rolls", t, N, w)

    # D: unaligned via 2 aligned rows + take_along_axis
    for w in (8,):
        R = NW // w
        tbl2 = tbl[: R * w].reshape(R, w)

        def unaligned_tala(s, tbl2=tbl2, w=w, R=R):
            q = s // w
            sh = s % w
            a = tbl2[jnp.clip(q, 0, R - 1)]
            b = tbl2[jnp.clip(q + 1, 0, R - 1)]
            rows2 = jnp.concatenate([a, b], axis=1)
            cols = sh[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]
            return jnp.take_along_axis(rows2, cols, axis=1)

        f = jax.jit(unaligned_tala)
        t = device_time(lambda: f(starts), sync=lambda r: r[:1, :1])
        report("D pair+tala", t, N, w)

    # E: row-granular scatter (write side of a wavefront materializer)
    for w in (8, 16):
        R = NW // w
        rows = jnp.asarray(
            rng.integers(0, 2**31, (N, w), dtype=np.int64).astype(np.int32)
        )
        ridx = starts % R
        dst = jnp.zeros((R, w), jnp.int32)
        f = jax.jit(lambda d, i, r: d.at[i].set(r))
        t = device_time(lambda: f(dst, ridx, rows), sync=lambda r: r[:1, :1])
        report("E row_scatter", t, N, w)

    # F: Pallas within-row variable rotate, (N,128) int32 rows
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        NP_ = 131_072
        rows128 = jnp.asarray(
            rng.integers(0, 2**31, (NP_, 128), dtype=np.int64).astype(np.int32)
        )
        shifts = jnp.asarray(rng.integers(0, 128, NP_, dtype=np.int64).astype(np.int32))

        BLK = 1024

        def rot_kernel(sh_ref, x_ref, o_ref):
            lane = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
            idx = (lane + sh_ref[:].reshape(BLK, 1)) % 128
            o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=1)

        f = jax.jit(
            lambda sh, x: pl.pallas_call(
                rot_kernel,
                out_shape=jax.ShapeDtypeStruct((NP_, 128), jnp.int32),
                grid=(NP_ // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            )(sh, x)
        )
        t = device_time(lambda: f(shifts, rows128), sync=lambda r: r[:1, :1])
        report("F pallas_rot", t, NP_, 128)
    except Exception as e:
        print(f"F pallas_rot failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
