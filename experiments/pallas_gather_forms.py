#!/usr/bin/env python3
"""Round-2 probe: general gather rates INSIDE Pallas kernels (VMEM-resident).

If Mosaic lowers arbitrary gathers from VMEM at vector rates, the decode
kernel can walk output tiles sequentially with the 64 KiB LZ4 window
resident in VMEM and do all chain-resolution rounds on-chip.  Probes:

  G1 flat1d   y = x.reshape(-1)[idx]           arbitrary 1-D gather
  G2 lane     y[i,l] = x[i, idx[i,l]]          within-row lane gather (known ~750M)
  G3 rowsel   y[i,:] = x[q[i], :]              whole-row gather by row index
  G4 2d       y[i,l] = x[q[i,l], m[i,l]]       full 2-D gather
  G5 loop_ds  fori over rows, dynamic_slice    per-row dynamic slice read
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


R, C = 1024, 128  # 128K elements (512KB int32) table per grid step
NB = 64  # grid steps
OR = 512  # output rows per grid step


def probe(name, kernel, idx_shape, idx_max, out_shape):
    rng = np.random.default_rng(1)
    tbl = jnp.asarray(
        rng.integers(0, 2**31, (NB, R, C), dtype=np.int64).astype(np.int32)
    )
    idx = jnp.asarray(
        rng.integers(0, idx_max, (NB,) + idx_shape, dtype=np.int64).astype(np.int32)
    )
    try:
        f = jax.jit(
            lambda t, i: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((NB,) + out_shape, jnp.int32),
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec(
                        (1, R, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(
                        (1,) + idx_shape,
                        lambda b: (b,) + (0,) * len(idx_shape),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1,) + out_shape,
                    lambda b: (b,) + (0,) * len(out_shape),
                    memory_space=pltpu.VMEM,
                ),
            )(t, i)
        )
        t = device_time(lambda: f(tbl, idx), sync=lambda r: r.reshape(-1)[:1])
        n = NB * int(np.prod(idx_shape if name != "G3 rowsel" else (idx_shape[0]*C,)))
        print(f"{name:10s}: {t*1e3:8.2f} ms  {n/t/1e6:9.1f} M elem/s", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name:10s}: FAIL {type(e).__name__}: {msg}", flush=True)


def g1_kernel(t_ref, i_ref, o_ref):
    flat = t_ref[0].reshape(-1)
    o_ref[0] = flat[i_ref[0]]


def g2_kernel(t_ref, i_ref, o_ref):
    # within-row gather on the first OR rows
    o_ref[0] = jnp.take_along_axis(t_ref[0, :OR, :], i_ref[0], axis=1)


def g3_kernel(t_ref, i_ref, o_ref):
    o_ref[0] = t_ref[0][i_ref[0, :, 0]]


def g4_kernel(t_ref, i_ref, o_ref):
    q = i_ref[0] // C
    m = i_ref[0] % C
    o_ref[0] = t_ref[0][q, m]


def g5_kernel(t_ref, i_ref, o_ref):
    def body(r, _):
        start = i_ref[0, r, 0]
        o_ref[0, r, :] = t_ref[0][pl.ds(start, 1), :][0]
        return 0

    jax.lax.fori_loop(0, OR, body, 0)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}/{dev.device_kind}", flush=True)
    probe("G1 flat1d", g1_kernel, (OR, C), R * C, (OR, C))
    probe("G2 lane", g2_kernel, (OR, C), C, (OR, C))
    probe("G3 rowsel", g3_kernel, (OR, C), R, (OR, C))
    probe("G4 2d", g4_kernel, (OR, C), R * C, (OR, C))
    probe("G5 loop_ds", g5_kernel, (OR, C), R, (OR, C))


if __name__ == "__main__":
    main()
