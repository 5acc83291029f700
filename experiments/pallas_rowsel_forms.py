#!/usr/bin/env python3
"""Round-2 probe: per-row dynamic ROW selection from a VMEM table in Pallas.

The ring-decoder design needs, per output row i, a full 128-lane row fetched
from a VMEM ring at a row index q[i] computed at runtime.  Forms:

  H1 tala0    y = take_along_axis(x, Q, axis=0), Q (OR,C) = q[i] broadcast
  H2 take0    y = jnp.take(x, qvec, axis=0)
  H3 onehot   y = onehot(q) @ x on the MXU (f32, exact for bytes)
  H4 onehot2  fused: two one-hot matmuls (row q and q+1) + lane rotate
  H5 matmul   raw small-matmul rate (256,768)@(768,128) f32, no gather logic
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


R, C = 768, 128
OR = 256
NB = 256  # grid steps ~ tiles


def run(name, kernel, extra_in=None, out_shape=(OR, C), out_dtype=jnp.int32):
    rng = np.random.default_rng(2)
    tbl = jnp.asarray(rng.integers(0, 250, (NB, R, C), dtype=np.int64).astype(np.int32))
    q = jnp.asarray(
        rng.integers(0, R - 1, (NB, 8, OR // 8), dtype=np.int64).astype(np.int32)
    )
    ins = [tbl, q]
    specs = [
        pl.BlockSpec((1, R, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, OR // 8), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    if extra_in is not None:
        ins.append(extra_in)
        specs.append(
            pl.BlockSpec((1, 8, OR // 8), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        )
    try:
        f = jax.jit(
            lambda *a: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((NB,) + out_shape, out_dtype),
                grid=(NB,),
                in_specs=specs,
                out_specs=pl.BlockSpec(
                    (1,) + out_shape,
                    lambda b: (b,) + (0,) * len(out_shape),
                    memory_space=pltpu.VMEM,
                ),
            )(*a)
        )
        t = device_time(lambda: f(*ins), sync=lambda r: r.reshape(-1)[:1])
        nrows = NB * OR
        print(
            f"{name:10s}: {t*1e3:8.2f} ms  {nrows/t/1e6:9.1f} M rows/s  "
            f"{nrows*C/t/1e6:9.0f} M elem/s",
            flush=True,
        )
    except Exception as e:
        msg = str(e).split("\n")[0][:150]
        print(f"{name:10s}: FAIL {type(e).__name__}: {msg}", flush=True)


def h1_kernel(t_ref, q_ref, o_ref):
    Q = jnp.broadcast_to(q_ref[0].reshape(OR, 1), (OR, C))
    o_ref[0] = jnp.take_along_axis(t_ref[0], Q, axis=0)


def h2_kernel(t_ref, q_ref, o_ref):
    o_ref[0] = jnp.take(t_ref[0], q_ref[0].reshape(OR), axis=0)


def h3_kernel(t_ref, q_ref, o_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, (OR, R), 1)
    oh = (rows == q_ref[0].reshape(OR, 1)).astype(jnp.float32)
    y = jnp.dot(oh, t_ref[0].astype(jnp.float32), preferred_element_type=jnp.float32)
    o_ref[0] = y.astype(jnp.int32)


def h4_kernel(t_ref, q_ref, sh_ref, o_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, (OR, R), 1)
    qv = q_ref[0].reshape(OR, 1)
    tf = t_ref[0].astype(jnp.float32)
    a = jnp.dot(
        (rows == qv).astype(jnp.float32), tf, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    b = jnp.dot(
        (rows == qv + 1).astype(jnp.float32), tf, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (OR, C), 1)
    t = lane + sh_ref[0].reshape(OR, 1)
    pick_a = t < C
    idx = t % C
    ga = jnp.take_along_axis(a, idx, axis=1)
    gb = jnp.take_along_axis(b, idx, axis=1)
    o_ref[0] = jnp.where(pick_a, ga, gb)


def h5_kernel(t_ref, q_ref, o_ref):
    oh = (t_ref[0, :OR, :].astype(jnp.float32) % 7.0)  # junk (OR,C)... need (OR,R)
    # raw matmul rate: reuse table as both operands
    a = t_ref[0, :OR, :].astype(jnp.float32)  # (OR, C)
    b = t_ref[0].astype(jnp.float32).T[:C, :C]  # (C, C)
    y = jnp.dot(a, b, preferred_element_type=jnp.float32)
    o_ref[0] = y.astype(jnp.int32)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}/{dev.device_kind}", flush=True)
    rng = np.random.default_rng(3)
    sh = jnp.asarray(rng.integers(0, C, (NB, 8, OR // 8), dtype=np.int64).astype(np.int32))
    run("H1 tala0", h1_kernel)
    run("H2 take0", h2_kernel)
    run("H3 onehot", h3_kernel)
    run("H4 onehot2", h4_kernel, extra_in=sh)
    run("H5 matmul", h5_kernel)


if __name__ == "__main__":
    main()
