#!/usr/bin/env python3
"""Row-select probe round 2: transpose-sandwich and one-hot variants.

  T1 transp    raw (R,C)->(C,R) transpose rate in-kernel
  T2 sandwich  y[i,:] = x[q[i],:] via pre-transposed table: lane-gather on
               xT (C,R) with idx (C,OR), then in-kernel transpose to (OR,C)
  T3 sandwich+rot  full unaligned fetch: sandwich + lane rotate (G2)
  O1 onehot256 y = onehot(q) @ x, R=256 (compiler-crash isolation)
  O2 onehotbf  bf16 one-hot matmul R=768
  O3 onehotdg  dot_general int8? fallback probe
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
NB = 256


def run(name, kernel, tbl_shape, idx_shapes, out_shape, note=""):
    rng = np.random.default_rng(2)
    tbl = jnp.asarray(
        rng.integers(0, 250, (NB,) + tbl_shape, dtype=np.int64).astype(np.int32)
    )
    ins = [tbl]
    specs = [
        pl.BlockSpec(
            (1,) + tbl_shape, lambda b: (b,) + (0,) * len(tbl_shape),
            memory_space=pltpu.VMEM,
        )
    ]
    for shp, mx in idx_shapes:
        ins.append(
            jnp.asarray(rng.integers(0, mx, (NB,) + shp, dtype=np.int64).astype(np.int32))
        )
        specs.append(
            pl.BlockSpec(
                (1,) + shp, lambda b: (b,) + (0,) * len(shp), memory_space=pltpu.VMEM
            )
        )
    try:
        f = jax.jit(
            lambda *a: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((NB,) + out_shape, jnp.int32),
                grid=(NB,),
                in_specs=specs,
                out_specs=pl.BlockSpec(
                    (1,) + out_shape, lambda b: (b,) + (0,) * len(out_shape),
                    memory_space=pltpu.VMEM,
                ),
            )(*a)
        )
        t = device_time(lambda: f(*ins), sync=lambda r: r.reshape(-1)[:1])
        nrows = NB * OR
        print(
            f"{name:12s}: {t*1e3:8.2f} ms  {t/NB*1e6:6.2f} us/step  "
            f"{nrows/t/1e6:9.1f} M rows/s {note}",
            flush=True,
        )
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:12s}: FAIL {type(e).__name__}: {msg}", flush=True)


def t1_kernel(t_ref, o_ref):
    o_ref[0] = t_ref[0].T[:, :C]


def t2_kernel(tT_ref, q_ref, o_ref):
    # tT (C, R) pre-transposed; q (8, OR/8) -> (OR,)
    qv = q_ref[0].reshape(1, OR)
    z = jnp.take_along_axis(tT_ref[0], jnp.broadcast_to(qv, (C, OR)), axis=1)
    o_ref[0] = z.T  # (OR, C)


def t3_kernel(tT_ref, q_ref, sh_ref, o_ref):
    qv = q_ref[0].reshape(1, OR)
    Q = jnp.broadcast_to(qv, (C, OR))
    a = jnp.take_along_axis(tT_ref[0], Q, axis=1).T  # row q
    b = jnp.take_along_axis(
        tT_ref[0], jnp.minimum(Q + 1, R - 1), axis=1
    ).T  # row q+1
    lane = jax.lax.broadcasted_iota(jnp.int32, (OR, C), 1)
    t = lane + sh_ref[0].reshape(OR, 1)
    idx = t % C
    ga = jnp.take_along_axis(a, idx, axis=1)
    gb = jnp.take_along_axis(b, idx, axis=1)
    o_ref[0] = jnp.where(t < C, ga, gb)


def o1_kernel(t_ref, q_ref, o_ref):
    R2 = 256
    rows = jax.lax.broadcasted_iota(jnp.int32, (OR, R2), 1)
    oh = (rows == q_ref[0].reshape(OR, 1)).astype(jnp.float32)
    y = jnp.dot(
        oh, t_ref[0, :R2, :].astype(jnp.float32), preferred_element_type=jnp.float32
    )
    o_ref[0] = y.astype(jnp.int32)


def o2_kernel(t_ref, q_ref, o_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, (OR, R), 1)
    oh = (rows == q_ref[0].reshape(OR, 1)).astype(jnp.bfloat16)
    y = jnp.dot(
        oh, t_ref[0].astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    o_ref[0] = y.astype(jnp.int32)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}/{dev.device_kind}", flush=True)
    i8 = ((8, OR // 8), R - 1)
    run("T1 transp", t1_kernel, (R, C), [], (C, R))
    run("T2 sandwich", t2_kernel, (C, R), [i8], (OR, C))
    run("T3 sand+rot", t3_kernel, (C, R), [i8, ((8, OR // 8), C)], (OR, C))
    run("O1 onehot256", o1_kernel, (R, C), [((8, OR // 8), 255)], (OR, C))
    run("O2 onehotbf", o2_kernel, (R, C), [i8], (OR, C))


if __name__ == "__main__":
    main()
