#!/usr/bin/env python3
"""Row-select probe round 3: pre-broadcast index feeds (no in-kernel reshape
across lanes — that's what asserted/crashed in round 2).

  T1 transp     raw in-kernel (R,C) -> (C,R) transpose rate
  T2 sandwich   y[i,:]=x[q[i],:]: pre-transposed table (C,R), lane-gather with
                full-width idx (C,R), slice to OR, transpose back
  O1 onehot     y = onehot(q) @ x f32, q fed as (OR,128) lane-replicated
  O3 onehotW    one-hot built by where(), not astype
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


def run(name, kernel, tbl_shape, idx_shapes, out_shape):
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
    for arr in idx_shapes:
        ins.append(arr)
        shp = arr.shape[1:]
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
            f"{nrows/t/1e6:9.1f} M rows/s",
            flush=True,
        )
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:12s}: FAIL {type(e).__name__}: {msg}", flush=True)


def t1_kernel(t_ref, o_ref):
    o_ref[0] = t_ref[0].T


def t2_kernel(tT_ref, qf_ref, o_ref):
    z = jnp.take_along_axis(tT_ref[0], qf_ref[0], axis=1)  # (C, R) gather
    o_ref[0] = z[:, :OR].T  # (OR, C)


def o1_kernel(t_ref, qr_ref, o_ref):
    q = qr_ref[0][:, 0:1]  # (OR, 1) via lane slice
    rows = jax.lax.broadcasted_iota(jnp.int32, (OR, R), 1)
    oh = (rows == q).astype(jnp.float32)
    y = jnp.dot(oh, t_ref[0].astype(jnp.float32), preferred_element_type=jnp.float32)
    o_ref[0] = y.astype(jnp.int32)


def o3_kernel(t_ref, qr_ref, o_ref):
    q = qr_ref[0][:, 0:1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (OR, R), 1)
    oh = jnp.where(rows == q, 1.0, 0.0).astype(jnp.float32)
    y = jax.lax.dot_general(
        oh,
        t_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = y.astype(jnp.int32)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}/{dev.device_kind}", flush=True)
    rng = np.random.default_rng(3)
    qv = rng.integers(0, R - 1, (NB, OR), dtype=np.int64).astype(np.int32)
    # full-width (C, R) idx: column j holds q[j] for j < OR, else 0
    qf = np.zeros((NB, C, R), np.int32)
    qf[:, :, :OR] = qv[:, None, :]
    qf_dev = jnp.asarray(qf)
    # (OR, 128) lane-replicated
    qr_dev = jnp.asarray(np.repeat(qv[:, :, None], 128, axis=2))
    run("T1 transp", t1_kernel, (R, C), [], (C, R))
    run("T2 sandwich", t2_kernel, (C, R), [qf_dev], (OR, C))
    run("O1 onehot", o1_kernel, (R, C), [qr_dev], (OR, C))
    run("O3 onehotW", o3_kernel, (R, C), [qr_dev], (OR, C))


if __name__ == "__main__":
    main()
