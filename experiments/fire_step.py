#!/usr/bin/env python3
"""Microbenchmark the ring-decoder fire step at production shapes.

One fire = apply one record plane (<=1 record per output row) to the tile:
  3 broadcast matmuls (TR,SMAX)@(SMAX,128) to splat per-row fields,
  2 one-hot row pulls (TR,NT)@(NT,128) from the VMEM table,
  2 within-row take_along_axis gathers + wrap select,
  masked merge into the tile region of the table.

Timing: a kernel that runs NF fires per grid step; us/fire = step/NF.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 256
WR = 512
LW = 544
NT = WR + TR + LW  # 1312
SMAX = 96
NF = 48
NB = 32

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


def make_kernel(tbl_dtype):
    def kernel(f0_ref, f1_ref, f2_ref, tbl_ref, o_ref, acc_ref):
        acc_ref[...] = tbl_ref[0].astype(tbl_dtype)
        f0 = f0_ref[0].astype(jnp.float32)  # (TR, SMAX) S
        f1 = f1_ref[0].astype(jnp.float32)  # ph | (P-1)<<7 | lo<<14
        f2 = f2_ref[0].astype(jnp.float32)  # (len-1) | used<<7
        lane = jax.lax.broadcasted_iota(jnp.int32, (TR, 128), 1)

        def fire(j, _):
            ohj = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (SMAX, 128), 0) == j, 1.0, 0.0
            ).astype(jnp.float32)
            b0 = jax.lax.dot_general(
                f0, ohj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            b1 = jax.lax.dot_general(
                f1, ohj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            b2 = jax.lax.dot_general(
                f2, ohj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            S = b0
            ph = b1 & 127
            P = ((b1 >> 7) & 127) + 1
            lo = (b1 >> 14) & 127
            lenm1 = b2 & 127
            used = (b2 >> 7) & 1
            rowS = (S >> 7)[:, 0:1]  # (TR, 1) per-row constant
            rows = jax.lax.broadcasted_iota(jnp.int32, (TR, NT), 1)
            oh0 = jnp.where(rows == rowS, 1.0, 0.0).astype(tbl_dtype)
            oh1 = jnp.where(rows == rowS + 1, 1.0, 0.0).astype(tbl_dtype)
            tblv = acc_ref[...]
            A = jax.lax.dot_general(
                oh0, tblv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            B = jax.lax.dot_general(
                oh1, tblv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            q = (S & 127) + (lane + ph) % P  # [0, 255)
            qm = q & 127
            gA = jnp.take_along_axis(A, qm, axis=1)
            gB = jnp.take_along_axis(B, qm, axis=1)
            byte = jnp.where(q < 128, gA, gB)
            mask = (
                (used == 1) & (lane >= lo) & (lane <= lo + lenm1)
            )
            cur = acc_ref[WR : WR + TR, :].astype(jnp.int32)
            new = jnp.where(mask, byte, cur)
            acc_ref[WR : WR + TR, :] = new.astype(tbl_dtype)
            return 0

        jax.lax.fori_loop(0, NF, fire, 0)
        o_ref[0] = acc_ref[WR : WR + TR, :].astype(jnp.int32)

    return kernel


def run(name, tbl_dtype):
    rng = np.random.default_rng(0)
    f0 = jnp.asarray(
        rng.integers(0, NT * 128 - 256, (NB, TR, SMAX), dtype=np.int64).astype(
            np.int32
        )
    )
    ph = rng.integers(0, 128, (NB, TR, SMAX))
    P = rng.integers(1, 129, (NB, TR, SMAX))
    lo = rng.integers(0, 64, (NB, TR, SMAX))
    f1 = jnp.asarray((ph | ((P - 1) << 7) | (lo << 14)).astype(np.int32))
    ln = rng.integers(0, 64, (NB, TR, SMAX))
    f2 = jnp.asarray((ln | (1 << 7)).astype(np.int32))
    tbl = jnp.asarray(rng.integers(0, 255, (NB, NT, 128), dtype=np.int64).astype(np.int32))
    try:
        f = jax.jit(
            lambda a, b, c, t: pl.pallas_call(
                make_kernel(tbl_dtype),
                out_shape=jax.ShapeDtypeStruct((NB, TR, 128), jnp.int32),
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec((1, TR, SMAX), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TR, SMAX), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TR, SMAX), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, NT, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, TR, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((NT, 128), tbl_dtype)],
            )(a, b, c, t)
        )
        t = device_time(lambda: f(f0, f1, f2, tbl), sync=lambda r: r.reshape(-1)[:1])
        per_fire = t / (NB * NF)
        mbps = (TR * 128) / (NF * per_fire) / 2**20 * NF / NF
        print(
            f"{name:10s}: {t*1e3:7.2f} ms  {per_fire*1e6:6.2f} us/fire  "
            f"tile at 45 fires -> {TR*128/ (45*per_fire) / 2**20:7.1f} MiB/s",
            flush=True,
        )
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name:10s}: FAIL {type(e).__name__}: {msg}", flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}/{dev.device_kind}", flush=True)
    run("bf16", jnp.bfloat16)
    run("f32", jnp.float32)


if __name__ == "__main__":
    main()
