#!/usr/bin/env python3
"""Ablate the ring-decoder fire step: which component owns the ~2.9 us?

Variants (cumulative cost isolation):
  full       everything (production form)
  nosplat    skip the 3 field splat matmuls (use constants)
  no1hot     one-hot built once outside the loop (constant rowS)
  nopull     skip the 2 big one-hot matmuls (A=B=const)
  nogather   skip the 2 take_along_axis gathers
  nostore    skip the tile read-modify-write
  pair1      ONE one-hot + (NT,256) pair table, one wide matmul
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
NT = 1312
SMAX = 96
NF = 48
NB = 32
DT = jnp.bfloat16

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


def make_kernel(variant):
    use_pair = variant == "pair1"

    def kernel(f0_ref, f1_ref, f2_ref, tbl_ref, o_ref, acc_ref, *rest):
        acc_ref[...] = tbl_ref[0].astype(DT)
        if use_pair:
            pair_ref = rest[0]
            pair_ref[:, :128] = acc_ref[...]
            pair_ref[: NT - 1, 128:] = acc_ref[1:NT, :]
            pair_ref[NT - 1 :, 128:] = jnp.zeros((1, 128), DT)
        f0 = f0_ref[0].astype(jnp.float32)
        f1 = f1_ref[0].astype(jnp.float32)
        f2 = f2_ref[0].astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (TR, 128), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TR, NT), 1)
        oh_const = jnp.where(rows == 7, 1.0, 0.0).astype(DT)

        def fire(j, carry):
            if variant == "nosplat":
                S = jnp.full((TR, 128), 131, jnp.int32) + j
                b1 = jnp.full((TR, 128), (127 << 7) | (3 << 14), jnp.int32)
                b2 = jnp.full((TR, 128), 255, jnp.int32)
            else:
                ohj = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (SMAX, 128), 0) == j,
                    1.0, 0.0,
                ).astype(jnp.float32)

                def splat(f):
                    return jax.lax.dot_general(
                        f, ohj, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.int32)

                S = splat(f0)
                b1 = splat(f1)
                b2 = splat(f2)
            ph = b1 & 127
            P = ((b1 >> 7) & 127) + 1
            lo = (b1 >> 14) & 127
            lenm1 = b2 & 127
            used = (b2 >> 7) & 1
            if variant == "no1hot":
                oh0 = oh_const
                oh1 = oh_const
            else:
                rowS = (S >> 7)[:, 0:1]
                oh0 = jnp.where(rows == rowS, 1.0, 0.0).astype(DT)
                if not use_pair:
                    oh1 = jnp.where(rows == rowS + 1, 1.0, 0.0).astype(DT)
            if variant == "nopull":
                A = S
                B = b1
            elif use_pair:
                AB = jax.lax.dot_general(
                    oh0, rest[0][...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                A = AB[:, :128]
                B = AB[:, 128:]
            else:
                tblv = acc_ref[...]
                A = jax.lax.dot_general(
                    oh0, tblv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                B = jax.lax.dot_general(
                    oh1, tblv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
            q = (S & 127) + (lane + ph) % P
            qm = q & 127
            if variant == "nogather":
                gA = A
                gB = B
            else:
                gA = jnp.take_along_axis(A, qm, axis=1)
                gB = jnp.take_along_axis(B, qm, axis=1)
            byte = jnp.where(q < 128, gA, gB)
            mask = (used == 1) & (lane >= lo) & (lane <= lo + lenm1)
            if variant != "nostore":
                cur = acc_ref[WR : WR + TR, :].astype(jnp.int32)
                new = jnp.where(mask, byte, cur)
                acc_ref[WR : WR + TR, :] = new.astype(DT)
                if use_pair:
                    pair_ref = rest[0]
                    pair_ref[WR : WR + TR, :128] = new.astype(DT)
                    pair_ref[WR - 1 : WR + TR - 1, 128:] = new.astype(DT)
            return carry + jnp.sum(byte * mask)

        acc = jax.lax.fori_loop(0, NF, fire, jnp.int32(0))
        o_ref[0] = acc_ref[WR : WR + TR, :].astype(jnp.int32) + acc

    return kernel


def run(variant):
    rng = np.random.default_rng(0)
    f0 = jnp.asarray(
        rng.integers(0, NT * 128 - 256, (NB, TR, SMAX), dtype=np.int64).astype(np.int32)
    )
    ph = rng.integers(0, 128, (NB, TR, SMAX))
    P = rng.integers(1, 129, (NB, TR, SMAX))
    lo = rng.integers(0, 64, (NB, TR, SMAX))
    f1 = jnp.asarray((ph | ((P - 1) << 7) | (lo << 14)).astype(np.int32))
    ln = rng.integers(0, 64, (NB, TR, SMAX))
    f2 = jnp.asarray((ln | (1 << 7)).astype(np.int32))
    tbl = jnp.asarray(
        rng.integers(0, 255, (NB, NT, 128), dtype=np.int64).astype(np.int32)
    )
    scratch = [pltpu.VMEM((NT, 128), DT)]
    if variant == "pair1":
        scratch.append(pltpu.VMEM((NT, 256), DT))
    try:
        f = jax.jit(
            lambda a, b, c, t: pl.pallas_call(
                make_kernel(variant),
                out_shape=jax.ShapeDtypeStruct((NB, TR, 128), jnp.int32),
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec((1, TR, SMAX), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TR, SMAX), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TR, SMAX), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, NT, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, TR, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            )(a, b, c, t)
        )
        t = device_time(lambda: f(f0, f1, f2, tbl), sync=lambda r: r.reshape(-1)[:1])
        per_fire = t / (NB * NF)
        print(f"{variant:9s}: {per_fire*1e6:6.2f} us/fire", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{variant:9s}: FAIL {type(e).__name__}: {msg}", flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}/{dev.device_kind}", flush=True)
    for v in ["full", "nosplat", "no1hot", "nopull", "nogather", "nostore", "pair1"]:
        run(v)


if __name__ == "__main__":
    main()
