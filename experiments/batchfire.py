#!/usr/bin/env python3
"""Probe: batched-record ring fires.

Instead of one fire per (row-slot) with TR=256 rows (one record per row,
~3.4 us/fire flat in content — fire_ablate.py), fire RB compact records at
once: one-hot pulls (RB,NT)@(NT,128)x2, within-row gathers, then a one-hot
scatter back to tile rows (TR,RB)@(RB,128)x2. Measures us/record vs RB.

Today's production effective rate: 48 ms / 2.46 M fragments = ~19.5 ns/rec.
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
NT = 1312
NB = 16
NF = 8  # fires per tile
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


def make_kernel(RB):
    def kernel(f0_ref, f1_ref, f2_ref, tbl_ref, o_ref, acc_ref):
        acc_ref[...] = tbl_ref[0].astype(DT)
        lane = jax.lax.broadcasted_iota(jnp.int32, (RB, 128), 1)
        rowsNT = jax.lax.broadcasted_iota(jnp.int32, (RB, NT), 1)
        rowsTR = jax.lax.broadcasted_iota(jnp.int32, (RB, TR), 1)

        def fire(j, carry):
            # Field splat via tiny MXU matmul: (RB, NF) @ onehot(NF,128)
            # -> (RB, 128) per-record broadcast, all 2-D (no 1-D relayouts).
            ohj = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (NF, 128), 0) == j, 1.0, 0.0
            ).astype(jnp.float32)

            def splat(fref):
                return jax.lax.dot_general(
                    fref[0].astype(jnp.float32), ohj, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)

            S = splat(f0_ref)
            b1 = splat(f1_ref)
            b2 = splat(f2_ref)
            ph = b1 & 127
            P = ((b1 >> 7) & 127) + 1
            lo = (b1 >> 14) & 127
            lenm1 = b2 & 127
            row = (b2 >> 7) & 255
            rowS = (S >> 7)[:, 0:1]
            oh0 = jnp.where(rowsNT == rowS, 1.0, 0.0).astype(DT)
            oh1 = jnp.where(rowsNT == rowS + 1, 1.0, 0.0).astype(DT)
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
            gA = jnp.take_along_axis(A, qm, axis=1)
            gB = jnp.take_along_axis(B, qm, axis=1)
            byte = jnp.where(q < 128, gA, gB)
            inr = (lane >= lo) & (lane <= lo + lenm1)
            mb = jnp.where(inr, byte, 0).astype(DT)
            mi = jnp.where(inr, 1, 0).astype(DT)
            ohr = jnp.where(rowsTR == row[:, 0:1], 1.0, 0.0).astype(DT)
            # Contract over the record (sublane) dim: (RB,TR)^T @ (RB,128).
            scat = jax.lax.dot_general(
                ohr, mb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            cov = jax.lax.dot_general(
                ohr, mi, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            cur = acc_ref[NT - TR : NT, :].astype(jnp.int32)
            new = jnp.where(cov > 0, scat, cur)
            acc_ref[NT - TR : NT, :] = new.astype(DT)
            return carry

        jax.lax.fori_loop(0, NF, fire, 0)
        o_ref[0] = acc_ref[NT - TR : NT, :].astype(jnp.int32)

    return kernel


def run(RB):
    rng = np.random.default_rng(0)
    f0 = rng.integers(0, (NT - 2) * 128, (NB, RB, NF), dtype=np.int64).astype(
        np.int32
    )
    f1 = (
        rng.integers(0, 128, (NB, RB, NF), dtype=np.int64)
        | (rng.integers(0, 128, (NB, RB, NF), dtype=np.int64) << 7)
        | (rng.integers(0, 64, (NB, RB, NF), dtype=np.int64) << 14)
    ).astype(np.int32)
    f2 = (
        rng.integers(0, 64, (NB, RB, NF), dtype=np.int64)
        | (rng.integers(0, TR, (NB, RB, NF), dtype=np.int64) << 7)
    ).astype(np.int32)
    tbl = jnp.asarray(
        rng.integers(0, 255, (NB, NT, 128), dtype=np.int64).astype(np.int32)
    )
    try:
        f = jax.jit(
            lambda a, b, c, t: pl.pallas_call(
                make_kernel(RB),
                out_shape=jax.ShapeDtypeStruct((NB, TR, 128), jnp.int32),
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec((1, RB, NF), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, RB, NF), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, RB, NF), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, NT, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, TR, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((NT, 128), DT)],
            )(a, b, c, t)
        )
        f0d, f1d, f2d = jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(f2)
        t = device_time(
            lambda: f(f0d, f1d, f2d, tbl),
            sync=lambda r: r.reshape(-1)[:1],
        )
        per_fire = t / (NB * NF)
        per_rec = t / (NB * NF * RB)
        print(
            f"RB={RB:5d}: {per_fire*1e6:7.2f} us/fire  {per_rec*1e9:7.2f} ns/rec",
            flush=True,
        )
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"RB={RB:5d}: FAIL {type(e).__name__}: {msg}", flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}/{dev.device_kind}", flush=True)
    for rb in [128, 256, 512, 1024]:
        run(rb)


if __name__ == "__main__":
    main()
