#!/usr/bin/env python3
"""Round-3 fire-step ablation (production RB=256 batched form).

Suspects for the ~4.2us/fire fixed cost, per fire_ablate round-2 numbers
(one-hot ~0.4, pulls ~0.2, gathers ~0.2 -> ~2.7us unaccounted):

  a) the 3 field splats run f32 Precision.HIGHEST = 6 MXU passes each;
     packing the fields as 8 exact u8 subfield planes and splatting them in
     ONE single-pass bf16 matmul (NF, 8*RB)x(NF, 128) cuts 18 passes -> 1.
  b) (lane+ph) % P with arbitrary P<=128 lowers to vector integer division;
     plain (non-periodic) records only need & 127.

Variants:
  full       production fire (3x f32 HIGHEST splats, %P)
  packsplat  one packed bf16 splat matmul, fields rebuilt from u8 planes
  nomod      & 127 instead of % P
  pack+nomod both
  twofire    production fire but 2 record-rows per loop iteration (RB=512
             worth of work per iter at RB=256 padding granularity)
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
RB = 256
NT = 1312  # WR + TR + 2*LW = 512+256+544
NB = 16
NF = 16
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
    packed = variant in ("packsplat", "pack+nomod")
    nomod = variant in ("nomod", "pack+nomod")
    two = variant == "twofire"
    RBv = 2 * RB if two else RB

    def kernel(*refs):
        if packed:
            fp_ref, tbl_ref, o_ref, acc_ref, fpb_ref = refs
        else:
            f0_ref, f1_ref, f2_ref, tbl_ref, o_ref, acc_ref = refs
        acc_ref[...] = tbl_ref[0].astype(DT)
        if packed:
            # one-time per tile: u8 planes -> bf16 (exact, values <= 255)
            fpb_ref[...] = fp_ref[0].astype(jnp.int32).astype(DT)
        lane = jax.lax.broadcasted_iota(jnp.int32, (RBv, 128), 1)
        rowsNT = jax.lax.broadcasted_iota(jnp.int32, (RBv, NT), 1)
        rowsTR = jax.lax.broadcasted_iota(jnp.int32, (RBv, TR), 1)
        nf_eff = NF // 2 if two else NF

        def fire(j, carry):
            if packed:
                ohj = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (NF, 128), 0) == j,
                    1.0,
                    0.0,
                ).astype(DT)
                allp = jax.lax.dot_general(
                    fpb_ref[...], ohj, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)  # (8*RB, 128)
                S = allp[0 * RB : 1 * RB] + (allp[1 * RB : 2 * RB] << 8) + (
                    allp[2 * RB : 3 * RB] << 16
                )
                b1 = allp[3 * RB : 4 * RB] + (allp[4 * RB : 5 * RB] << 8) + (
                    allp[5 * RB : 6 * RB] << 16
                )
                b2 = allp[6 * RB : 7 * RB] + (allp[7 * RB : 8 * RB] << 8)
            else:
                ohj = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (NF, 128), 0) == j,
                    1.0,
                    0.0,
                ).astype(jnp.float32)

                def splat(fref, row0):
                    return jax.lax.dot_general(
                        fref[0].astype(jnp.float32)
                        if not two
                        else fref[0]
                        .reshape(NF // 2, RBv)
                        .astype(jnp.float32),
                        ohj[:nf_eff] if two else ohj,
                        (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.int32)

                S = splat(f0_ref, j)
                b1 = splat(f1_ref, j)
                b2 = splat(f2_ref, j)
            ph = b1 & 127
            P = ((b1 >> 7) & 127) + 1
            lo = (b1 >> 14) & 127
            lenm1 = b2 & 127
            row = (b2 >> 7) & 511
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
            if nomod:
                q = (S & 127) + ((lane + ph) & 127)
            else:
                q = (S & 127) + (lane + ph) % P
            qm = q & 127
            gA = jnp.take_along_axis(A, qm, axis=1)
            gB = jnp.take_along_axis(B, qm, axis=1)
            byte = jnp.where(q < 128, gA, gB)
            inr = (row < TR) & (lane >= lo) & (lane <= lo + lenm1)
            mb = jnp.where(inr, byte + 1, 0).astype(DT)
            ohr = jnp.where(rowsTR == row[:, 0:1], 1.0, 0.0).astype(DT)
            scat = jax.lax.dot_general(
                ohr, mb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            cur = acc_ref[NT - TR : NT, :].astype(jnp.int32)
            new = jnp.where(scat > 0, scat - 1, cur)
            acc_ref[NT - TR : NT, :] = new.astype(DT)
            return carry

        jax.lax.fori_loop(0, nf_eff, fire, 0)
        o_ref[0] = acc_ref[NT - TR : NT, :].astype(jnp.int32)

    return kernel


def run(variant):
    rng = np.random.default_rng(0)
    packed = variant in ("packsplat", "pack+nomod")
    f0 = rng.integers(0, (NT - 2) * 128, (NB, NF, RB), dtype=np.int64).astype(np.int32)
    f1 = (
        rng.integers(0, 128, (NB, NF, RB), dtype=np.int64)
        | (rng.integers(0, 128, (NB, NF, RB), dtype=np.int64) << 7)
        | (rng.integers(0, 64, (NB, NF, RB), dtype=np.int64) << 14)
    ).astype(np.int32)
    f2 = (
        rng.integers(0, 64, (NB, NF, RB), dtype=np.int64)
        | (rng.integers(0, TR, (NB, NF, RB), dtype=np.int64) << 7)
    ).astype(np.int32)
    tbl = jnp.asarray(rng.integers(0, 255, (NB, NT, 128), dtype=np.int64).astype(np.int32))
    scratch = [pltpu.VMEM((NT, 128), DT)]
    if packed:
        # (NF, 8, RB) u8 planes flattened to (NF, 8*RB)
        fp = np.zeros((NB, NF, 8 * RB), np.uint8)
        for k in range(3):
            fp[:, :, k * RB : (k + 1) * RB] = (f0 >> (8 * k)) & 0xFF
        for k in range(3):
            fp[:, :, (3 + k) * RB : (4 + k) * RB] = (f1 >> (8 * k)) & 0xFF
        for k in range(2):
            fp[:, :, (6 + k) * RB : (7 + k) * RB] = (f2 >> (8 * k)) & 0xFF
        ins = [jnp.asarray(fp), tbl]
        in_specs = [
            pl.BlockSpec((1, NF, 8 * RB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NT, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        scratch.append(pltpu.VMEM((NF, 8 * RB), DT))
    else:
        ins = [jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(f2), tbl]
        in_specs = [
            pl.BlockSpec((1, NF, RB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NF, RB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NF, RB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NT, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
    try:
        f = jax.jit(
            lambda *a: pl.pallas_call(
                make_kernel(variant),
                out_shape=jax.ShapeDtypeStruct((NB, TR, 128), jnp.int32),
                grid=(NB,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, TR, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            )(*a)
        )
        t = device_time(lambda: f(*ins), sync=lambda r: r.reshape(-1)[:1])
        # per RB-record-row of work (twofire does 2 rows/iter, NF/2 iters)
        print(f"{variant:11s}: {t/(NB*NF)*1e6:7.2f} us/fire-row", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{variant:11s}: FAIL {type(e).__name__}: {msg}", flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}/{dev.device_kind}", flush=True)
    for v in ["full", "packsplat", "nomod", "pack+nomod", "twofire"]:
        run(v)


if __name__ == "__main__":
    main()

# --- round-3b variants appended: splat-cost attack on top of nomod -------
def make_kernel2(variant):
    stack = "stack" in variant
    prec = (
        jax.lax.Precision.HIGH if "high" in variant
        else jax.lax.Precision.HIGHEST
    )

    def kernel(f0_ref, f1_ref, f2_ref, fs_ref, tbl_ref, o_ref, acc_ref):
        acc_ref[...] = tbl_ref[0].astype(DT)
        lane = jax.lax.broadcasted_iota(jnp.int32, (RB, 128), 1)
        rowsNT = jax.lax.broadcasted_iota(jnp.int32, (RB, NT), 1)
        rowsTR = jax.lax.broadcasted_iota(jnp.int32, (RB, TR), 1)

        def fire(j, carry):
            ohj = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (NF, 128), 0) == j,
                1.0, 0.0,
            ).astype(jnp.float32)
            if stack:
                allp = jax.lax.dot_general(
                    fs_ref[0].astype(jnp.float32), ohj,
                    (((0,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)  # (3*RB, 128)
                S = allp[0:RB]
                b1 = allp[RB : 2 * RB]
                b2 = allp[2 * RB : 3 * RB]
            else:
                def splat(fref):
                    return jax.lax.dot_general(
                        fref[0].astype(jnp.float32), ohj,
                        (((0,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.int32)
                S = splat(f0_ref)
                b1 = splat(f1_ref)
                b2 = splat(f2_ref)
            ph = b1 & 127
            lo = (b1 >> 14) & 127
            lenm1 = b2 & 127
            row = (b2 >> 7) & 511
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
            q = (S & 127) + ((lane + ph) & 127)
            qm = q & 127
            gA = jnp.take_along_axis(A, qm, axis=1)
            gB = jnp.take_along_axis(B, qm, axis=1)
            byte = jnp.where(q < 128, gA, gB)
            inr = (row < TR) & (lane >= lo) & (lane <= lo + lenm1)
            mb = jnp.where(inr, byte + 1, 0).astype(DT)
            ohr = jnp.where(rowsTR == row[:, 0:1], 1.0, 0.0).astype(DT)
            scat = jax.lax.dot_general(
                ohr, mb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            cur = acc_ref[NT - TR : NT, :].astype(jnp.int32)
            new = jnp.where(scat > 0, scat - 1, cur)
            acc_ref[NT - TR : NT, :] = new.astype(DT)
            return carry

        jax.lax.fori_loop(0, NF, fire, 0)
        o_ref[0] = acc_ref[NT - TR : NT, :].astype(jnp.int32)

    return kernel


def run2(variant):
    rng = np.random.default_rng(0)
    f0 = rng.integers(0, (NT - 2) * 128, (NB, NF, RB), dtype=np.int64).astype(np.int32)
    f1 = (
        rng.integers(0, 128, (NB, NF, RB), dtype=np.int64)
        | (rng.integers(0, 128, (NB, NF, RB), dtype=np.int64) << 7)
        | (rng.integers(0, 64, (NB, NF, RB), dtype=np.int64) << 14)
    ).astype(np.int32)
    f2 = (
        rng.integers(0, 64, (NB, NF, RB), dtype=np.int64)
        | (rng.integers(0, TR, (NB, NF, RB), dtype=np.int64) << 7)
    ).astype(np.int32)
    fs = np.concatenate([f0, f1, f2], axis=2)  # (NB, NF, 3*RB)
    tbl = jnp.asarray(rng.integers(0, 255, (NB, NT, 128), dtype=np.int64).astype(np.int32))
    try:
        f = jax.jit(
            lambda a, b, c, s, t: pl.pallas_call(
                make_kernel2(variant),
                out_shape=jax.ShapeDtypeStruct((NB, TR, 128), jnp.int32),
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec((1, NF, RB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, NF, RB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, NF, RB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, NF, 3 * RB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, NT, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, TR, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((NT, 128), DT)],
            )(a, b, c, s, t)
        )
        ins = (jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(fs), tbl)
        t = device_time(lambda: f(*ins), sync=lambda r: r.reshape(-1)[:1])
        print(f"{variant:12s}: {t/(NB*NF)*1e6:7.2f} us/fire", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{variant:12s}: FAIL {type(e).__name__}: {msg}", flush=True)


if "--round3b" in sys.argv:
    pass
