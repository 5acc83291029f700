#!/usr/bin/env python3
"""Round-4 fire ablation on the PRODUCTION plan (real 10 MB text corpus).

Locates the per-fire microseconds by replacing one component at a time with
a constant (timing-only, output wrong for ablated variants):

  base       production kernel (ringdecode._ring_kernel semantics, no csum)
  nosplat    field splats replaced by constants
  nooh0      pull one-hot construction replaced by a constant matrix
  noohr      scatter one-hot construction replaced by a constant
  nogather   take_along_axis replaced by A itself
  noupdate   tile region update dropped (breaks inter-fire dep chain)
  cmp2       one-hots built as where(eq, 1bf, 0bf) on f32 iotas (2 passes,
             candidate optimization — exact)
  i8pull     pull matmul in int8 (table + one-hot int8, exact)
"""

import pathlib
import sys
import functools

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench as B
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lz4_flex_tpu import block
from lz4_flex_tpu.ops.ringdecode import (
    build_ring_plan, ring_plan_device_arrays, TILE_ROWS, WINDOW_ROWS, RB,
)


def make_kernel(nt_tiles, nf, variant):
    TR, WR, RB_ = TILE_ROWS, WINDOW_ROWS, RB
    NT = WR + TR
    nfw = (nf + 31) // 32
    dt = jnp.bfloat16

    def kern(nft_ref, fp_ref, init_ref, f0_ref, f1_ref, f2_ref,
             out_ref, tbl_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _init():
            tbl_ref[0:WR, :] = jnp.zeros((WR, 128), dt)

        @pl.when(b > 0)
        def _shift():
            tbl_ref[0:WR, :] = tbl_ref[TR : TR + WR, :]

        tbl_ref[WR : WR + TR, :] = init_ref[...].astype(jnp.int32).astype(dt)

        lane = jax.lax.broadcasted_iota(jnp.int32, (RB_, 128), 1)
        rowsTR = jax.lax.broadcasted_iota(jnp.int32, (RB_, TR), 1)
        KR = WR + TR
        rowsK = jax.lax.broadcasted_iota(jnp.int32, (RB_, KR), 1)
        rowsKf = jax.lax.broadcasted_iota(jnp.float32, (RB_, KR), 1)
        rowsTRf = jax.lax.broadcasted_iota(jnp.float32, (RB_, TR), 1)
        oneb = jnp.full((), 1, dt)
        zerob = jnp.full((), 0, dt)

        def fire(j, carry):
            ohj = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (nf, 128), 0) == j,
                1.0, 0.0,
            ).astype(jnp.float32)

            def splat(fref):
                return jax.lax.dot_general(
                    fref[0].astype(jnp.float32), ohj,
                    (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)

            if variant == "nosplat":
                S = jnp.full((RB_, 128), 0, jnp.int32) + j
                b1 = jnp.full((RB_, 128), 127 << 7, jnp.int32)
                b2 = jnp.full((RB_, 128), TR << 7, jnp.int32) + j
            else:
                S = splat(f0_ref)
                b1 = splat(f1_ref)
                b2 = splat(f2_ref)
            ph = b1 & 127
            lo = (b1 >> 14) & 127
            lenm1 = b2 & 127
            row = (b2 >> 7) & 511
            rowS = (S >> 7)[:, 0:1]
            if variant == "nooh0":
                oh0 = jnp.full((RB_, KR), 0.001, dt)
            elif variant == "cmp2":
                oh0 = jnp.where(rowsKf == rowS.astype(jnp.float32),
                                oneb, zerob)
            else:
                oh0 = jnp.where(rowsK == rowS, 1.0, 0.0).astype(dt)
            sub = tbl_ref[0:KR, :]
            if variant == "i8pull":
                A = jax.lax.dot_general(
                    oh0.astype(jnp.int8), sub.astype(jnp.int8),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            else:
                A = jax.lax.dot_general(
                    oh0, sub, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
            if variant == "nogather":
                byte = A[:, 0:128]
            else:
                byte = jnp.take_along_axis(A, (lane + ph) & 127, axis=1)
            inr = (row < TR) & (lane >= lo) & (lane <= lo + lenm1)
            mb = jnp.where(inr, byte + 1, 0).astype(dt)
            if variant == "noohr":
                ohr = jnp.full((RB_, TR), 0.001, dt)
            elif variant == "cmp2":
                ohr = jnp.where(rowsTRf == row[:, 0:1].astype(jnp.float32),
                                oneb, zerob)
            else:
                ohr = jnp.where(rowsTR == row[:, 0:1], 1.0, 0.0).astype(dt)
            scat = jax.lax.dot_general(
                ohr, mb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            if variant != "noupdate":
                cur = tbl_ref[WR : WR + TR, :].astype(jnp.int32)
                new = jnp.where(scat > 0, scat - 1, cur)
                tbl_ref[WR : WR + TR, :] = new.astype(dt)
            else:
                tbl_ref[WR : WR + TR, 0:128] = (
                    tbl_ref[WR : WR + TR, 0:128] + scat.astype(dt) * 0
                )
            return carry

        jax.lax.fori_loop(0, nft_ref[b], fire, 0)
        out_ref[...] = tbl_ref[WR : WR + TR, :].astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt_tiles,),
        in_specs=[
            pl.BlockSpec((TR, 128), lambda b, *s: (b, 0)),
            pl.BlockSpec((1, nf, RB), lambda b, *s: (b, 0, 0)),
            pl.BlockSpec((1, nf, RB), lambda b, *s: (b, 0, 0)),
            pl.BlockSpec((1, nf, RB), lambda b, *s: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TR, 128), lambda b, *s: (b, 0)),
        scratch_shapes=[pltpu.VMEM((NT, 128), dt)],
    )
    out_shape = jax.ShapeDtypeStruct((nt_tiles * TR, 128), jnp.int32)
    return jax.jit(
        lambda nft, fp, init, a0, a1, a2: pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape
        )(nft, fp, init, a0, a1, a2)
    )


def main():
    data = B.build_corpus()
    n = len(data)
    comp = block.compress(data)
    comp_np = np.frombuffer(comp, np.uint8)
    plan = build_ring_plan(comp_np, n)
    arrs = [jnp.asarray(a) for a in ring_plan_device_arrays(plan)]
    nt, nf = arrs[0].shape[0], arrs[3].shape[1]
    fires = int(plan.nf_tot.sum())
    print(f"fires {fires} nt {nt} nf {nf}", flush=True)
    variants = sys.argv[1:] or [
        "base", "nosplat", "nooh0", "noohr", "nogather", "noupdate",
        "cmp2", "i8pull",
    ]
    base_t = None
    for v in variants:
        try:
            k = make_kernel(nt, nf, v)
            f = lambda: k(*arrs)
            if v in ("base", "cmp2", "i8pull"):
                out = np.asarray(f(), dtype=np.uint8).reshape(-1)[:n].tobytes()
                ok = out == data
            else:
                ok = "-"
            t = B.device_time(f, sync=lambda r: r[:1, :1])
            d = "" if base_t is None else f"  ({(t-base_t)*1e9/fires:+.0f} ns/fire)"
            if v == "base":
                base_t = t
            print(f"{v:9s}: {t*1e3:6.2f} ms  {t*1e9/fires:7.0f} ns/fire  ok={ok}{d}",
                  flush=True)
        except Exception as e:
            print(f"{v:9s}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
