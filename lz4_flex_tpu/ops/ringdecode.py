"""Ring decoder: host pull-plan + Pallas TPU kernel for LZ4 block decode.

The native runtime (`tlz4_build_ring_plan`, lz4_flex_tpu/native/lz4_native.cpp)
walks the block once — the same walk as the reference's token loop
(/root/reference/src/block/decompress.rs:201-444) — and emits a data-parallel
pull schedule instead of performing the copies: per-(tile, output-row, plane)
fragment records that the TPU kernel fires as one-hot MXU row pulls over a
single VMEM-resident table.

Table layout per tile t (rows of 128 bytes):

  [0, WR)             ring: output rows [t*TR - WR, t*TR)   (WR = 64 KiB)
  [WR, WR+TR)         the tile being decoded (updated in place)
  [WR+TR, WR+TR+2*LW) literal window: comp rows [litblk[t]*LW, +2*LW)

Record semantics (table-local byte address S):

  out lane l (lo <= l < lo+len) of the record's row = table[S + (l+ph) mod P]

  plane_src  = S | ph << 18
  plane_meta = lo | (len-1) << 7 | (P-1) << 14 | 1 << 21   (0 == empty slot)

Planes are depth-grouped and fired strictly in order: every record's sources
are written by earlier planes (or lie outside the tile), so in-place table
updates need no other schedule. Typical depths collapse to 0-2 thanks to the
builder's host-side partial chain resolution.
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass

import numpy as np

from ..block import errors as block_errors

TILE_ROWS = 256  # 32 KiB output tile
WINDOW_ROWS = 512  # 64 KiB LZ4 window
LIT_W = 272  # literal window block; two blocks span 69.6 KiB of comp
SMAX = 96  # plane capacity per tile (overflow -> fallback engine)
RESOLVE_MIN_DEPTH = 3
RESOLVE_RUNS = 6

PLAN_OVERFLOW_CODES = (-100, -102, -103, -104)


@dataclass
class RingPlan:
    plane_src: np.ndarray  # (ntiles, TILE_ROWS, SMAX) int32
    plane_meta: np.ndarray  # (ntiles, TILE_ROWS, SMAX) int32
    nslots: np.ndarray  # (ntiles,) int32
    litblk: np.ndarray  # (ntiles,) int32, literal window block index
    total_out: int
    ntiles: int

    tile_rows: int = TILE_ROWS
    window_rows: int = WINDOW_ROWS
    lit_w: int = LIT_W
    smax: int = SMAX


def _native_lib():
    from .. import native as _native

    lib = _native._lib()
    if not hasattr(lib.tlz4_build_ring_plan, "_tlz4_configured"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.tlz4_build_ring_plan.restype = ctypes.c_int64
        lib.tlz4_build_ring_plan.argtypes = [
            u8p, ctypes.c_size_t,
            i64p, i64p, u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, i32p,
            u8p, i32p, i64p,
        ]
        lib.tlz4_build_ring_plan._tlz4_configured = True
    return lib


def build_ring_plan_parts(
    parts,
    total_out: int,
    *,
    independent: bool = False,
    nthreads: int = 0,
    tile_rows: int = TILE_ROWS,
    window_rows: int = WINDOW_ROWS,
    smax: int = SMAX,
    lit_w: int = LIT_W,
    resolve_min_depth: int = RESOLVE_MIN_DEPTH,
    resolve_runs: int = RESOLVE_RUNS,
):
    """Build the ring-decoder plan for a block list on the host.

    ``parts`` is a list of (payload, is_compressed) pairs in frame order —
    one entry decodes a raw block, several decode a whole frame body (stored
    blocks pass through as literal pseudo-sequences, the reference's
    Uncompressed block kind, /root/reference/src/frame/header.rs:376-411).
    ``independent`` restricts every match to its own block's output.

    The builder parses once (serial) and then builds output tiles on a host
    thread pool — origin/depth chasing is strictly tile-local, so tiles
    share nothing and the build scales with cores.

    Returns (plan, concatenated_comp) — the second feeds the kernel's
    literal windows — or (None, None) when the input does not fit the
    static plan shape (plane, depth, or literal-window overflow); callers
    fall back to the XLA expansion path. Raises the block error taxonomy on
    malformed input.
    """
    from .decode import _as_u8

    bufs = [_as_u8(p) for p, _ in parts]
    comp = np.concatenate(bufs) if len(bufs) != 1 else bufs[0]
    blk_off = np.zeros(len(parts), np.int64)
    blk_len = np.array([b.shape[0] for b in bufs], np.int64)
    np.cumsum(blk_len[:-1], out=blk_off[1:])
    blk_store = np.array(
        [0 if is_comp else 1 for _, is_comp in parts], np.uint8
    )

    nrows = -(-max(total_out, 1) // 128)
    ntiles = -(-nrows // tile_rows)
    plane_src = np.zeros((ntiles, tile_rows, smax), np.int32)
    plane_meta = np.zeros((ntiles, tile_rows, smax), np.int32)
    nslots = np.zeros(ntiles, np.int32)
    litblk = np.zeros(ntiles, np.int32)
    depth = np.zeros(max(total_out, 1), np.uint8)
    origin = np.zeros(max(total_out, 1), np.int32)
    tot = np.zeros(1, np.int64)

    lib = _native_lib()
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.tlz4_build_ring_plan(
        comp.ctypes.data_as(u8p), comp.shape[0],
        blk_off.ctypes.data_as(i64p), blk_len.ctypes.data_as(i64p),
        blk_store.ctypes.data_as(u8p), len(parts),
        1 if independent else 0, total_out,
        tile_rows, window_rows, smax, lit_w,
        ntiles, resolve_min_depth, resolve_runs, nthreads,
        plane_src.ctypes.data_as(i32p), plane_meta.ctypes.data_as(i32p),
        nslots.ctypes.data_as(i32p), litblk.ctypes.data_as(i32p),
        depth.ctypes.data_as(u8p), origin.ctypes.data_as(i32p),
        tot.ctypes.data_as(i64p),
    )
    if rc in PLAN_OVERFLOW_CODES:
        return None, None
    if rc < 0:
        from .. import native as _native

        _native._raise_decompress_error(int(rc), int(tot[0]), total_out)
    if int(tot[0]) != total_out:
        raise block_errors.OutputTooSmall(int(tot[0]), total_out)
    plan = RingPlan(
        plane_src, plane_meta, nslots, litblk, total_out, ntiles,
        tile_rows, window_rows, lit_w, smax,
    )
    return plan, comp


def build_ring_plan(comp, total_out: int, **kw) -> RingPlan | None:
    """Single raw-block form of :func:`build_ring_plan_parts`."""
    plan, _ = build_ring_plan_parts([(comp, True)], total_out, **kw)
    return plan


def _comp_rows(plan: RingPlan, comp) -> np.ndarray:
    """Pad the compressed stream to whole literal-window blocks (plus the
    one-block lookahead the kernel's second window block needs)."""
    from .decode import _as_u8

    buf = _as_u8(comp)
    nrows = -(-buf.shape[0] // 128)
    nblk = max(-(-nrows // plan.lit_w), int(plan.litblk.max()) + 2)
    rows = np.zeros((nblk * plan.lit_w + plan.lit_w, 128), np.uint8)
    rows.reshape(-1)[: buf.shape[0]] = buf
    return rows


def simulate_ring_plan(plan: RingPlan, comp) -> bytes:
    """Numpy reference of the ring-decoder kernel: the executable spec the
    Pallas kernel is tested against."""
    TR, WR, LW = plan.tile_rows, plan.window_rows, plan.lit_w
    NT = WR + TR + 2 * LW
    comp_rows = _comp_rows(plan, comp).astype(np.int32)
    out = np.zeros((plan.ntiles * TR, 128), np.int32)
    lane = np.arange(128, dtype=np.int32)[None, :]

    for t in range(plan.ntiles):
        tbl = np.zeros((NT, 128), np.int32)
        lo_row = t * TR - WR
        if lo_row < 0:
            tbl[-lo_row:WR] = out[: t * TR]
        else:
            tbl[:WR] = out[lo_row : t * TR]
        tbl[WR + TR :] = comp_rows[plan.litblk[t] * LW :][: 2 * LW]
        for j in range(int(plan.nslots[t])):
            src = plan.plane_src[t, :, j]
            meta = plan.plane_meta[t, :, j]
            S = src & 0x3FFFF
            ph = (src >> 18) & 127
            lo = meta & 127
            ln = ((meta >> 7) & 127) + 1
            P = ((meta >> 14) & 127) + 1
            used = (meta >> 21) & 1
            idx = S[:, None] + (lane + ph[:, None]) % P[:, None]
            y = tbl.reshape(-1)[np.clip(idx, 0, NT * 128 - 1)]
            mask = (
                (used[:, None] == 1)
                & (lane >= lo[:, None])
                & (lane < (lo + ln)[:, None])
            )
            tbl[WR : WR + TR] = np.where(mask, y, tbl[WR : WR + TR])
        out[t * TR : (t + 1) * TR] = tbl[WR : WR + TR]
    return out.astype(np.uint8).reshape(-1)[: plan.total_out].tobytes()


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------
#
# One grid step per tile, sequential (the table scratch carries the ring
# across steps). Per fire: three tiny MXU matmuls splat the plane's per-row
# fields across lanes (f32 one-hot — exact for <=24-bit ints), two one-hot
# MXU row pulls fetch the aligned row pair containing each record's source
# span, and a within-row take_along_axis + wrap select extracts the
# (l+ph) mod P bytes (the TPU form of the reference's wild copy,
# /root/reference/src/fastcpy_unsafe.rs:64-90). Planes fire strictly in
# order (depth-grouped by the builder), updating the tile region in place.

_TBL_DTYPE = None  # set lazily: bfloat16 (bytes are exact), f32 fallback


def _ring_kernel(ns_ref, lb_ref, blk0_ref, blk1_ref, src_ref, meta_ref,
                 out_ref, tbl_ref, *, TR, WR, LW, SMAX, dt):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    NT = WR + TR + 2 * LW
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        tbl_ref[0 : WR + TR, :] = jnp.zeros((WR + TR, 128), dt)

    @pl.when(b > 0)
    def _shift():
        tbl_ref[0:WR, :] = tbl_ref[TR : TR + WR, :]

    tbl_ref[WR + TR : WR + TR + LW, :] = blk0_ref[...].astype(jnp.int32).astype(dt)
    tbl_ref[WR + TR + LW : NT, :] = blk1_ref[...].astype(jnp.int32).astype(dt)

    src = src_ref[0]
    meta = meta_ref[0]
    f0 = (src & 0x3FFFF).astype(jnp.float32)
    f1 = (
        ((src >> 18) & 127)
        | (((meta >> 14) & 127) << 7)
        | ((meta & 127) << 14)
    ).astype(jnp.float32)
    f2 = (((meta >> 7) & 127) | (((meta >> 21) & 1) << 7)).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, 128), 1)

    def fire(j, carry):
        ohj = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (SMAX, 128), 0) == j, 1.0, 0.0
        ).astype(jnp.float32)

        def splat(f):
            # HIGHEST precision: the default MXU f32 path is bf16-precision
            # and rounds >8-bit field values (observed: S loses its low bits).
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
        rowS = (S >> 7)[:, 0:1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (TR, NT), 1)
        oh0 = jnp.where(rows == rowS, 1.0, 0.0).astype(dt)
        oh1 = jnp.where(rows == rowS + 1, 1.0, 0.0).astype(dt)
        tblv = tbl_ref[...]
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
        mask = (used == 1) & (lane >= lo) & (lane <= lo + lenm1)
        cur = tbl_ref[WR : WR + TR, :].astype(jnp.int32)
        new = jnp.where(mask, byte, cur)
        tbl_ref[WR : WR + TR, :] = new.astype(dt)
        return carry

    jax.lax.fori_loop(0, ns_ref[b], fire, 0)
    out_ref[...] = tbl_ref[WR : WR + TR, :].astype(jnp.int32)


def _kernel_call(ntiles, nblk, *, TR=TILE_ROWS, WR=WINDOW_ROWS, LW=LIT_W,
                 SMAX_=SMAX):
    """Build (and cache) the jitted pallas_call for a shape bucket."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NT = WR + TR + 2 * LW
    dt = jnp.bfloat16
    kern = functools.partial(
        _ring_kernel, TR=TR, WR=WR, LW=LW, SMAX=SMAX_, dt=dt
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # nslots, litblk
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((LW, 128), lambda b, ns, lb: (lb[b], 0)),
            pl.BlockSpec((LW, 128), lambda b, ns, lb: (lb[b] + 1, 0)),
            pl.BlockSpec((1, TR, SMAX_), lambda b, ns, lb: (b, 0, 0)),
            pl.BlockSpec((1, TR, SMAX_), lambda b, ns, lb: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TR, 128), lambda b, ns, lb: (b, 0)),
        scratch_shapes=[pltpu.VMEM((NT, 128), dt)],
    )
    return jax.jit(
        lambda ns, lb, c, s, m: pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ntiles * TR, 128), jnp.int32),
        )(ns, lb, c, c, s, m)
    )


_KERNEL_CACHE: dict = {}


def _bucket(n: int, step: int = 32) -> int:
    if n <= 8:
        return max(n, 1)
    if n <= 32:
        return 32
    return -(-n // step) * step


def decode_block_ring(comp, total_out: int, *, plan: RingPlan | None = None,
                      interpret: bool = False):
    """Decode one LZ4 block through the ring kernel on the default device.

    Returns the decoded bytes, or None when the block does not fit the
    static plan (caller falls back). Raises the block error taxonomy on
    malformed input (validated host-side during plan construction).
    """
    import jax.numpy as jnp

    if plan is None:
        plan = build_ring_plan(comp, total_out)
        if plan is None:
            return None
    arrs = ring_plan_device_arrays(plan, comp)
    out = ring_decode_jit(*arrs, ntiles=arrs[0].shape[0],
                          nblk=arrs[2].shape[0] // plan.lit_w,
                          interpret=interpret)
    flat = np.asarray(out, dtype=np.uint8).reshape(-1)
    return flat[: plan.total_out].tobytes()


def ring_engine_available() -> bool:
    """The Mosaic kernel needs a real TPU; other backends fall back to the
    XLA expansion engines (interpret mode stays available for tests)."""
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def decode_parts_ring(
    parts,
    *,
    independent: bool = False,
    max_block_size: int | None = None,
    interpret: bool = False,
):
    """Decode a whole multi-block frame body through the ring kernel.

    ``parts`` is the frame's block list in order: (payload, is_compressed)
    pairs; linked-mode window references resolve through the kernel's 64 KiB
    output ring (the TPU form of the reference's ext_dict stitching,
    /root/reference/src/frame/decompress.rs:282-292). Returns bytes, or None
    when the frame does not fit the static plan shape (caller falls back to
    the XLA expansion path). Raises the block error taxonomy on malformed
    input.
    """
    from .decode import _as_u8
    from .sequences import parse_sequences_host

    if not interpret and not ring_engine_available():
        return None
    total = 0
    for payload, is_comp in parts:
        p = _as_u8(payload)
        if is_comp:
            seq = parse_sequences_host(p)
            if max_block_size is not None and seq.total_out > max_block_size:
                raise block_errors.OutputTooSmall(seq.total_out, max_block_size)
            total += seq.total_out
        else:
            total += p.shape[0]
    if total == 0:
        return b""
    plan, comp = build_ring_plan_parts(parts, total, independent=independent)
    if plan is None:
        return None
    arrs = ring_plan_device_arrays(plan, comp)
    out = ring_decode_jit(*arrs, ntiles=arrs[0].shape[0],
                          nblk=arrs[2].shape[0] // plan.lit_w,
                          interpret=interpret)
    flat = np.asarray(out, dtype=np.uint8).reshape(-1)
    return flat[: plan.total_out].tobytes()


def ring_plan_device_arrays(plan: RingPlan, comp):
    """Bucket-pad the plan + compressed stream to stable device shapes."""
    nt = _bucket(plan.ntiles)
    ns = np.zeros(nt, np.int32)
    ns[: plan.ntiles] = plan.nslots
    lb = np.zeros(nt, np.int32)
    lb[: plan.ntiles] = plan.litblk
    src = np.zeros((nt, plan.tile_rows, plan.smax), np.int32)
    src[: plan.ntiles] = plan.plane_src
    meta = np.zeros((nt, plan.tile_rows, plan.smax), np.int32)
    meta[: plan.ntiles] = plan.plane_meta
    rows = _comp_rows(plan, comp)
    nblk = _bucket(rows.shape[0] // plan.lit_w, 16)
    crows = np.zeros((nblk * plan.lit_w, 128), np.uint8)
    crows[: rows.shape[0]] = rows
    return ns, lb, crows, src, meta


def ring_decode_jit(ns, lb, crows, src, meta, *, ntiles, nblk,
                    interpret=False):
    key = (ntiles, nblk, src.shape[1], src.shape[2], bool(interpret))
    fn = _KERNEL_CACHE.get(key)
    if fn is None:
        if interpret:
            import functools

            import jax
            import jax.numpy as jnp
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            TR, SMAX_ = src.shape[1], src.shape[2]
            WR, LW = WINDOW_ROWS, LIT_W
            NT = WR + TR + 2 * LW
            dt = jnp.float32
            kern = functools.partial(
                _ring_kernel, TR=TR, WR=WR, LW=LW, SMAX=SMAX_, dt=dt
            )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(ntiles,),
                in_specs=[
                    pl.BlockSpec((LW, 128), lambda b, ns, lb: (lb[b], 0)),
                    pl.BlockSpec((LW, 128), lambda b, ns, lb: (lb[b] + 1, 0)),
                    pl.BlockSpec((1, TR, SMAX_), lambda b, ns, lb: (b, 0, 0)),
                    pl.BlockSpec((1, TR, SMAX_), lambda b, ns, lb: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((TR, 128), lambda b, ns, lb: (b, 0)),
                scratch_shapes=[pltpu.VMEM((NT, 128), dt)],
            )
            fn = jax.jit(
                lambda a, c, d, e, f: pl.pallas_call(
                    kern, grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct(
                        (ntiles * src.shape[1], 128), jnp.int32
                    ),
                    interpret=True,
                )(a, c, d, d, e, f)
            )
        else:
            fn = _kernel_call(ntiles, nblk)
        _KERNEL_CACHE[key] = fn
    return fn(ns, lb, crows, src, meta)
