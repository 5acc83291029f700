"""Ring decoder: host pull-plan + Pallas TPU kernel for LZ4 block decode.

The native runtime (`tlz4_build_ring_plan2`, lz4_flex_tpu/native/lz4_native.cpp)
walks the block once — the same walk as the reference's token loop
(/root/reference/src/block/decompress.rs:201-444) — and emits a data-parallel
pull schedule instead of performing the copies: a per-tile LITERAL IMAGE
(every literal byte memcpy'd to its output position host-side) plus compact
per-tile MATCH record streams that the TPU kernel fires RB records at a
time as one-hot MXU row pulls over a single VMEM-resident table.

Table layout per tile t (rows of 128 bytes):

  [0, WR)      ring: output rows [t*TR - WR, t*TR)   (WR = 64 KiB)
  [WR, WR+TR)  the tile being decoded — seeded from the literal image,
               match fires update it in place

Record stream semantics (record k -> field arrays [t, k // RB, k % RB], so
fire j = k // RB consumes the contiguous record row j):

  out lane l (lo <= l < lo+len) of row `row` = tbl[S + (l+ph) mod P]

  f0 = S                     table-local byte address (<= 17 bits)
  f1 = ph | (P-1)<<7 | lo<<14
  f2 = (len-1) | row<<7      row == TR is the padding sentinel (no scatter)

The stream is match records by depth asc: a fire's pulls all read the
table before its writes, so the packer only has to keep a record out of
any fire where a LOWER-depth record already wrote one of its read rows.
Two packers implement that (native ring_pack_tile): the legacy
soft-boundary packer (fires flush at depth-group ends — production at
TILE_ROWS=256, where fire count is bound by the depth chain anyway) and
the round-5 dense reserved-fire packer (conflicting records defer with an
exact reserved fire index; selected at TILE_ROWS>=512, where per-group
flushes would multiply). Every record's sources are literal-image bytes,
earlier fires' writes, or ring bytes outside the tile.

Round-4 record diet: the builder MATERIALIZES every match whose source
bytes are already final in the literal image (depth-0, in-tile) — literal-
rooted chains collapse into host memcpys level by level, periodic (P<128)
pieces whose window resolves tile themselves as byte patterns, and deep
pieces resolve through a lazy per-piece chase over a sparse index instead
of a per-byte origin map. Only ring-rooted content reaches the kernel
(~40% fewer records on text, 2-3x fewer on repetitive corpora), and tiles
whose plan flags zero periodic fires run a branch-free fire loop.

Round-5 fire economics: fires/tile ≈ the depth-chain length, NOT
records/RB — so the big fire lever is the tile size. TLZ4_TILE_ROWS=512
(64 KiB tiles) halves the chain tax: 2,353 fires / 5.1 ms / 1.9 GiB/s on
the 10 MB text corpus at resolve_min_depth=12 (vs 5,334 / 9.7 ms at the
256-row default), for ~+2 ms of host plan (bigger tiles turn ring sources
into in-tile chains that chase). Pick 512 on hosts with enough cores per
chip that the kernel, not the plan build, binds the pipeline.
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass

import numpy as np

from ..block import errors as block_errors

import os as _os

# 32 KiB output tile by default. TLZ4_TILE_ROWS=512 (64 KiB tiles) halves
# the per-tile depth-chain fire tax — kernel 9.7 -> 6.2 ms/10 MB text,
# 1.9 GiB/s at rmd=12 (experiments/tr512_ab.py) — at ~+1.5-2 ms of host
# plan build (bigger tiles turn ring sources into in-tile chains that
# chase). Choose 512 when the host has enough cores per chip that the
# kernel, not the plan, binds the pipeline; the 4-core dev default stays
# 256. Must be a power of two.
TILE_ROWS = int(_os.environ.get("TLZ4_TILE_ROWS", "256"))
if TILE_ROWS & (TILE_ROWS - 1) or not 64 <= TILE_ROWS <= 1024:
    raise ValueError(f"TLZ4_TILE_ROWS must be a power of two in [64, 1024], got {TILE_ROWS}")
WINDOW_ROWS = 512  # 64 KiB LZ4 window
RB = 256  # records per fire. Measured RB=512 SLOWER (31.4 vs 27.0 ms kernel
#           on the 10 MB corpus): depth-group padding waste and the larger
#           one-hot scatter outgrow the per-fire fixed cost.
NFMAX_ALLOC = 24  # fires-per-tile first-try cap (retry ladder on overflow)
# 24 (was 48): known-source materialization cut per-tile fire maxima to
# 13-15 on every 10 MB corpus tried; the smaller cap halves both the
# record-array footprint (cache/TLB pressure on the plan builder) and the
# kernel's per-fire splat contraction width.
# Retry ladder instead of one jump to the hard cap: the splat matmuls
# contract over NF, so a 160-wide plan costs ~3.3x the per-fire splat MACs
# of a 48-wide one even when only 50 fires are used (measured: the mixed
# real-file corpus triggered the 160 retry and ran 3.3 us/fire vs text's
# 2.2). The ladder keeps NF tight; the last step is the hard cap
# (overflow there -> fallback engine).
NFMAX_STEPS = (32, 48, 64, 96, 160)
NFMAX_RETRY = NFMAX_STEPS[-1]
_NFMAX_LADDER = (NFMAX_ALLOC,) + NFMAX_STEPS
# Adaptive starting rung: chain-heavy content overflows the 48-fire first
# try, and a pipelined stream would pay that doomed build EVERY batch; the
# hint starts the next default-capacity build at the smallest rung that
# held the previous plan (benign race — worst case is one extra retry).
_nfmax_hint = [NFMAX_ALLOC]
# Host-side chain resolution threshold: resolving SHALLOW chains is
# counterproductive (run-splitting adds records/fires while raw records stay
# single, and the chase logic costs host CPU). Round-4 sweep with the lazy
# chase + known-source materialization (text/mixed/JSON 10 MB, interleaved
# min-of-3, quiet host): rmd=16 is neutral on text (15.1 vs 15.1 ms) and
# clearly better on chase-heavy content (mixed 23.4 -> 19.0, JSON 16.8 ->
# 13.9) for ~+40% fires — still kernel-underutilized, so a net win while
# plans, not kernels, bind (kernel ~6-10 ms vs plan ~14-19).
RESOLVE_MIN_DEPTH = 16
# 16 (was 6): letting deep pieces resolve into more affine runs removes
# most of the nearly-empty depth>=8 fire groups — text fires 6939 -> 6821
# with soft fire boundaries, kernel 13.8 -> 13.4 ms at hard ones (measured
# on TPU; rr=32 bought nothing further)
RESOLVE_RUNS = 16

PLAN_OVERFLOW_CODES = (-100, -102, -103, -104)


@dataclass
class RingPlan:
    rec_f0: np.ndarray  # (ntiles, NF, RB) int32: S
    rec_f1: np.ndarray  # (ntiles, NF, RB) int32: ph | (P-1)<<7 | lo<<14
    rec_f2: np.ndarray  # (ntiles, NF, RB) int32: (len-1) | row<<7
    nf_tot: np.ndarray  # (ntiles,) int32, match fires per tile
    fper: np.ndarray  # (ntiles, ceil(NF/32)) int32 bitmask: fire holds a
    #                   periodic (P<128) record -> kernel takes the %P path
    lit_init: np.ndarray  # (ntiles*TR, 128) uint8 literal image: the
    #                       kernel's initial tile state (literal bytes at
    #                       their output positions, 0 elsewhere)
    total_out: int
    ntiles: int

    tile_rows: int = TILE_ROWS
    window_rows: int = WINDOW_ROWS
    rb: int = RB

    # Pool-lifetime stamp: the record arrays come from a 2-generation
    # rotating pool (`_record_arrays`), so the SECOND subsequent build on the
    # same thread reuses them. seq is this plan's generation, seq_holder[0]
    # the thread's latest; check_live() fails loudly instead of letting a
    # stale plan upload corrupted records.
    seq: int = 0
    seq_holder: object = None

    def check_live(self) -> None:
        if self.seq_holder is not None and self.seq_holder[0] - self.seq >= 2:
            raise RuntimeError(
                "RingPlan invalidated: its pooled record arrays were reused "
                f"by a later build_ring_plan call on this thread (built at "
                f"generation {self.seq}, pool now at {self.seq_holder[0]}). "
                "Upload each plan before building two more, or copy the "
                "record arrays out."
            )


def _native_lib():
    from .. import native as _native

    lib = _native._lib()
    if not hasattr(lib.tlz4_build_ring_plan2, "_tlz4_configured"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.tlz4_build_ring_plan2.restype = ctypes.c_int64
        lib.tlz4_build_ring_plan2.argtypes = [
            u8p, ctypes.c_size_t,
            i64p, i64p, u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, i32p, i32p, u8p,
            i64p,
        ]
        lib.tlz4_build_ring_plan2._tlz4_configured = True
    return lib


import threading

_scratch = threading.local()


def _record_arrays(ntiles: int, nfmax: int, rb: int, tile_rows: int):
    """Per-thread rotating pool for the plan's (ntiles, NF, RB) record arrays
    and its (ntiles*tile_rows, 128) literal image.

    Fresh ``np.empty`` of ~50 MB per build costs a page-fault storm per
    call; reuse avoids it. Two generations rotate so the arrays of the
    previous build stay untouched while the next one runs — the pipelined
    steady state (upload buffer i while building i+1) never aliases. A plan
    is invalidated by the SECOND subsequent build on the same thread;
    callers that pipeline deeper must copy the record arrays out.

    Returns (arrays, seq_holder, seq): ``seq`` is this build's generation
    number and ``seq_holder[0]`` the thread's latest — a plan is live while
    ``seq_holder[0] - seq < 2`` (checked at kernel upload, see
    :meth:`RingPlan.check_live`).
    """
    gens = getattr(_scratch, "plan_gens", None)
    if gens is None:
        gens = _scratch.plan_gens = [None, None]
        _scratch.plan_idx = 0
        _scratch.plan_seq = [0]
    _scratch.plan_idx ^= 1
    _scratch.plan_seq[0] += 1
    cur = gens[_scratch.plan_idx]
    shape = (ntiles, nfmax, rb)
    ishape = (ntiles * tile_rows, 128)
    if cur is None or cur[0].shape != shape or cur[3].shape != ishape:
        cur = tuple(np.empty(shape, np.int32) for _ in range(3)) + (
            np.empty(ishape, np.uint8),
        )
        gens[_scratch.plan_idx] = cur
    return cur, _scratch.plan_seq, _scratch.plan_seq[0]


def build_ring_plan_parts(
    parts,
    total_out: int,
    *,
    independent: bool = False,
    nthreads: int = 0,
    tile_rows: int = TILE_ROWS,
    window_rows: int = WINDOW_ROWS,
    rb: int = RB,
    nfmax: int | None = None,
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
    static plan shape (record, depth, or literal-window overflow); callers
    fall back to the XLA expansion path. Raises the block error taxonomy on
    malformed input.
    """
    from .decode import _as_u8

    if nfmax is None:
        nfmax = _nfmax_hint[0]
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
    # Pooled, uninitialized record arrays: the builder stamps every slot the
    # kernel can read (fires < nf_tot), and zeroing ~50 MB per call costs
    # more than the build itself.
    (f0, f1, f2, lit_init), seq_holder, seq = _record_arrays(
        ntiles, nfmax, rb, tile_rows
    )
    nf_tot = np.zeros(ntiles, np.int32)
    fper = np.zeros((ntiles, (nfmax + 31) // 32), np.int32)
    tot = np.zeros(1, np.int64)

    lib = _native_lib()
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.tlz4_build_ring_plan2(
        comp.ctypes.data_as(u8p), comp.shape[0],
        blk_off.ctypes.data_as(i64p), blk_len.ctypes.data_as(i64p),
        blk_store.ctypes.data_as(u8p), len(parts),
        1 if independent else 0, total_out,
        tile_rows, window_rows, rb, nfmax,
        ntiles, resolve_min_depth, resolve_runs, nthreads,
        f0.ctypes.data_as(i32p), f1.ctypes.data_as(i32p),
        f2.ctypes.data_as(i32p),
        nf_tot.ctypes.data_as(i32p), fper.ctypes.data_as(i32p),
        lit_init.ctypes.data_as(u8p),
        tot.ctypes.data_as(i64p),
    )
    if rc == -102 and nfmax < NFMAX_RETRY:
        # record-capacity overflow: climb the retry ladder before giving up
        # to the fallback engine
        nxt = next(s for s in NFMAX_STEPS if s > nfmax)
        return build_ring_plan_parts(
            parts, total_out, independent=independent, nthreads=nthreads,
            tile_rows=tile_rows, window_rows=window_rows, rb=rb,
            nfmax=nxt,
            resolve_min_depth=resolve_min_depth, resolve_runs=resolve_runs,
        )
    if rc in PLAN_OVERFLOW_CODES:
        return None, None
    if rc < 0:
        from .. import native as _native

        _native._raise_decompress_error(int(rc), int(tot[0]), total_out)
    if int(tot[0]) != total_out:
        raise block_errors.OutputTooSmall(int(tot[0]), total_out)
    plan = RingPlan(
        f0, f1, f2, nf_tot, fper, lit_init, total_out, ntiles,
        tile_rows, window_rows, rb, seq, seq_holder,
    )
    used = int(nf_tot.max()) if ntiles else 1
    _nfmax_hint[0] = next(
        (s for s in _NFMAX_LADDER if s >= used), NFMAX_RETRY
    )
    return plan, comp


def build_ring_plan(comp, total_out: int, **kw) -> RingPlan | None:
    """Single raw-block form of :func:`build_ring_plan_parts`."""
    plan, _ = build_ring_plan_parts([(comp, True)], total_out, **kw)
    return plan


def simulate_ring_plan(plan: RingPlan, comp=None) -> bytes:
    """Numpy reference of the ring-decoder kernel: the executable spec the
    Pallas kernel is tested against. (``comp`` is accepted for call-site
    compatibility but unused — the literal image already carries every
    compressed-stream byte the kernel reads.)"""
    TR, WR = plan.tile_rows, plan.window_rows
    NT = WR + TR
    out = np.zeros((plan.ntiles * TR, 128), np.int32)
    lane = np.arange(128, dtype=np.int32)[None, :]
    nf = plan.rec_f0.shape[1]

    for t in range(plan.ntiles):
        tbl = np.zeros((NT, 128), np.int32)
        lo_row = t * TR - WR
        if lo_row < 0:
            tbl[-lo_row:WR] = out[: t * TR]
        else:
            tbl[:WR] = out[lo_row : t * TR]
        tbl[WR : WR + TR] = plan.lit_init[t * TR : (t + 1) * TR].astype(
            np.int32
        )
        for j in range(int(plan.nf_tot[t])):
            assert j < nf
            f0 = plan.rec_f0[t, j, :]
            f1 = plan.rec_f1[t, j, :]
            f2 = plan.rec_f2[t, j, :]
            S = f0
            ph = f1 & 127
            P = ((f1 >> 7) & 127) + 1
            lo = (f1 >> 14) & 127
            ln = (f2 & 127) + 1
            # row mask must cover the pad sentinel row == TR (2*TR-1; at
            # TR=512 a 511 mask would alias the sentinel onto row 0)
            row = (f2 >> 7) & (2 * TR - 1)
            sub = tbl.reshape(-1)
            idx = S[:, None] + (lane + ph[:, None]) % P[:, None]
            y = sub[np.clip(idx, 0, sub.shape[0] - 1)]
            mask = (
                (row[:, None] < TR)
                & (lane >= lo[:, None])
                & (lane < (lo + ln)[:, None])
            )
            # scatter: output lanes are written exactly once per tile, so a
            # masked add over records is exact
            contrib = np.zeros((TR, 128), np.int32)
            cov = np.zeros((TR, 128), np.int32)
            np.add.at(contrib, np.clip(row, 0, TR - 1), np.where(mask, y, 0))
            np.add.at(cov, np.clip(row, 0, TR - 1), mask.astype(np.int32))
            region = tbl[WR : WR + TR]
            tbl[WR : WR + TR] = np.where(cov > 0, contrib, region)
        out[t * TR : (t + 1) * TR] = tbl[WR : WR + TR]
    return out.astype(np.uint8).reshape(-1)[: plan.total_out].tobytes()


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------
#
# One grid step per tile, sequential (the table scratch carries the ring
# across steps). Per fire: three tiny MXU matmuls splat the fire's RB
# record fields across lanes (f32 one-hot — exact for <=24-bit ints), two
# one-hot MXU row pulls fetch the aligned row pair containing each record's
# source span from the class subtable, a within-row take_along_axis + wrap
# select extracts the (l+ph) mod P bytes (the TPU form of the reference's
# wild copy, /root/reference/src/fastcpy_unsafe.rs:64-90), and a one-hot
# scatter (contracting the record dim) lands the bytes on their tile rows.
# Fires run strictly in order (lit group first, then match depth groups),
# updating the tile region in place.


def _ring_kernel(*refs, TR, WR, RB_, NF, NFW, dt, checksum):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if checksum:
        # extra scalar-prefetch arg (ntot) and extra output (acc_ref)
        (nft_ref, fp_ref, ntot_ref,
         init_ref, f0_ref, f1_ref, f2_ref,
         out_ref, acc_ref, tbl_ref) = refs
    else:
        (nft_ref, fp_ref,
         init_ref, f0_ref, f1_ref, f2_ref,
         out_ref, tbl_ref) = refs

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        tbl_ref[0:WR, :] = jnp.zeros((WR, 128), dt)

    @pl.when(b > 0)
    def _shift():
        tbl_ref[0:WR, :] = tbl_ref[TR : TR + WR, :]

    # Seed the tile from the literal image: every literal byte is already at
    # its output position; match fires overwrite their lanes in place.
    tbl_ref[WR : WR + TR, :] = init_ref[...].astype(jnp.int32).astype(dt)

    lane = jax.lax.broadcasted_iota(jnp.int32, (RB_, 128), 1)
    rowsTR = jax.lax.broadcasted_iota(jnp.int32, (RB_, TR), 1)
    def make_fire(sub_lo, sub_hi, plain_only):
        KR = sub_hi - sub_lo
        rowsK = jax.lax.broadcasted_iota(jnp.int32, (RB_, KR), 1)

        def fire(j, carry):
            ohj = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (NF, 128), 0) == j,
                1.0, 0.0,
            ).astype(jnp.float32)

            def splat(fref):
                # (NF, RB) contracted with (NF, 128) over NF -> (RB, 128).
                # HIGHEST precision: the default MXU f32 path is
                # bf16-precision and rounds >8-bit field values.
                return jax.lax.dot_general(
                    fref[0].astype(jnp.float32), ohj,
                    (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)

            S = splat(f0_ref)
            b1 = splat(f1_ref)
            b2 = splat(f2_ref)
            ph = b1 & 127
            lo = (b1 >> 14) & 127
            lenm1 = b2 & 127
            # 2*TR-1, not 511: must keep the pad sentinel row == TR
            # distinct from row 0 for any TR (see simulate_ring_plan)
            row = (b2 >> 7) & (2 * TR - 1)
            rowS = (S >> 7)[:, 0:1]
            oh0 = jnp.where(rowsK == rowS, 1.0, 0.0).astype(dt)
            sub = tbl_ref[sub_lo:sub_hi, :]
            A = jax.lax.dot_general(
                oh0, sub, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)

            def tail(byte):
                inr = (row < TR) & (lane >= lo) & (lane <= lo + lenm1)
                # byte+1 packs value and coverage into ONE one-hot scatter:
                # each output lane has a single writer per fire, and integers
                # <= 256 are exact in bf16, so scat in {0} u [1, 256].
                mb = jnp.where(inr, byte + 1, 0).astype(dt)
                ohr = jnp.where(rowsTR == row[:, 0:1], 1.0, 0.0).astype(dt)
                scat = jax.lax.dot_general(
                    ohr, mb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                cur = tbl_ref[WR : WR + TR, :].astype(jnp.int32)
                new = jnp.where(scat > 0, scat - 1, cur)
                tbl_ref[WR : WR + TR, :] = new.astype(dt)

            if plain_only:
                # Branch-free fire for tiles whose plan flags ZERO periodic
                # records: the builder row-aligns every plain record's S, so
                # the read (lane+ph) & 127 stays inside row rowS. Dropping
                # the pl.when branch structure measured ~0.34 us/fire
                # (experiments/fire_ablate5.py).
                tail(jnp.take_along_axis(A, (lane + ph) & 127, axis=1))
                return carry

            P = ((b1 >> 7) & 127) + 1

            # Fires holding a periodic (P<128) record are flagged in the
            # plan's fper bitmask and pay the pair-pull + %P vector-division
            # path. The common plain fire has row-aligned S (the builder
            # splits pieces at source-row boundaries), so its read
            # (lane+ph) & 127 stays inside row rowS: ONE one-hot pull, one
            # gather, no row-pair select (the %P division alone measured
            # 1.27 us/fire, experiments/fire_ablate3.py).
            isper = (fp_ref[b * NFW + j // 32] >> (j % 32)) & 1

            @pl.when(isper == 1)
            def _periodic():
                oh1 = jnp.where(rowsK == rowS + 1, 1.0, 0.0).astype(dt)
                B = jax.lax.dot_general(
                    oh1, sub, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                q = (S & 127) + (lane + ph) % P
                qm = q & 127
                gA = jnp.take_along_axis(A, qm, axis=1)
                gB = jnp.take_along_axis(B, qm, axis=1)
                tail(jnp.where(q < 128, gA, gB))

            @pl.when(isper == 0)
            def _plain():
                tail(jnp.take_along_axis(A, (lane + ph) & 127, axis=1))

            return carry

        return fire

    # Tiles with zero periodic fires (the common case on most content) run
    # a branch-free fire loop; the fper bitmask drives the per-TILE switch.
    anyper = fp_ref[b * NFW]
    for w in range(1, NFW):
        anyper = anyper | fp_ref[b * NFW + w]

    @pl.when(anyper == 0)
    def _clean_tile():
        jax.lax.fori_loop(0, nft_ref[b], make_fire(0, WR + TR, True), 0)

    @pl.when(anyper != 0)
    def _mixed_tile():
        jax.lax.fori_loop(0, nft_ref[b], make_fire(0, WR + TR, False), 0)
    tile = tbl_ref[WR : WR + TR, :].astype(jnp.int32)
    out_ref[...] = tile
    if checksum:
        # On-device consumer, folded into the decode itself: a position-
        # weighted sum over every decoded byte, accumulated across the
        # sequential grid into a (1, 128) lane-parallel partial. The tile is
        # already VMEM-resident here, so this costs one VPU pass over 32 KiB
        # per grid step (vs ~2.7 ms for a separate XLA pass re-reading the
        # 4x-widened output from HBM). int32 wraparound == mod 2^32, matching
        # the host-side expected value. Reference analog: content-checksum
        # verify inside read (lz4_flex src/frame/decompress.rs:323-329).
        r = jax.lax.broadcasted_iota(jnp.int32, (TR, 128), 0)
        l = jax.lax.broadcasted_iota(jnp.int32, (TR, 128), 1)
        idx = (b * TR + r) * 128 + l
        w = jnp.where(idx < ntot_ref[0], (idx * 131 + 7) & 0xFFFF, 0)
        part = jnp.sum(tile * w, axis=0, keepdims=True)

        @pl.when(b == 0)
        def _acc0():
            acc_ref[...] = part

        @pl.when(b > 0)
        def _accn():
            acc_ref[...] = acc_ref[...] + part


def _kernel_call(ntiles, nf, *, TR=TILE_ROWS, WR=WINDOW_ROWS,
                 RB_=RB, interpret=False, checksum=False):
    """Build (and cache) the jitted pallas_call for a shape bucket."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NT = WR + TR
    nfw = (nf + 31) // 32
    dt = jnp.float32 if interpret else jnp.bfloat16
    kern = functools.partial(
        _ring_kernel, TR=TR, WR=WR, RB_=RB_, NF=nf, NFW=nfw, dt=dt,
        checksum=checksum,
    )
    nsp = 3 if checksum else 2  # nf_tot, fper[, ntot]

    recmap = lambda b, *s: (b, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((TR, 128), lambda b, *s: (b, 0)),  # literal image
            pl.BlockSpec((1, nf, RB_), recmap),
            pl.BlockSpec((1, nf, RB_), recmap),
            pl.BlockSpec((1, nf, RB_), recmap),
        ],
        out_specs=(
            [
                pl.BlockSpec((TR, 128), lambda b, *s: (b, 0)),
                pl.BlockSpec((1, 128), lambda b, *s: (0, 0)),
            ]
            if checksum
            else pl.BlockSpec((TR, 128), lambda b, *s: (b, 0))
        ),
        scratch_shapes=[pltpu.VMEM((NT, 128), dt)],
    )
    out_shape = jax.ShapeDtypeStruct((ntiles * TR, 128), jnp.int32)
    if checksum:
        out_shape = [out_shape, jax.ShapeDtypeStruct((1, 128), jnp.int32)]
        return jax.jit(
            lambda nft, fp, ntot, init, a0, a1, a2: pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=out_shape,
                interpret=interpret,
            )(nft, fp, ntot, init, a0, a1, a2)
        )
    return jax.jit(
        lambda nft, fp, init, a0, a1, a2: pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(nft, fp, init, a0, a1, a2)
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
    if plan is None:
        plan = build_ring_plan(comp, total_out)
        if plan is None:
            return None
    arrs = ring_plan_device_arrays(plan)
    out = ring_decode_jit(*arrs, ntiles=_bucket(plan.ntiles),
                          nf=arrs[3].shape[1], interpret=interpret,
                          tile_rows=plan.tile_rows)
    # cast to bytes ON DEVICE before fetching: the kernel's tile output
    # is int32 lanes; pulling it raw moves 4x the decoded bytes over
    # PCIe (or this dev setup's ~20 MB/s tunnel)
    import jax.numpy as jnp

    flat = np.asarray(out.astype(jnp.uint8)).reshape(-1)
    return flat[: plan.total_out].tobytes()


def ring_engine_available() -> bool:
    """The Mosaic kernel needs a real TPU; other backends fall back to the
    XLA expansion engines (interpret mode stays available for tests)."""
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def dispatch_parts_ring(
    parts,
    *,
    independent: bool = False,
    max_block_size: int | None = None,
    interpret: bool = False,
):
    """Build the plan and DISPATCH the ring kernel for a multi-block frame
    body without fetching: returns (device uint8 array, total_out), or None
    when the ring engine is unavailable or the frame does not fit the static
    plan shape. The dispatch is asynchronous, so the caller can overlap the
    next batch's host plan build with this batch's device execution (the
    pipelined steady state FrameDecoder's device engine runs)."""
    from .. import native as _native
    from .decode import _as_u8

    if not interpret and not ring_engine_available():
        return None
    total = 0
    for payload, is_comp in parts:
        p = _as_u8(payload)
        if is_comp:
            n_out = _native.measure_block(p)
            if max_block_size is not None and n_out > max_block_size:
                raise block_errors.OutputTooSmall(n_out, max_block_size)
            total += n_out
        else:
            total += p.shape[0]
    if total == 0:
        return b"", 0
    plan, _ = build_ring_plan_parts(parts, total, independent=independent)
    if plan is None:
        return None
    arrs = ring_plan_device_arrays(plan)
    out = ring_decode_jit(*arrs, ntiles=_bucket(plan.ntiles),
                          nf=arrs[3].shape[1], interpret=interpret,
                          tile_rows=plan.tile_rows)
    import jax.numpy as jnp

    # cast to bytes ON DEVICE: fetching raw int32 lanes moves 4x the
    # decoded bytes over PCIe (or this dev setup's ~20 MB/s tunnel)
    return out.astype(jnp.uint8), plan.total_out


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
    r = dispatch_parts_ring(
        parts, independent=independent, max_block_size=max_block_size,
        interpret=interpret,
    )
    if r is None:
        return None
    out, total = r
    if isinstance(out, bytes):
        return out
    return np.asarray(out).reshape(-1)[:total].tobytes()


def ring_plan_device_arrays(plan: RingPlan, comp=None):
    """Bucket-pad the plan to stable device shapes.

    Record fields and the literal image upload as-built when the tile count
    already sits on a bucket boundary (fires beyond nf_tot never execute, so
    no padding values are needed) — for big inputs this is the zero-copy
    common case. (``comp`` is accepted for call-site compatibility but
    unused — the literal image replaced the compressed-stream windows.)"""
    plan.check_live()
    nt = _bucket(plan.ntiles)
    nft = np.zeros(nt, np.int32)
    nft[: plan.ntiles] = plan.nf_tot
    nfw = plan.fper.shape[1]
    fp = np.zeros(nt * nfw, np.int32)
    fp[: plan.ntiles * nfw] = plan.fper.reshape(-1)
    nf = plan.rec_f0.shape[1]
    if nt == plan.ntiles:
        f0, f1, f2 = plan.rec_f0, plan.rec_f1, plan.rec_f2
        init = plan.lit_init
    else:
        f0 = np.zeros((nt, nf, plan.rb), np.int32)
        f0[: plan.ntiles] = plan.rec_f0
        f1 = np.zeros((nt, nf, plan.rb), np.int32)
        f1[: plan.ntiles] = plan.rec_f1
        f2 = np.zeros((nt, nf, plan.rb), np.int32)
        f2[: plan.ntiles] = plan.rec_f2
        init = np.zeros((nt * plan.tile_rows, 128), np.uint8)
        init[: plan.ntiles * plan.tile_rows] = plan.lit_init
    return nft, fp, init, f0, f1, f2


def ring_decode_jit(nft, fp, init, f0, f1, f2, *, ntiles, nf,
                    interpret=False, ntot=None, tile_rows=TILE_ROWS):
    """Run the ring kernel. With ``ntot`` (an int32 (1,) array holding the
    decoded byte count) the kernel also returns a (1, 128) int32 lane-partial
    position-weighted checksum over the decoded bytes (in-kernel consumer;
    sum the lanes mod 2**32 and compare against
    :func:`ring_checksum_expected`). ``tile_rows`` must match the plan's
    (the 512-row variant halves the per-tile depth-chain fire tax on
    kernel-bound hosts; see experiments/tr512_ab.py)."""
    cs = ntot is not None
    key = (ntiles, nf, f0.shape[2], bool(interpret), cs, tile_rows)
    fn = _KERNEL_CACHE.get(key)
    if fn is None:
        fn = _kernel_call(ntiles, nf, TR=tile_rows, RB_=f0.shape[2],
                          interpret=interpret, checksum=cs)
        _KERNEL_CACHE[key] = fn
    if cs:
        return fn(nft, fp, ntot, init, f0, f1, f2)
    return fn(nft, fp, init, f0, f1, f2)


def ring_checksum_expected(data: bytes) -> int:
    """Host-side expected value of the kernel's in-kernel consumer checksum:
    sum over i of data[i] * ((i*131+7) & 0xFFFF), mod 2**32."""
    x = np.frombuffer(data, np.uint8).astype(np.uint64)
    i = np.arange(x.shape[0], dtype=np.uint64)
    w = (i * 131 + 7) & 0xFFFF
    return int((x * w).sum() & 0xFFFFFFFF)
