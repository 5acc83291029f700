"""Pull plans: the host-side prep for the Pallas ring decoder.

A pull plan reorganizes a parsed LZ4 block into per-(tile, output-row, slot)
fragment records that the TPU kernel (ops/ringdecode.py) fires as one-hot MXU
row pulls over a VMEM-resident sliding window. Built by the native runtime
(`tlz4_build_pull_plan`, lz4_flex_tpu/native/lz4_native.cpp) in one O(n)
sequential walk — the same role the reference's token walk plays
(/root/reference/src/block/decompress.rs:201-444), but emitting a
data-parallel schedule instead of performing the copies.

Record semantics (see the C++ header comment for the derivation):

  out lane l (lo <= l < lo+len) of the record's row
      = table[ S + ((l + ph) mod P) ]

  src  = S | ph << 18 | depth << 25          (depth <= 62; 63 == empty)
  meta = lo | (len-1) << 7 | (P-1) << 14      (lit meta 0 == empty slot)

The literal table is a per-tile window of the compressed stream (DMA'd rows
[litrow0[t], litrow0[t]+lit_rows)); the match table is the ring of output
rows [t*tile_rows - window_rows, (t+1)*tile_rows). Records with P < 128
implement self-overlapping (RLE) matches without splitting. `depth` is the
fire round; `sched`/`litmask`/`rounds` drive round skipping in the kernel.
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass

import numpy as np

from ..block import errors as block_errors

# Defaults: 32 KiB tiles over a 64 KiB ring window; slot capacities sized
# for ~6-byte average fragments with generous headroom (overflow -> fallback).
TILE_ROWS = 256
WINDOW_ROWS = 512
SL = 64
SM = 48
LIT_ROWS = 272

EMPTY_DEPTH = 63
_EMPTY_SRC = np.int32(EMPTY_DEPTH << 25)

PLAN_OVERFLOW_CODES = (-100, -101, -102, -103, -104)


@dataclass
class PullPlan:
    lit_src: np.ndarray  # (ntiles, SL, TILE_ROWS) int32
    lit_meta: np.ndarray  # (ntiles, SL, TILE_ROWS) int32
    mat_src: np.ndarray  # (ntiles, SM, TILE_ROWS) int32
    mat_meta: np.ndarray  # (ntiles, SM, TILE_ROWS) int32
    sched: np.ndarray  # (ntiles, SM) int32 round bitmasks
    rounds: np.ndarray  # (ntiles,) int32
    litrow0: np.ndarray  # (ntiles,) int32
    litmask: np.ndarray  # (ntiles,) int32 used-lit-slot count
    total_out: int
    ntiles: int

    tile_rows: int = TILE_ROWS
    window_rows: int = WINDOW_ROWS
    lit_rows: int = LIT_ROWS


def _native_lib():
    from .. import native as _native

    lib = _native._lib()
    if not hasattr(lib.tlz4_build_pull_plan, "_tlz4_configured"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.tlz4_build_pull_plan.restype = ctypes.c_int64
        lib.tlz4_build_pull_plan.argtypes = [
            u8p, ctypes.c_size_t,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, i32p,
            i32p, i32p, i32p, i32p,
            u8p, u8p, u8p, i32p, i64p,
        ]
        lib.tlz4_build_pull_plan._tlz4_configured = True
    return lib


def build_pull_plan(
    comp,
    total_out: int,
    *,
    tile_rows: int = TILE_ROWS,
    window_rows: int = WINDOW_ROWS,
    sl: int = SL,
    sm: int = SM,
    lit_rows: int = LIT_ROWS,
) -> PullPlan | None:
    """Build the ring-decoder pull plan for one block on the host.

    Returns None when the block does not fit the static plan shape (slot,
    depth, or literal-window overflow) — callers fall back to the XLA
    expansion path. Raises the block error taxonomy on malformed input.
    """
    from .decode import _as_u8

    buf = _as_u8(comp)
    nrows = -(-max(total_out, 1) // 128)
    ntiles = -(-nrows // tile_rows)
    lit_src = np.zeros((ntiles, sl, tile_rows), np.int32)
    lit_meta = np.zeros((ntiles, sl, tile_rows), np.int32)
    mat_src = np.full((ntiles, sm, tile_rows), _EMPTY_SRC, np.int32)
    mat_meta = np.zeros((ntiles, sm, tile_rows), np.int32)
    sched = np.zeros((ntiles, sm), np.int32)
    rounds = np.zeros(ntiles, np.int32)
    litrow0 = np.zeros(ntiles, np.int32)
    litmask = np.zeros(ntiles, np.int32)
    lit_cnt = np.zeros(ntiles * tile_rows, np.uint8)
    mat_cnt = np.zeros(ntiles * tile_rows, np.uint8)
    depth = np.zeros(max(total_out, 1), np.uint8)
    origin = np.zeros(max(total_out, 1), np.int32)
    tot = np.zeros(1, np.int64)

    lib = _native_lib()
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.tlz4_build_pull_plan(
        buf.ctypes.data_as(u8p), buf.shape[0],
        tile_rows, window_rows, sl, sm, lit_rows, ntiles,
        lit_src.ctypes.data_as(i32p), lit_meta.ctypes.data_as(i32p),
        mat_src.ctypes.data_as(i32p), mat_meta.ctypes.data_as(i32p),
        sched.ctypes.data_as(i32p), rounds.ctypes.data_as(i32p),
        litrow0.ctypes.data_as(i32p), litmask.ctypes.data_as(i32p),
        lit_cnt.ctypes.data_as(u8p), mat_cnt.ctypes.data_as(u8p),
        depth.ctypes.data_as(u8p), origin.ctypes.data_as(i32p),
        tot.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc in PLAN_OVERFLOW_CODES:
        import os
        if os.environ.get("TLZ4_PLAN_DEBUG"):
            print(f"pull plan overflow rc={rc}")
        return None
    if rc < 0:
        from .. import native as _native

        _native._raise_decompress_error(int(rc), int(tot[0]), total_out)
    if int(tot[0]) != total_out:
        raise block_errors.OutputTooSmall(int(tot[0]), total_out)
    return PullPlan(
        lit_src, lit_meta, mat_src, mat_meta, sched, rounds, litrow0,
        litmask, total_out, ntiles, tile_rows, window_rows, lit_rows,
    )


def simulate_plan(plan: PullPlan, comp) -> bytes:
    """Numpy reference of the ring-decoder kernel, used to validate plans
    (and as the executable spec the Pallas kernel is tested against)."""
    from .decode import _as_u8

    buf = _as_u8(comp)
    TR, WR, LR = plan.tile_rows, plan.window_rows, plan.lit_rows
    comp_rows = np.zeros((-(-buf.shape[0] // 128) + LR, 128), np.uint8)
    comp_rows.reshape(-1)[: buf.shape[0]] = buf
    out = np.zeros((plan.ntiles * TR, 128), np.int32)
    lane = np.arange(128, dtype=np.int32)[None, :]

    def fire(tile_out, table, src, meta, active):
        """Apply one record plane: src/meta (TR,), table flat bytes."""
        S = src & 0x3FFFF
        ph = (src >> 18) & 127
        lo = meta & 127
        ln = ((meta >> 7) & 127) + 1
        P = ((meta >> 14) & 127) + 1
        idx = S[:, None] + (lane + ph[:, None]) % P[:, None]
        y = table[np.clip(idx, 0, table.shape[0] - 1)]
        mask = active[:, None] & (lane >= lo[:, None]) & (lane < (lo + ln)[:, None])
        return np.where(mask, y, tile_out)

    for t in range(plan.ntiles):
        lit_tbl = comp_rows[plan.litrow0[t] : plan.litrow0[t] + LR].reshape(-1)
        lit_tbl = lit_tbl.astype(np.int32)
        ring_lo = t * TR - WR
        tile = np.zeros((TR, 128), np.int32)
        # literal phase
        for j in range(int(plan.litmask[t])):
            meta = plan.lit_meta[t, j]
            tile = fire(tile, lit_tbl, plan.lit_src[t, j], meta, meta != 0)
        # match rounds
        for r in range(int(plan.rounds[t])):
            ring = np.zeros((WR + TR, 128), np.int32)
            if ring_lo < 0:
                ring[WR - t * TR : WR] = out[: t * TR]
            else:
                ring[:WR] = out[ring_lo : t * TR]
            ring[WR:] = tile
            rflat = ring.reshape(-1)
            for j in range(plan.mat_src.shape[1]):
                if not (plan.sched[t, j] >> min(r, 31)) & 1:
                    continue
                src = plan.mat_src[t, j]
                d = (src >> 25) & 63
                tile = fire(
                    tile, rflat, src, plan.mat_meta[t, j], d == r
                )
        out[t * TR : (t + 1) * TR] = tile
    return out.astype(np.uint8).reshape(-1)[: plan.total_out].tobytes()
