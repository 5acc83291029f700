"""On-device speculative token parse.

The LZ4 token stream is a linked list: each sequence header tells you where
the next one starts (lz4_flex walks it with a cursor,
src/block/decompress.rs:244-340). To parse without a sequential walk, the
kernel *speculatively* decodes a sequence header at EVERY byte position —
vectorized token/LSIC/offset field extraction — yielding a successor pointer
``next[p]`` per position. The real sequence boundaries are the orbit of
position 0 in that functional graph, recovered with pointer-doubling
reachability: after r rounds of (M |= scatter of M through J; J <- J[J]),
M marks every position reachable from 0 in fewer than 2^r hops.

Output offsets then follow from a masked prefix sum of the speculative
output-increment table, and the sequence table is compacted with a
rank-scatter. Malformed-stream conditions (literal overrun, truncation,
offset 0 — the checked-decode error set of src/block/mod.rs:82-98) are
evaluated per-position and reported only where they lie on the real chain.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..block import errors as block_errors
from . import packing
from .sequences import SeqTable


def _speculative_tables(u8: jnp.ndarray, n: jnp.ndarray):
    """Decode a sequence header at EVERY byte position (vectorized).

    Returns per-position arrays: (nxt, lit_start, lit_len, offset, match_len,
    out_inc, is_final, flag_lit_oob, flag_truncated, flag_offset_zero,
    flag_terminated). Flags describe what holds IF a real sequence starts at
    that position."""
    pad = u8.shape[0]
    pos = jnp.arange(pad, dtype=jnp.int32)
    u = u8.astype(jnp.int32)

    lsic_val, lsic_nb = packing.lsic_tables(u8)

    def at(arr, idx):
        return arr[jnp.clip(idx, 0, pad - 1)]

    tok = u
    lln = tok >> 4
    mln = tok & 15
    ll_ext = lln == 15
    ll = lln + jnp.where(ll_ext, at(lsic_val, pos + 1), 0)
    lit_hdr = 1 + jnp.where(ll_ext, at(lsic_nb, pos + 1), 0)
    lit_start = pos + lit_hdr
    off_pos = lit_start + ll
    is_final = off_pos >= n

    offset = at(u, off_pos) | (at(u, off_pos + 1) << 8)
    ml_ext = mln == 15
    ml = 4 + mln + jnp.where(ml_ext, at(lsic_val, off_pos + 2), 0)
    ml_hdr = 2 + jnp.where(ml_ext, at(lsic_nb, off_pos + 2), 0)
    nxt = off_pos + ml_hdr

    offset = jnp.where(is_final, 0, offset)
    ml = jnp.where(is_final, 0, ml)
    nxt = jnp.where(is_final, n, nxt)
    out_inc = ll + ml

    # A literal-length LSIC field running off the end is truncation (host
    # parser semantics) even though the bogus decoded length also makes the
    # position look like an overlong final sequence.
    f_lsic_trunc = ll_ext & (pos + 1 + at(lsic_nb, pos + 1) > n)
    f_lit_oob = is_final & (off_pos > n) & ~f_lsic_trunc
    f_terminated = is_final & (off_pos == n) & ~f_lsic_trunc
    f_offset_zero = ~is_final & (offset == 0)
    f_truncated = f_lsic_trunc | (~is_final & ((off_pos + 2 > n) | (nxt > n)))
    return (
        nxt, lit_start, ll, offset, ml, out_inc,
        is_final, f_lit_oob, f_truncated, f_offset_zero, f_terminated,
    )


def parse_core(u8: jnp.ndarray, n: jnp.ndarray, *, nseq_pad: int):
    """The speculative parse as a plain traceable function (vmap/shard_map
    composable). Returns (lit_start, lit_len, match_off, match_len, out_off,
    nseq, total_out, error_flags) with nseq_pad-padded sequence arrays."""
    pad = u8.shape[0]
    pos = jnp.arange(pad, dtype=jnp.int32)

    (
        nxt, lit_start, ll, offset, ml, out_inc,
        is_final, f_lit_oob, f_truncated, f_offset_zero, f_terminated,
    ) = _speculative_tables(u8, n)

    # --- chain reachability by pointer doubling ---------------------------
    # Slot `pad` is the terminal sentinel; position n (the end of the stream)
    # maps into the pad region whose successor is the sentinel.
    sent = pad
    J = jnp.where(pos < n, jnp.clip(nxt, 0, sent), sent)
    J = jnp.concatenate([J, jnp.array([sent], jnp.int32)])
    # zeros_like(J), not zeros(...): the loop carry must inherit J's batching
    # under vmap or the fori carry types mismatch.
    M = jnp.zeros_like(J).at[0].set(1)

    rounds = max(1, (pad + 1).bit_length())

    def body(_, carry):
        M, J = carry
        M = M.at[J].max(M)
        return M, J[J]

    M, _ = jax.lax.fori_loop(0, rounds, body, (M, J))
    M = M[:pad]
    on_chain = (M == 1) & (pos < n)

    # --- output offsets: masked exclusive prefix sum ----------------------
    inc = jnp.where(on_chain, out_inc, 0)
    cum = packing.tiled_cumsum(inc)
    out_off = cum - inc
    total_out = cum[pad - 1]

    # --- error taxonomy (only chain positions count) ----------------------
    # "Never terminated" counts as truncation only when no specific error
    # explains it (error-type parity with the host parser).
    err_lit_oob = jnp.any(on_chain & f_lit_oob)
    terminated = jnp.any(on_chain & f_terminated)
    err_offset_zero = jnp.any(on_chain & f_offset_zero)
    err_truncated = jnp.any(on_chain & f_truncated) | (
        ~terminated & ~err_lit_oob & ~err_offset_zero
    )

    # --- compaction to a fixed-width sequence table -----------------------
    rank = packing.tiled_cumsum(on_chain.astype(jnp.int32)) - 1
    nseq = rank[pad - 1] + 1
    tgt = jnp.where(on_chain, rank, nseq_pad)  # dropped when not on chain

    def compact(field, fill):
        return (
            jnp.full(nseq_pad, fill, dtype=jnp.int32).at[tgt].set(field, mode="drop")
        )

    return (
        compact(lit_start, 0),
        compact(ll, 0),
        compact(offset, 1),
        compact(ml, 0),
        compact(out_off, 0),
        nseq,
        total_out,
        jnp.stack([err_lit_oob, err_truncated, err_offset_zero]),
    )


def parse_walk_core(u8: jnp.ndarray, n: jnp.ndarray, *, nseq_pad: int):
    """Token-walk parse: the speculative per-position tables are computed
    vectorized, then the real chain is walked sequentially on the scalar
    core with a while_loop emitting one sequence per step.

    Same interface as parse_core. Why both exist: the walk costs
    O(nseq) sequential steps (~1.5 us/step solo, ~7x cheaper per element
    when vmapped — lanes walk in lockstep), while the pointer-doubling
    reachability costs O(log n) full-array scatter+gather rounds at the
    ~110 M elem/s scalar gather rate (PERF.md). For frame-sized blocks,
    batched walks win by ~50x; the doubling version remains the
    fully-parallel formulation.
    """
    (
        nxt, lit_start, ll, offset, ml, out_inc,
        is_final, f_lit_oob, f_truncated, f_offset_zero, f_terminated,
    ) = _speculative_tables(u8, n)
    # One packed row per position so each walk step is a single dynamic slice.
    tbl = jnp.stack(
        [
            nxt,
            lit_start,
            ll,
            offset,
            ml,
            (
                f_lit_oob.astype(jnp.int32)
                | (f_truncated.astype(jnp.int32) << 1)
                | (f_offset_zero.astype(jnp.int32) << 2)
                | (f_terminated.astype(jnp.int32) << 3)
                | (is_final.astype(jnp.int32) << 4)
            ),
        ],
        axis=1,
    )
    pad = u8.shape[0]

    def cond(c):
        ip, _opos, i, *_ = c
        return jnp.logical_and(i < nseq_pad, ip < n)

    def body(c):
        ip, opos, i, err, done, LS, LL, MO, ML, OO = c
        row = jax.lax.dynamic_slice(tbl, (jnp.clip(ip, 0, pad - 1), 0), (1, 6))[0]
        nxt_i, ls_i, ll_i, off_i, ml_i, flags = (
            row[0], row[1], row[2], row[3], row[4], row[5],
        )
        LS = LS.at[i].set(ls_i)
        LL = LL.at[i].set(ll_i)
        MO = MO.at[i].set(off_i)
        ML = ML.at[i].set(ml_i)
        OO = OO.at[i].set(opos)
        err = err | (flags & 0b111)
        done = done | ((flags >> 3) & 1)
        bad = (flags & 0b111) != 0
        ip = jnp.where(bad, n, nxt_i)
        return ip, opos + ll_i + ml_i, i + 1, err, done, LS, LL, MO, ML, OO

    # Carries add 0*n so they inherit n's batching under vmap (see the
    # zeros_like note in parse_core). (A packed (nseq_pad, 6) record array
    # with one row write per step measured ~35% SLOWER than five separate
    # 1-D writes — dynamic_update_slice on the 2-D carry defeats the
    # in-place update.)
    zb = (n * 0).astype(jnp.int32)
    za = jnp.zeros(nseq_pad, jnp.int32) + zb
    init = (zb, zb, zb, zb, zb, za, za, za + 1, za, za)
    ip, opos, i, err, done, LS, LL, MO, ML, OO = jax.lax.while_loop(cond, body, init)
    # "Never terminated" counts as truncation only when no specific error
    # explains the stop (parity with the doubling engine / host parser).
    other = (err & 0b101) != 0
    errs = jnp.stack(
        [
            (err & 1) == 1,
            (((err >> 1) & 1) == 1) | ((done == 0) & ~other),
            ((err >> 2) & 1) == 1,
        ]
    )
    return LS, LL, MO, ML, OO, i, opos, errs


def parse_strided_core(u8: jnp.ndarray, n: jnp.ndarray, *, lanes: int):
    """Strided speculative walk: the whole-buffer parse without O(n) rounds
    or a single serial cursor.

    The buffer is cut into ``lanes`` equal segments. Every lane walks the
    speculative successor graph (`_speculative_tables`) in lockstep — the
    measured fast shape for sequential chains on TPU (PERF.md: ~0.2 us per
    step-lane vs ~1.5 us solo). Three passes:

      A. from the raw segment boundaries (almost certainly mid-token) to the
         first position past the next boundary — LZ4 token streams
         self-synchronize, so each exit is with high probability the true
         chain's entry into the next segment;
      B. from the pass-A exits, re-walk and check the fixpoint
         exit[i] == entry[i+1]. Lane 0 starts at 0, which is always a true
         token start, so by induction the fixpoint proves every lane walked
         the true chain (the reference walks this chain with one cursor,
         src/block/decompress.rs:244-340). Retries with improved entries
         handle slow synchronization; pathological streams that never
         stabilize set the `unconverged` flag (caller falls back to the
         doubling engine).
      C. a record walk from the validated entries, writing each lane's
         sequences into its own row of (lanes, L) tables at
         globally-correct output offsets (bases from an exclusive scan of
         per-lane totals). L = segment//3 + 2 bounds any lane's sequence
         count (a sequence occupies >= 3 bytes), so no overflow is possible.

    Returns per-lane tables (LS, LL, MO, ML, OO): (lanes, L) int32, plus
    nseq_i (lanes,), total_out, nseq, error flags (3,), unconverged flag.
    Padding entries carry the expansion-safe fills (OO = out-of-range is NOT
    set here; callers mask with li < nseq_i).
    """
    pad = u8.shape[0]
    (
        nxt, lit_start, ll, offset, ml, out_inc,
        is_final, f_lit_oob, f_truncated, f_offset_zero, f_terminated,
    ) = _speculative_tables(u8, n)
    S = lanes
    seg = pad // S
    L = seg // 3 + 2
    flags = (
        f_lit_oob.astype(jnp.int32)
        | (f_truncated.astype(jnp.int32) << 1)
        | (f_offset_zero.astype(jnp.int32) << 2)
        | (f_terminated.astype(jnp.int32) << 3)
        | (is_final.astype(jnp.int32) << 4)
    )
    bad_stop = (flags & 0b111) != 0
    # Successor with error/final semantics folded in: errors and the final
    # sequence stop the walk by jumping to n.
    nxt_eff = jnp.where(bad_stop | is_final, jnp.int32(1) << 28, nxt)
    starts = jnp.arange(S, dtype=jnp.int32) * seg
    ends = starts + seg

    def walk_count(e, end):
        # follow the chain from e to the first position >= end; count
        # sequences and accumulate output size and error flags on the way
        def cond(c):
            ip = c[0]
            return (ip < end) & (ip < n)

        def body(c):
            ip, cnt, out, err = c
            ipc = jnp.clip(ip, 0, pad - 1)
            err = err | flags[ipc]
            return nxt_eff[ipc], cnt + 1, out + out_inc[ipc], err

        z = (n * 0).astype(jnp.int32)
        ip, cnt, out, err = jax.lax.while_loop(cond, body, (e, z, z, z))
        return ip, cnt, out, err

    # Pass A: exits from the speculative boundary entries (counts discarded).
    xA, _, _, _ = jax.vmap(walk_count)(starts, ends)

    # Pass B (+ retries): entries from the previous pass's exits. A lane set
    # is a fixpoint when re-walking from `entries` reproduces those same
    # entries (entry i+1 == exit i; entries past the chain end compare as
    # ">= n"). Lane 0 is pinned at 0 — always a true token start — so at a
    # fixpoint induction proves every lane walked the true chain. Each retry
    # validates at least one more lane prefix, so the loop always terminates
    # on valid data; the cap guards adversarial never-synchronizing streams.
    def entries_from(exits):
        return jnp.concatenate([jnp.zeros(1, jnp.int32), exits[:-1]])

    def is_fixpoint(e, exits):
        e2 = entries_from(exits)
        return jnp.all((e2 == e) | ((e2 >= n) & (e >= n)))

    def r_cond(c):
        e, exits, nseq_i, out_i, err_i, i = c
        return (~is_fixpoint(e, exits)) & (i < 8)

    def r_body(c):
        e, exits, _, _, _, i = c
        e2 = entries_from(exits)
        exits2, cnt, out, err = jax.vmap(walk_count)(e2, ends)
        return e2, exits2, cnt, out, err, i + 1

    eB = entries_from(xA)
    exits, nseq_i, out_i, err_i = jax.vmap(walk_count)(eB, ends)
    eB, exits, nseq_i, out_i, err_i, _ = jax.lax.while_loop(
        r_cond, r_body, (eB, exits, nseq_i, out_i, err_i, jnp.int32(0))
    )
    unconverged = ~is_fixpoint(eB, exits)
    err_lit_oob = jnp.any((err_i & 1) == 1)
    err_trunc_bit = jnp.any(((err_i >> 1) & 1) == 1)
    err_offset_zero = jnp.any(((err_i >> 2) & 1) == 1)
    terminated = jnp.any(((err_i >> 3) & 1) == 1)
    nseq = jnp.sum(nseq_i)
    total_out = jnp.sum(out_i)

    # Per-lane bases.
    cum_n = jnp.cumsum(nseq_i)
    cum_o = jnp.cumsum(out_i)
    base_n = cum_n - nseq_i
    base_o = cum_o - out_i

    # Pass C: record walk.
    def walk_record(e, end, obase):
        LS = jnp.zeros(L, jnp.int32) + (n * 0)
        LL = jnp.zeros_like(LS)
        MO = jnp.ones_like(LS)
        ML = jnp.zeros_like(LS)
        OO = jnp.zeros_like(LS)

        def cond(c):
            ip, i = c[0], c[2]
            return (ip < end) & (ip < n) & (i < L)

        def body(c):
            ip, opos, i, LS, LL, MO, ML, OO = c
            ipc = jnp.clip(ip, 0, pad - 1)
            LS = LS.at[i].set(lit_start[ipc])
            LL = LL.at[i].set(ll[ipc])
            MO = MO.at[i].set(jnp.maximum(offset[ipc], 1))
            ML = ML.at[i].set(ml[ipc])
            OO = OO.at[i].set(opos)
            return (
                nxt_eff[ipc], opos + out_inc[ipc], i + 1, LS, LL, MO, ML, OO,
            )

        z = (n * 0).astype(jnp.int32)
        c = jax.lax.while_loop(cond, body, (e, obase + z, z, LS, LL, MO, ML, OO))
        return c[3], c[4], c[5], c[6], c[7]

    LS, LL, MO, ML, OO = jax.vmap(walk_record)(eB, ends, base_o)

    other = err_lit_oob | err_offset_zero
    err_truncated = err_trunc_bit | (~terminated & ~other)
    errs = jnp.stack([err_lit_oob, err_truncated, err_offset_zero])
    return LS, LL, MO, ML, OO, nseq_i, nseq, total_out, errs, unconverged


_parse_kernel = partial(jax.jit, static_argnames=("nseq_pad",))(parse_core)
_parse_walk_kernel = partial(jax.jit, static_argnames=("nseq_pad",))(parse_walk_core)


def default_parse_engine() -> str:
    """"walk" on TPU (lockstep sequential walks are ~50x cheaper than
    doubling there), "doubling" elsewhere (CPU while_loops iterate in ~us,
    making the vectorized form faster)."""
    return "walk" if jax.default_backend() == "tpu" else "doubling"


def parse_sequences_device(data, *, engine: str | None = None) -> SeqTable:
    """Parse a compressed block into a SeqTable entirely on the device.

    ``engine``: "walk" (sequential token walk) or "doubling"
    (pointer-doubling reachability, the fully-parallel form); default picks
    by platform. Raises the block error taxonomy on malformed input,
    mirroring the host parser (sequences.parse_sequences_host).
    """
    if engine is None:
        engine = default_parse_engine()
    comp = (
        np.ascontiguousarray(data, dtype=np.uint8)
        if isinstance(data, np.ndarray)
        else (np.frombuffer(data, np.uint8) if len(data) else np.empty(0, np.uint8))
    )
    n = comp.shape[0]
    if n == 0:
        raise block_errors.ExpectedAnotherByte()
    # +1: at least one zero pad byte must follow the payload, or a block
    # ending mid-0xFF LSIC run reads the last in-bounds byte as a terminator
    # instead of flagging truncation (packing.lsic_tables contract).
    pad = packing.size_bucket(n + 1)
    nseq_pad = packing.size_bucket(max(4, pad // 3 + 2), minimum=256)
    u8 = jnp.asarray(packing.pad_to(comp, pad))
    kernel = _parse_walk_kernel if engine == "walk" else _parse_kernel
    ls, ll, mo, ml, oo, nseq, total, errs = kernel(
        u8, jnp.int32(n), nseq_pad=nseq_pad
    )
    errs = np.asarray(errs)
    # Truncation first: a run-off LSIC field sets both flags, and the host
    # parser reports it as ExpectedAnotherByte.
    if errs[1]:
        raise block_errors.ExpectedAnotherByte()
    if errs[0]:
        raise block_errors.LiteralOutOfBounds()
    if errs[2]:
        raise block_errors.OffsetZero()
    nseq = int(nseq)
    return SeqTable(
        np.asarray(ls[:nseq]),
        np.asarray(ll[:nseq]),
        np.asarray(mo[:nseq]),
        np.asarray(ml[:nseq]),
        np.asarray(oo[:nseq]),
        int(total),
    )
