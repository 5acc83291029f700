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


def parse_core(u8: jnp.ndarray, n: jnp.ndarray, *, nseq_pad: int):
    """The speculative parse as a plain traceable function (vmap/shard_map
    composable). Returns (lit_start, lit_len, match_off, match_len, out_off,
    nseq, total_out, error_flags) with nseq_pad-padded sequence arrays."""
    pad = u8.shape[0]
    pos = jnp.arange(pad, dtype=jnp.int32)
    u = u8.astype(jnp.int32)

    # --- speculative field extraction at every position -------------------
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
    err_lit_oob = jnp.any(on_chain & is_final & (off_pos > n))
    terminated = jnp.any(on_chain & is_final & (off_pos == n))
    err_offset_zero = jnp.any(on_chain & ~is_final & (offset == 0))
    err_truncated = jnp.any(
        on_chain
        & ~is_final
        & ((off_pos + 2 > n) | (nxt > n) | (ll_ext & (pos + 1 + at(lsic_nb, pos + 1) > n)))
    ) | ~terminated

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


_parse_kernel = partial(jax.jit, static_argnames=("nseq_pad",))(parse_core)


def parse_sequences_device(data) -> SeqTable:
    """Parse a compressed block into a SeqTable entirely on the device.

    Raises the block error taxonomy on malformed input, mirroring the host
    parser (sequences.parse_sequences_host).
    """
    comp = (
        np.ascontiguousarray(data, dtype=np.uint8)
        if isinstance(data, np.ndarray)
        else (np.frombuffer(data, np.uint8) if len(data) else np.empty(0, np.uint8))
    )
    n = comp.shape[0]
    if n == 0:
        raise block_errors.ExpectedAnotherByte()
    pad = packing.size_bucket(n)
    nseq_pad = packing.size_bucket(max(4, pad // 3 + 2), minimum=256)
    u8 = jnp.asarray(packing.pad_to(comp, pad))
    ls, ll, mo, ml, oo, nseq, total, errs = _parse_kernel(
        u8, jnp.int32(n), nseq_pad=nseq_pad
    )
    errs = np.asarray(errs)
    if errs[0]:
        raise block_errors.LiteralOutOfBounds()
    if errs[1]:
        raise block_errors.ExpectedAnotherByte()
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
