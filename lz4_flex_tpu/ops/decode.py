"""Device block decode: data-parallel sequence expansion.

The reference decodes with a sequential token walk and wild copies (lz4_flex
src/block/decompress.rs:201-444). The TPU formulation inverts it into three
vectorized stages over the whole output at once:

  1. attribution — scatter each sequence's index at its output offset and
     forward-fill with a cumulative max, giving every output byte its owning
     sequence in O(n);
  2. source resolution — every output byte is either a literal (source in the
     compressed stream) or a match byte (source = an earlier *output*
     position). Match chains (matches copying from matches, including
     self-overlapping RLE runs) are collapsed with pointer doubling:
     s <- s[s] resolves chains of depth 2^r after r rounds;
  3. materialization — one funnel-shift word gather from the compressed
     stream (and the external dictionary, when present) yields the bytes.

All stages are jnp programs under jit; shapes are padded to static buckets so
compilations are reused across calls.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..block import errors as block_errors
from . import packing
from .sequences import SeqTable, parse_sequences_host

_MAX_DOUBLING_ROUNDS = 40  # chains deeper than 2^40 bytes cannot exist


def expand_core(
    comp_words: jnp.ndarray,  # (COMP_PAD/4,) uint32 — packed compressed bytes
    dict_words: jnp.ndarray,  # (DICT_PAD/4,) uint32 — packed dictionary bytes
    seq_oo: jnp.ndarray,  # (NSEQ_PAD,) int32 — output offset per sequence
    seq_ls: jnp.ndarray,  # (NSEQ_PAD,) int32 — literal start (compressed pos)
    seq_ll: jnp.ndarray,  # (NSEQ_PAD,) int32 — literal length
    seq_mo: jnp.ndarray,  # (NSEQ_PAD,) int32 — match offset
    dict_len: jnp.ndarray,  # () int32
    total_out: jnp.ndarray,  # () int32
    *,
    out_pad: int,
    has_dict: bool,
) -> jnp.ndarray:
    """The expansion stages as a plain traceable function (vmap/shard_map
    composable); see the module docstring for the three-stage structure."""
    comp_pad = comp_words.shape[0] * 4
    pout = jnp.arange(out_pad, dtype=jnp.int32)

    # Stages 1+2 fused: the per-byte source map is PIECEWISE AFFINE in the
    # output position — on a literal segment s(p) = -(p + C_i + 1) with
    # C_i = lit_start_i - out_off_i, on a match segment s(p) = p - off_i.
    # So one piecewise-constant value array V (C_i on literal segments,
    # off_i on match segments) and one segment flag F reconstruct s with two
    # sparse scatter-adds of per-sequence deltas and two tiled cumsums —
    # no per-byte gathers at all (XLA:TPU gathers run ~110 M elem/s, so
    # per-byte table lookups would dominate the whole kernel).
    off_i = jnp.maximum(seq_mo, 1)  # sanitized: offset 0 would never resolve
    c_i = seq_ls - seq_oo
    prev_off = jnp.concatenate([jnp.zeros(1, jnp.int32), off_i[:-1]])
    d_lit = c_i - prev_off  # value delta entering seq i's literal segment
    d_match = off_i - c_i  # value delta entering seq i's match segment
    lit_starts = seq_oo  # padding seqs carry out_off == out_pad -> dropped
    match_starts = jnp.clip(seq_oo + seq_ll, 0, out_pad)

    V = jnp.zeros(out_pad, dtype=jnp.int32)
    V = V.at[lit_starts].add(d_lit, mode="drop")
    V = V.at[match_starts].add(d_match, mode="drop")
    V = packing.tiled_cumsum(V)

    F = jnp.zeros(out_pad, dtype=jnp.int32)
    F = F.at[lit_starts].add(1, mode="drop")
    F = F.at[match_starts].add(-1, mode="drop")
    F = packing.tiled_cumsum(F)

    is_lit = F > 0
    lit_k = pout + V  # = lit_start + (p - out_off)
    msrc = pout - V  # = p - offset
    dict_k = comp_pad + jnp.clip(dict_len + msrc, 0, dict_words.shape[0] * 4 - 1)
    s = jnp.where(
        is_lit,
        -(lit_k + 1),
        jnp.where(msrc >= 0, msrc, -(dict_k + 1)),
    )
    s = jnp.where(pout < total_out, s, -1)

    # Pointer doubling. Gathers on XLA:TPU run at a fixed ~110 M elem/s
    # (PERF.md), so pass cost is proportional to the gathered element count:
    # two dense rounds collapse chains of depth <= 4, then the surviving
    # positions (typically a few percent) are compacted into a small workset
    # and chased there, falling back to dense rounds if the workset
    # overflows. (One dense round + a bigger workset measured ~25% slower.)
    # The unresolved-check is computed INSIDE loop bodies so it fuses with
    # the round's traversal instead of costing its own pass.
    def dense_round(s):
        g = s[jnp.clip(s, 0, out_pad - 1)]
        return jnp.where(s >= 0, g, s)

    s = dense_round(dense_round(s))

    un_pad = max(4096, out_pad // 8)
    mask = s >= 0
    cnt = jnp.sum(mask.astype(jnp.int32))
    rank = packing.tiled_cumsum(mask.astype(jnp.int32)) - 1
    # Sentinel entries point at position 0 (always resolved: the first output
    # byte of a valid stream is a literal); their write-back is a no-op.
    uidx = jnp.zeros(un_pad, dtype=jnp.int32).at[
        jnp.where(mask, rank, un_pad)
    ].set(pout, mode="drop")

    def cond(carry):
        _, active, i = carry
        return jnp.logical_and(active, i < _MAX_DOUBLING_ROUNDS)

    def compact_body(carry):
        s, _, i = carry
        su = s[uidx]
        g = s[jnp.clip(su, 0, out_pad - 1)]
        new = jnp.where(su >= 0, g, su)
        s = s.at[uidx].set(new)
        return s, jnp.any(new >= 0), i + 1

    def dense_body(carry):
        s, _, i = carry
        s = dense_round(s)
        return s, jnp.any(s >= 0), i + 1

    def run_compact(s):
        out = jax.lax.while_loop(
            cond, compact_body, (s, jnp.any(mask), jnp.int32(0))
        )
        return out[0]

    def run_dense(s):
        out = jax.lax.while_loop(cond, dense_body, (s, jnp.any(mask), jnp.int32(0)))
        return out[0]

    s = jax.lax.cond(cnt <= un_pad, run_compact, run_dense, s)

    # Stage 3: materialize bytes from the resolved sources.
    k = -s - 1
    lit_bytes = packing.gather_bytes(comp_words, k)
    if has_dict:
        dict_bytes = packing.gather_bytes(dict_words, k - comp_pad)
        out = jnp.where(k < comp_pad, lit_bytes, dict_bytes)
    else:
        out = lit_bytes
    return out.astype(jnp.uint8)


_expand_kernel = partial(jax.jit, static_argnames=("out_pad", "has_dict"))(expand_core)


def _expand2_kernel(*args, **kw):
    from .expand2 import expand2_core

    return partial(jax.jit, static_argnames=("out_pad", "has_dict"))(expand2_core)(
        *args, **kw
    )


def default_expand_engine() -> str:
    """Expansion kernel selection: "v2" (fragment-structured cell kernels,
    ops/expand2.py — row-gather pulls, ~1.5x v1 on TPU and the basis of the
    Pallas pipeline) or "v1" (per-byte doubling, expand_core). Override via
    TLZ4_EXPAND=v1."""
    import os

    return os.environ.get("TLZ4_EXPAND", "v2")


def decode_resident_core(
    u8,
    clen,
    *,
    out_pad,
    nseq_pad,
    parse_engine="doubling",
    capacity=None,
    expand_engine=None,
):
    """Fully-on-device decode of one independent block: on-device parse +
    expansion fused in one traceable function. Input and output stay in HBM
    (the production shape: compressed bytes feed a device pipeline without a
    host roundtrip). Returns (out[out_pad] uint8, total_out, error_flags).

    error_flags is a (5,) bool vector: [literal_oob, truncated, offset_zero,
    offset_oob, output_too_small] — the checked-decode error set of lz4_flex
    src/block/mod.rs:82-98 plus the capacity check."""
    from .parse import parse_core, parse_walk_core

    parse = parse_walk_core if parse_engine == "walk" else parse_core
    ls, ll, mo, ml, oo, nseq, total, errs = parse(u8, clen, nseq_pad=nseq_pad)
    seq_i = jnp.arange(nseq_pad, dtype=jnp.int32)
    real = seq_i < nseq
    # Checked-decode bounds the parse flags cannot see: a match reaching
    # before the block start (no dict in the resident path) and an output
    # exceeding the static capacity (silent clamp/truncation otherwise).
    off_oob = jnp.any(real & (ml > 0) & (oo + ll - mo < 0))
    out_oob = total > (out_pad if capacity is None else capacity)
    errs = jnp.concatenate([errs, jnp.stack([off_oob, out_oob])])
    oo = jnp.where(real, oo, out_pad)
    mo = jnp.where(real, mo, 1)
    words = packing.bytes_to_words(u8)
    if expand_engine is None:
        expand_engine = default_expand_engine()
    if expand_engine == "v2":
        from .expand2 import expand2_core as expand_fn
    else:
        expand_fn = expand_core
    out = expand_fn(
        words,
        jnp.zeros(1, jnp.uint32),
        oo,
        ls,
        ll,
        mo,
        jnp.int32(0),
        total,
        out_pad=out_pad,
        has_dict=False,
    )
    return out, total, errs


decode_resident = partial(
    jax.jit,
    static_argnames=(
        "out_pad",
        "nseq_pad",
        "parse_engine",
        "capacity",
        "expand_engine",
    ),
)(decode_resident_core)

_EMPTY_WORDS = np.zeros(1, dtype=np.uint32)


def _pack_host(buf: np.ndarray, pad: int) -> np.ndarray:
    """Pad a host uint8 buffer to ``pad`` bytes and view as u32le words."""
    out = np.zeros(pad, dtype=np.uint8)
    out[: buf.shape[0]] = buf
    return out.view("<u4")


def _as_u8(data) -> np.ndarray:
    if isinstance(data, np.ndarray):
        return np.ascontiguousarray(data, dtype=np.uint8)
    if len(data) == 0:
        return np.empty(0, np.uint8)
    return np.frombuffer(data, dtype=np.uint8)


def expand_on_device(
    comp: np.ndarray,
    seq: SeqTable,
    ext_dict: np.ndarray,
    capacity: int,
    engine: str | None = None,
) -> jnp.ndarray:
    """Run the expansion kernel for a host-parsed block; returns the device
    array of ``seq.total_out`` bytes (as a sliced view of the padded output)."""
    comp_pad = packing.size_bucket(max(comp.shape[0], 4))
    out_pad = packing.size_bucket(max(seq.total_out, 4))
    nseq_pad = packing.size_bucket(max(seq.nseq, 4), minimum=256)
    has_dict = ext_dict.shape[0] > 0
    if has_dict:
        dict_words = _pack_host(ext_dict, packing.size_bucket(ext_dict.shape[0]))
    else:
        dict_words = _EMPTY_WORDS
    if engine is None:
        engine = default_expand_engine()
    kernel = _expand2_kernel if engine == "v2" else _expand_kernel
    out = kernel(
        _pack_host(comp, comp_pad),
        dict_words,
        packing.pad_to(seq.out_off, nseq_pad, fill=out_pad),
        packing.pad_to(seq.lit_start, nseq_pad),
        packing.pad_to(seq.lit_len, nseq_pad),
        packing.pad_to(seq.match_off, nseq_pad, fill=1),
        jnp.int32(ext_dict.shape[0]),
        jnp.int32(seq.total_out),
        out_pad=out_pad,
        has_dict=has_dict,
    )
    return out[: seq.total_out]


def _validate(seq: SeqTable, dict_len: int, capacity: int) -> None:
    """Checked-decode validation on the host-parsed sequence table
    (the error set of lz4_flex src/block/mod.rs:82-98)."""
    if seq.total_out > capacity:
        raise block_errors.OutputTooSmall(seq.total_out, capacity)
    if seq.nseq == 0:
        return
    match_start = (
        seq.out_off.astype(np.int64)
        + seq.lit_len.astype(np.int64)
        - seq.match_off.astype(np.int64)
    )
    bad = (seq.match_len > 0) & (match_start < -int(dict_len))
    if bad.any():
        raise block_errors.OffsetOutOfBounds()


def decode_parts_fused(
    parts,
    *,
    as_array: bool = False,
    independent: bool = False,
    max_block_size: int | None = None,
):
    """Decode a whole multi-block frame body in ONE device expansion.

    ``parts`` is the frame's block list in order: (payload, is_compressed)
    pairs (stored blocks pass through as literals). Per-block sequence tables
    are merged into a single global table — output offsets shifted by each
    block's base, literal starts shifted by each payload's position in the
    concatenated compressed buffer. Linked-mode window references
    (src/frame/decompress.rs:282-292) then need no dictionary plumbing at
    all: a match into the previous block's tail is just a global output
    position, and the pointer-doubling resolution handles the whole frame's
    dependency graph at once. Stored blocks become literal-only
    pseudo-sequences.

    ``independent`` validates each block's matches against its own output
    only (the reference decodes independent-mode blocks with no dictionary,
    src/frame/decompress.rs:294-306 — a cross-block back-reference must
    raise OffsetOutOfBounds, not silently resolve through earlier blocks).
    ``max_block_size`` caps every block's decompressed size (the reference's
    dst buffer is exactly one block, so oversized blocks cannot allocate
    unboundedly).

    Returns the decompressed frame body as bytes (or a device array).
    """
    bufs = []
    tables = []
    cbase = 0
    obase = 0
    for payload, is_comp in parts:
        p = _as_u8(payload)
        if is_comp:
            seq = parse_sequences_host(p)
            if independent:
                # Block-local bounds: matches must stay inside this block.
                _validate(seq, 0, max_block_size or seq.total_out)
            elif max_block_size is not None and seq.total_out > max_block_size:
                raise block_errors.OutputTooSmall(seq.total_out, max_block_size)
            tables.append(
                (
                    seq.lit_start + cbase,
                    seq.lit_len,
                    seq.match_off,
                    seq.match_len,
                    seq.out_off + obase,
                )
            )
            out_len = seq.total_out
        else:
            tables.append(
                (
                    np.array([cbase], np.int32),
                    np.array([p.shape[0]], np.int32),
                    np.array([0], np.int32),
                    np.array([0], np.int32),
                    np.array([obase], np.int32),
                )
            )
            out_len = p.shape[0]
        bufs.append(p)
        cbase += p.shape[0]
        obase += out_len
    if not bufs:
        return b"" if not as_array else jnp.zeros(0, jnp.uint8)
    comp = np.concatenate(bufs) if len(bufs) > 1 else bufs[0]
    merged = SeqTable(
        np.concatenate([t[0] for t in tables]),
        np.concatenate([t[1] for t in tables]),
        np.concatenate([t[2] for t in tables]),
        np.concatenate([t[3] for t in tables]),
        np.concatenate([t[4] for t in tables]),
        obase,
    )
    _validate(merged, 0, obase)
    out = expand_on_device(comp, merged, np.empty(0, np.uint8), obase)
    if as_array:
        return out
    return bytes(np.asarray(out).tobytes())


def decode_block_device(
    data,
    max_output_size: int,
    ext_dict=b"",
    *,
    parse: str = "ring",
    as_array: bool = False,
):
    """Decompress one raw LZ4 block on the device.

    ``parse`` selects the engine: "ring" (the default — host plan build
    feeding the Pallas ring kernel, the production fast path; dictionaries
    ride as a stored pseudo-block through the kernel's linked window; falls
    back to "host" off-TPU or when the block does not fit the static plan
    shape), "host" (native C++ sequential parse feeding the XLA expansion),
    or "device" (fully on-device speculative parse, ops/parse.py).

    Returns bytes, or the device uint8 array when ``as_array`` is true.
    """
    comp = _as_u8(data)
    dic = _as_u8(ext_dict)
    if parse == "ring":
        from .ringdecode import (
            build_ring_plan,
            decode_block_ring,
            decode_parts_ring,
            ring_engine_available,
        )

        out = None
        if ring_engine_available():
            seq = parse_sequences_host(comp)
            _validate(seq, dic.shape[0], max_output_size)
            if dic.shape[0]:
                # Dictionary decode through the ring: the dict rides as a
                # stored pseudo-block ahead of the payload (only its last
                # 64 KiB is reachable — LZ4 offsets cap at 65535), the
                # linked-mode window resolves the cross references, and the
                # dict prefix is sliced off — the same trick the streaming
                # frame decoder uses for its linked window
                # (frame/decoder.py::_decode_parts_device).
                dtail = dic[-65536:]
                out = decode_parts_ring(
                    [(dtail, False), (comp, True)], independent=False
                )
                if out is not None:
                    out = out[dtail.shape[0] :]
            else:
                plan = build_ring_plan(comp, seq.total_out)
                if plan is not None:
                    out = decode_block_ring(comp, seq.total_out, plan=plan)
        if out is not None:
            if as_array:
                import jax.numpy as jnp

                return jnp.asarray(np.frombuffer(out, np.uint8))
            return out
        parse = "host"
    if parse == "device":
        from .parse import parse_sequences_device

        seq = parse_sequences_device(comp)
    else:
        seq = parse_sequences_host(comp)
    _validate(seq, dic.shape[0], max_output_size)
    out = expand_on_device(comp, seq, dic, max_output_size)
    if as_array:
        return out
    return bytes(np.asarray(out).tobytes())
