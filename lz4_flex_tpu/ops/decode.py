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

    # Stage 1: sequence attribution. Padding sequences carry out_off == out_pad
    # and are dropped by the scatter.
    seq_idx = jnp.arange(seq_oo.shape[0], dtype=jnp.int32)
    z = jnp.zeros(out_pad, dtype=jnp.int32)
    z = z.at[seq_oo].max(seq_idx, mode="drop")
    tok = jax.lax.associative_scan(jnp.maximum, z)

    oo = seq_oo[tok]
    ls = seq_ls[tok]
    ll = seq_ll[tok]
    off = jnp.maximum(seq_mo[tok], 1)  # sanitized: offset 0 would never resolve

    # Stage 2: per-byte source map. Negative values are resolved sources:
    #   -(k+1) with k <  comp_pad        -> literal byte comp[k]
    #   -(k+1) with k >= comp_pad        -> dictionary byte dict[k - comp_pad]
    # Non-negative values point at an earlier output byte (match copy).
    delta = pout - oo
    is_lit = delta < ll
    lit_k = ls + delta
    msrc = pout - off
    dict_k = comp_pad + jnp.clip(dict_len + msrc, 0, dict_words.shape[0] * 4 - 1)
    s = jnp.where(
        is_lit,
        -(lit_k + 1),
        jnp.where(msrc >= 0, msrc, -(dict_k + 1)),
    )
    s = jnp.where(pout < total_out, s, -1)

    def cond(carry):
        s, i = carry
        return jnp.logical_and(jnp.any(s >= 0), i < _MAX_DOUBLING_ROUNDS)

    def body(carry):
        s, i = carry
        g = s[jnp.clip(s, 0, out_pad - 1)]
        return jnp.where(s >= 0, g, s), i + 1

    s, _ = jax.lax.while_loop(cond, body, (s, jnp.int32(0)))

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
    out = _expand_kernel(
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


def decode_parts_fused(parts, *, as_array: bool = False):
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
    parse: str = "host",
    as_array: bool = False,
):
    """Decompress one raw LZ4 block on the device.

    ``parse`` selects the sequence parser: "host" (native C++ sequential
    parse feeding the device expansion — the hybrid fast path) or "device"
    (fully on-device speculative parse, ops/parse.py).

    Returns bytes, or the device uint8 array when ``as_array`` is true.
    """
    comp = _as_u8(data)
    dic = _as_u8(ext_dict)
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
