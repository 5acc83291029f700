"""Device block encode: data-parallel greedy LZ4 compression.

The reference encoder walks a cursor with a 4096-entry hash table (lz4_flex
src/block/compress.rs:318-489). The TPU formulation computes everything for
all positions at once and recovers the greedy walk algebraically:

  1. candidates — the k closest previous occurrences of every 4-byte word,
     found by a lexicographic (word, position) sort: the j-th predecessor
     with an equal word is the j-th-closest occurrence. This is *exact*
     closest-match search — strictly stronger than the reference's
     collision-prone 4096-entry table.
  2. match lengths — longest common prefix of (p, candidate) via binary
     lifting over power-of-two substring fingerprints; exact for levels
     0..2 (byte/u16/u32 loads), fingerprinted above that. Fingerprint
     collisions (~2^-32) can only overestimate a length; the optional
     roundtrip verify catches that and falls back to the host encoder.
     The selector keeps the longest candidate match, with a one-step lazy
     deferral when the next position holds a strictly longer match.
  3. greedy chain — cursor jumps (match ? p+len : p+1) form a functional
     graph; the emitted sequence set is the orbit of the start position,
     recovered by pointer-doubling reachability exactly as in the decoder's
     parse (ops/parse.py).
  4. backward extension — matches extend left over their literal run while
     bytes agree (capped), mirroring backtrack_match
     (src/block/compress.rs:252-287).
  5. emission — per-sequence wire lengths (token/LSIC/literals/offset) are
     prefix-summed into byte offsets; every output byte then computes its
     role and value independently.

Large inputs are encoded as fixed-shape 512 KiB chunks sliced ON DEVICE
from the resident stream, each chunk's dictionary simply being the
preceding 64 KiB — lossless chunking, because the LZ4 window is 64 KiB
(src/block/mod.rs:35). The per-chunk sequence tables are merged on device
in their stacked layout (literal runs merge across boundaries via per-chunk
carry fixups; see _merge_emit) before one global emission pass; only
per-chunk (nm, last_end) scalars visit the host. Fixed chunk shapes mean
the expensive match kernel compiles once per width, not per input size
(XLA:TPU compiles large sorts and scans in O(n^2) time; see
ops/packing.py tiled_scan).

External dictionaries ride the same machinery: the dictionary is prepended
in "concat space", candidates may land in it, and offsets fall out naturally
(the decoder's negative-source convention, ops/decode.py).

Spec conformance (lz4_Block_format.md via src/block/mod.rs:35-70): matches
start >= 13 bytes before the (chunk) end, end at least 5 bytes before it,
offsets are 1..65535, inputs shorter than LZ4_MIN_LENGTH stay literal-only.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..spec.constants import WINDOW_SIZE, get_maximum_output_size
from . import packing

_C1 = np.uint32(0x85EBCA6B)
_C2 = np.uint32(0xC2B2AE35)
_C3 = np.uint32(0x9E3779B1)

# Fixed chunking geometry for large inputs.
_CHUNK_W = 1 << 19  # 512 KiB row width (dict + data + slack)
_CHUNK_C = _CHUNK_W - WINDOW_SIZE - 4  # data bytes per chunk


def _mix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Combine two span fingerprints into the covering span's fingerprint.

    Each input goes through multiply + xorshift BEFORE combining and the
    combine is a modular add: a purely (F2- or Z/2^32-)linear combine like
    `a ^ rotl(b, r)` admits input-independent differential cancellation —
    e.g. '.'/',' (bit 9) in one word and 's'/'c' (bit 28 = 9-13 mod 32) in
    the other collide EXACTLY, and English text hits such correlated ASCII
    pairs constantly, producing systematic bogus matches."""
    a = a.astype(jnp.uint32) * _C1
    a = a ^ (a >> 16)
    b = b.astype(jnp.uint32) * _C2
    b = b ^ (b >> 16)
    h = (a + b) * _C3
    return h ^ (h >> 15)


def _shift_read(arr: jnp.ndarray, k: int) -> jnp.ndarray:
    """arr shifted left by k (arr[i+k]), zero-padded — contiguous, no gather."""
    if k == 0:
        return arr
    return jnp.concatenate([arr[k:], jnp.zeros(k, arr.dtype)])


def match_core(
    u8: jnp.ndarray,  # (PAD,) uint8 — dict ++ data, zero padded
    d: jnp.ndarray,  # () int32 — dict length (data starts here)
    n: jnp.ndarray,  # () int32 — dict + data length
    *,
    levels: int,
    nseq_pad: int,
):
    """Stages 1-4 for one chunk: returns compacted per-match arrays
    (lit_len, lit_start, offset, match_len — chunk coordinates), the match
    count, and last_end (where the trailing literal run begins)."""
    pad = u8.shape[0]
    pos = jnp.arange(pad, dtype=jnp.int32)
    u = u8.astype(jnp.uint32)

    # Unaligned 4-byte words at every position (shifted ors, no gathers).
    w4 = u | (_shift_read(u, 1) << 8) | (_shift_read(u, 2) << 16) | (
        _shift_read(u, 3) << 24
    )

    # --- 1. k closest previous occurrences ---------------------------------
    n_cands = 4
    sw, sp = jax.lax.sort((w4, pos.astype(jnp.uint32)), num_keys=2)
    spi = sp.astype(jnp.int32)
    cands = []
    for j in range(1, n_cands + 1):
        same = jnp.concatenate([jnp.zeros(j, bool), sw[j:] == sw[:-j]])
        prev = jnp.concatenate([jnp.zeros(j, jnp.int32), spi[:-j]])
        cands.append(
            jnp.full(pad, -1, jnp.int32).at[spi].set(jnp.where(same, prev, -1))
        )

    # --- 2. match lengths by binary lifting --------------------------------
    H = [u, u | (_shift_read(u, 1) << 8), w4]
    for k in range(3, levels + 1):
        H.append(_mix(H[-1], _shift_read(H[-1], 1 << (k - 1))))

    lim = jnp.clip(n - 5 - pos, 0, None)  # match end <= n - 5

    def eq_at(k, a, b):
        hk = H[k]
        return hk[jnp.clip(a, 0, pad - 1)] == hk[jnp.clip(b, 0, pad - 1)]

    eligible = (pos >= d) & (pos <= n - 13) & (lim >= 4)
    cand = jnp.full(pad, -1, jnp.int32)
    mlen = jnp.zeros(pad, jnp.int32)
    for ck in cands:
        valid = eligible & (ck >= 0) & (pos - ck <= 65535)
        c = jnp.maximum(ck, 0)
        ml_k = jnp.full(pad, 4, jnp.int32)
        for k in range(levels, -1, -1):
            step = 1 << k
            ok = (ml_k + step <= lim) & eq_at(k, pos + ml_k, c + ml_k)
            ml_k = ml_k + step * ok
        better = valid & (ml_k > mlen)  # ties keep the closer candidate
        cand = jnp.where(better, ck, cand)
        mlen = jnp.where(better, ml_k, mlen)

    has_match = cand >= 0
    # Lazy one-step deferral: when the next position holds a strictly longer
    # match, step one literal instead of committing now.
    defer = jnp.concatenate(
        [has_match[1:] & (mlen[1:] > mlen[:-1]), jnp.zeros(1, bool)]
    )
    has_match = has_match & ~defer
    mlen = jnp.where(has_match, mlen, 0)
    c = jnp.maximum(cand, 0)

    # --- 3. greedy chain by pointer-doubling reachability ------------------
    sent = pad
    jump = jnp.where(has_match, pos + mlen, pos + 1)
    J = jnp.where(pos < n, jnp.clip(jump, 0, sent), sent)
    J = jnp.concatenate([J, jnp.array([sent], jnp.int32)])
    # zeros_like(J) keeps the carry batched under vmap (see ops/parse.py).
    M = jnp.zeros_like(J).at[d].set(1)
    rounds = max(1, (pad + 1).bit_length())

    def body(_, carry):
        M, J = carry
        M = M.at[J].max(M)
        return M, J[J]

    M, _ = jax.lax.fori_loop(0, rounds, body, (M, J))
    on_chain = (M[:pad] == 1) & (pos < n)
    is_match = on_chain & has_match

    # Previous-match-end forward fill: the literal run feeding each match.
    ends = jnp.where(is_match, pos + mlen, 0)
    E = packing.tiled_cummax(ends)
    E_excl = jnp.concatenate([jnp.zeros(1, jnp.int32), E[:-1]])
    prev_end = jnp.maximum(d, E_excl)

    # --- 4. capped backward extension over the literal run -----------------
    back_cap = jnp.minimum(pos - prev_end, jnp.maximum(cand, 0))
    b = jnp.zeros(pad, jnp.int32)
    live = is_match
    for j in range(1, 17):  # cap: 16 bytes covers nearly all of backtrack_match
        same = u8[jnp.clip(pos - j, 0, pad - 1)] == u8[jnp.clip(c - j, 0, pad - 1)]
        live = live & same & (b + 1 <= back_cap)
        b = b + live.astype(jnp.int32)
    mstart = pos - b
    mlen_x = mlen + b

    # --- compaction --------------------------------------------------------
    lit_len = mstart - prev_end
    rank = packing.tiled_cumsum(is_match.astype(jnp.int32)) - 1
    nmatch = rank[pad - 1] + 1
    tgt = jnp.where(is_match, rank, nseq_pad)

    def compact(field, fill=0):
        return (
            jnp.full(nseq_pad, fill, dtype=jnp.int32).at[tgt].set(field, mode="drop")
        )

    last_end = jnp.maximum(d, E[pad - 1])
    return (
        compact(lit_len),
        compact(prev_end),  # literal start, chunk coords
        compact(pos - c, fill=1),  # offset
        compact(mlen_x),  # match length (after backward extension)
        nmatch,
        last_end,
    )


def emit_core(
    words: jnp.ndarray,  # (SRC_PAD/4,) uint32 — global data, packed
    s_ll: jnp.ndarray,  # (NSEQ_PAD,) int32 — literal length
    s_ls: jnp.ndarray,  # (NSEQ_PAD,) int32 — literal start, global data coords
    s_off: jnp.ndarray,  # (NSEQ_PAD,) int32 — match offset
    s_mlc: jnp.ndarray,  # (NSEQ_PAD,) int32 — match length code (ml-4)
    s_match: jnp.ndarray,  # (NSEQ_PAD,) int32 — 1 when the sequence has a match
    nseq: jnp.ndarray,  # () int32
    *,
    comp_pad: int,
    real: jnp.ndarray | None = None,  # bool mask overriding `seq_i < nseq`
    #   (the resident multi-chunk path emits a STACKED per-chunk table with
    #   gaps — live slots are wherever the mask says, order by flat index)
):
    """Stage 5: serialize a (merged) sequence table to LZ4 wire bytes."""
    nseq_pad = s_ll.shape[0]
    seq_i = jnp.arange(nseq_pad, dtype=jnp.int32)
    if real is None:
        real = seq_i < nseq

    def lsic_n(v):
        return jnp.where(v >= 15, (v - 15) // 255 + 1, 0)

    comp_len = 1 + lsic_n(s_ll) + s_ll + jnp.where(s_match == 1, 2 + lsic_n(s_mlc), 0)
    comp_len = jnp.where(real, comp_len, 0)
    ccum = packing.tiled_cumsum(comp_len)
    s_coff = ccum - comp_len
    total_comp = ccum[nseq_pad - 1]

    q = jnp.arange(comp_pad, dtype=jnp.int32)
    z = jnp.zeros(comp_pad, dtype=jnp.int32)
    z = z.at[jnp.where(real, s_coff, comp_pad)].max(seq_i, mode="drop")
    sq = packing.tiled_cummax(z)

    ll = s_ll[sq]
    src = s_ls[sq]
    off = s_off[sq]
    mlcq = s_mlc[sq]
    hasm = s_match[sq] == 1
    delta = q - s_coff[sq]

    ll_v = ll - 15
    a = jnp.where(ll >= 15, (ll_v // 255) + 1, 0)
    t1 = 1 + a
    t2 = t1 + ll
    ml_v = mlcq - 15

    token = (jnp.minimum(ll, 15) << 4) | jnp.where(hasm, jnp.minimum(mlcq, 15), 0)
    lsic_ll = jnp.minimum(ll_v - 255 * (delta - 1), 255)
    lit_byte = packing.gather_bytes(words, src + (delta - t1)).astype(jnp.int32)
    off_byte = jnp.where(delta == t2, off & 0xFF, off >> 8)
    lsic_ml = jnp.minimum(ml_v - 255 * (delta - t2 - 2), 255)

    val = jnp.where(
        delta == 0,
        token,
        jnp.where(
            delta < t1,
            lsic_ll,
            jnp.where(
                delta < t2,
                lit_byte,
                jnp.where(delta < t2 + 2, off_byte, lsic_ml),
            ),
        ),
    )
    out = jnp.where(q < total_comp, val, 0).astype(jnp.uint8)
    return out, total_comp


def candidates_core(u8):
    """Stage 1 only, packed for the hybrid encoder: the 4 closest previous
    occurrences of every position's 4-byte word, as u16 back-distances.

    Returns (d12, d34) uint32 arrays packing (delta1 | delta2 << 16) and
    (delta3 | delta4 << 16); 0 means no candidate (or out of MAX_DISTANCE
    reach). The host walk (native tlz4_compress_with_candidates) re-verifies
    every candidate with exact byte compares, so nothing here is
    correctness-critical — garbage candidates only cost ratio.
    """
    pad = u8.shape[0]
    pos = jnp.arange(pad, dtype=jnp.int32)
    u = u8.astype(jnp.uint32)
    w4 = u | (_shift_read(u, 1) << 8) | (_shift_read(u, 2) << 16) | (
        _shift_read(u, 3) << 24
    )
    sw, sp = jax.lax.sort((w4, pos.astype(jnp.uint32)), num_keys=2)
    spi = sp.astype(jnp.int32)
    ds = []
    for j in range(1, 5):
        same = jnp.concatenate([jnp.zeros(j, bool), sw[j:] == sw[:-j]])
        prev = jnp.concatenate([jnp.zeros(j, jnp.int32), spi[:-j]])
        delta = spi - prev
        ds.append(
            jnp.where(same & (delta <= 65535), delta, 0).astype(jnp.uint32)
        )
    d12 = jnp.zeros(pad, jnp.uint32).at[spi].set(ds[0] | (ds[1] << 16))
    d34 = jnp.zeros(pad, jnp.uint32).at[spi].set(ds[2] | (ds[3] << 16))
    return d12, d34


_candidates_kernel = jax.jit(candidates_core)
_candidates_batch = jax.jit(jax.vmap(candidates_core))


def best_plane_core(u8, pool: int = 2, stride: int = 1):
    """Stage 1 + on-device selection for the streaming hybrid encoder: the
    best of the 4 closest previous occurrences of each position's word,
    ``pool``:1 max-pooled to one u16 back-distance per position group
    (0 = none).

    TPU-shaped throughout: candidate scoring (a capped exact extension —
    4/8/12 bytes) needs the words at cand+4/cand+8, which would be random
    gathers (slow on XLA:TPU); instead the +4/+8-shifted word planes ride
    through the sort as payloads, so scoring is pure sorted-domain shifts
    and compares. The host walk probes both positions of a pair with the
    pooled delta and re-extends exactly, so pooling and the score cap only
    affect *which* match is chosen, never correctness — and the pooled
    plane halves the device->host transfer that dominates the pipeline.

    Cost structure (measured, experiments/encode_sort_ablate.py): the sort
    itself is cheap (~1.4 ms/chunk); position-domain SCATTERS dominate. So
    (score, closeness) packs into one int32 — packed = score<<16 |
    (65536-delta), whose max is "best score, ties to the closest" — and ONE
    scatter returns to position order: 7.3 -> 3.6 ms/chunk.
    """
    pad = u8.shape[0]
    m = pad // stride
    pos = jnp.arange(pad, dtype=jnp.int32)
    u = u8.astype(jnp.uint32)
    w4 = u | (_shift_read(u, 1) << 8) | (_shift_read(u, 2) << 16) | (
        _shift_read(u, 3) << 24
    )
    w4p4 = _shift_read(w4, 4)
    w4p8 = _shift_read(w4, 8)
    # stride > 1 anchors candidates at every stride-th position only: the
    # sort (the kernel's floor cost) shrinks by that factor. The host walk
    # probes every pooled GROUP and re-extends exactly — and backward
    # extension recovers bytes a coarser anchor skipped — so sparser
    # anchors trade a little ratio for kernel throughput, like the
    # reference's skip acceleration trades ratio for speed
    # (lz4_flex src/block/compress.rs:367-378).
    if stride > 1:
        sub = lambda a: a.reshape(m, stride)[:, 0]
        w4s, poss, p4s, p8s = sub(w4), sub(pos), sub(w4p4), sub(w4p8)
    else:
        w4s, poss, p4s, p8s = w4, pos, w4p4, w4p8
    sw, sp, s4, s8 = jax.lax.sort(
        (w4s, poss.astype(jnp.uint32), p4s, p8s), num_keys=2
    )
    spi = sp.astype(jnp.int32)
    best = jnp.zeros(m, jnp.int32)
    # 16 closest candidates: the sorted-domain select loop is nearly free
    # (measured +5% kernel over 4 candidates for -4.8% compressed size on
    # the 10 MB text corpus; 24 candidates only bought a further -0.4% for
    # +8% kernel).
    for j in range(1, 17):
        same = jnp.concatenate([jnp.zeros(j, bool), sw[j:] == sw[:-j]])
        prev = jnp.concatenate([jnp.zeros(j, jnp.int32), spi[:-j]])
        c4 = jnp.concatenate([jnp.zeros(j, jnp.uint32), s4[:-j]])
        c8 = jnp.concatenate([jnp.zeros(j, jnp.uint32), s8[:-j]])
        delta = spi - prev  # spi holds true positions
        ok = same & (delta <= 65535)
        e1 = (c4 == s4).astype(jnp.int32)
        e2 = ((c8 == s8) & (c4 == s4)).astype(jnp.int32)
        score = 4 + 4 * e1 + 4 * e2
        packed = jnp.where(ok, (score << 16) | (65536 - delta), 0)
        best = jnp.maximum(best, packed)
    # position-domain return: one unique-index scatter (strided domain:
    # spi holds true positions, the plane slot is spi // stride), then pool
    # by reshape-max (stride must divide pool)
    plane = jnp.zeros(m, jnp.int32).at[spi // stride if stride > 1 else spi].set(best)
    w = jnp.max(plane.reshape(pad // pool, pool // stride), axis=1)
    return jnp.where(w > 0, 65536 - (w & 0xFFFF), 0).astype(jnp.uint16)


# 4:1 pooling halves the plane d2h vs 2:1 for ~equal steady state with the
# candidate kernel (measured: 12 MiB plane @ ~14 MiB/s tunnel dominated the
# pipeline; the host walk re-extends exactly, so pooling only costs ratio).
_PLANE_POOL = 4
# stride-2 anchors would run the sort on half the positions, but measured
# only ~4% kernel (the sort is not the bound; w4-plane construction and the
# select loop are) for a 17% ratio loss on the 10 MB text corpus — default
# stays exact (stride=1); the parameter remains for experiments.
_PLANE_STRIDE = 1
_PLANE_ROWS = 8  # chunk rows per dispatch (per-dispatch RPC latency)


@partial(jax.jit, static_argnums=(2, 3))
def _best_plane_quad(gpad, starts, pool=_PLANE_POOL, stride=_PLANE_STRIDE):
    """A group of chunk rows' pooled planes in one launch, rows built
    on-device by slicing the resident stream — the only h2d is the stream
    itself, and each dispatch/d2h RPC carries ``starts.shape[0]`` rows
    (per-call latency on a remote device dominates otherwise). Rows are
    UNROLLED, not vmapped: a vmap'd batched sort was measured 27% slower
    per chunk than sequential single-chunk sorts inside one XLA program."""
    rows = [
        best_plane_core(
            jax.lax.dynamic_slice(gpad, (starts[i],), (_CHUNK_W,)), pool,
            stride,
        )
        for i in range(starts.shape[0])
    ]
    return jnp.stack(rows)


def encode_chunk_core(u8, words, d, n, *, levels, comp_pad, nseq_pad):
    """Single-chunk encode (match + final literal record + emission) as one
    traceable function, chunk-local coordinates — the per-frame-block kernel
    for the sharded pipelines (vmap/shard_map composable)."""
    ll, ls, off, ml, nm, last_end = match_core(
        u8, d, n, levels=levels, nseq_pad=nseq_pad
    )
    seq_i = jnp.arange(nseq_pad, dtype=jnp.int32)
    ll = ll.at[nm].set(n - last_end)
    ls = ls.at[nm].set(last_end)
    mlc = jnp.clip(ml - 4, 0, None)
    s_match = (seq_i < nm).astype(jnp.int32)
    return emit_core(words, ll, ls, off, mlc, s_match, nm + 1, comp_pad=comp_pad)


_match_kernel = partial(jax.jit, static_argnames=("levels", "nseq_pad"))(match_core)
_emit_kernel = partial(jax.jit, static_argnames=("comp_pad",))(emit_core)

_ROW_BUCKETS = [1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256]


def _row_bucket(b: int) -> int:
    for rb in _ROW_BUCKETS:
        if rb >= b:
            return rb
    return -(-b // 256) * 256


@partial(jax.jit, static_argnames=("levels", "nseq_pad"))
def _match_quad(gpad, starts4, d4, t4, *, levels, nseq_pad):
    """Four chunk rows per dispatch, sliced on-device from the RESIDENT
    stream (each row's dictionary is simply the preceding 64 KiB of the
    stream — no host row assembly, no per-row h2d). Rows are UNROLLED, not
    vmapped: a vmap-batched sort measured 27% slower than four sequential
    sorts in one XLA program (see _best_plane_quad)."""
    outs = [
        match_core(
            jax.lax.dynamic_slice(gpad, (starts4[i],), (_CHUNK_W,)),
            d4[i], t4[i], levels=levels, nseq_pad=nseq_pad,
        )
        for i in range(4)
    ]
    return tuple(jnp.stack([o[k] for o in outs]) for k in range(6))


@partial(jax.jit, static_argnames=("comp_pad",))
def _merge_emit(words, ll, ls, off, ml, nm_dev, g_dev, carry_vec,
                final_carry, n_data, *, comp_pad):
    """Device-side table merge + emission for the resident multi-chunk
    encoder: the per-chunk compacted tables stay STACKED (brows, nseq_pad)
    with their pad gaps — live slots are masked, flat order == stream order
    — so merging is elementwise (global rebase + slot-0 carry fixups +
    one appended final-literal sequence) with no compaction scatter, and
    the only host<->device traffic in the whole encode is the per-chunk
    (nm, last_end) scalars down and the wire bytes out."""
    brows, nseq_pad = ll.shape
    slot = jax.lax.broadcasted_iota(jnp.int32, (brows, nseq_pad), 1)
    real = (slot < nm_dev[:, None]).reshape(-1)
    ls_g = (ls + g_dev[:, None]).reshape(-1)
    ll_f = ll.reshape(-1)
    # Slot-0 carry fixups: each chunk's first sequence absorbs the carried
    # literal run (rows whose nm == 0 are fixed too — their slot 0 is not
    # live, so the write is harmless).
    fix = jnp.arange(brows, dtype=jnp.int32) * nseq_pad
    m0 = ls_g[fix] + ll_f[fix]
    ll_f = ll_f.at[fix].set(m0 - carry_vec)
    ls_g = ls_g.at[fix].set(carry_vec)
    # Final literal-only sequence rides an appended pad block (slot 0 live).
    tail_i = jnp.arange(256, dtype=jnp.int32)
    ll_f = jnp.concatenate([ll_f, jnp.where(tail_i == 0, n_data - final_carry, 0)])
    ls_g = jnp.concatenate([ls_g, jnp.where(tail_i == 0, final_carry, 0)])
    off_f = jnp.concatenate([off.reshape(-1), jnp.full(256, 1, jnp.int32)])
    mlc_f = jnp.concatenate(
        [jnp.clip(ml.reshape(-1) - 4, 0, None), jnp.zeros(256, jnp.int32)]
    )
    match_f = jnp.concatenate(
        [real.astype(jnp.int32), jnp.zeros(256, jnp.int32)]
    )
    real_f = jnp.concatenate([real, tail_i == 0])
    return emit_core(
        words, ll_f, ls_g, off_f, mlc_f, match_f, jnp.int32(0),
        comp_pad=comp_pad, real=real_f,
    )


@dataclass
class _Merged:
    ll: np.ndarray
    ls: np.ndarray
    off: np.ndarray
    mlc: np.ndarray
    match: np.ndarray
    nseq: int


def _merge_tables(chunks, data_len: int) -> _Merged:
    """Stitch per-chunk match tables (chunk coords) into one global table.

    chunks: list of (lit_len, lit_start, off, mlen, nmatch, last_end, d, base)
    where base is the chunk data's global start and d its dictionary length.
    Literal runs merge across chunk boundaries: each chunk's trailing
    literals become the head of the next chunk's first sequence.
    """
    ll_out, ls_out, off_out, mlc_out = [], [], [], []
    carry_start = 0  # global position where the pending literal run begins
    for ll, ls, off, ml, nm, last_end, d, base in chunks:
        nm = int(nm)
        if nm == 0:
            continue  # whole chunk rides the literal carry
        g = base - int(d)  # chunk coord -> global data coord
        ll = ll[:nm].astype(np.int64)
        ls = ls[:nm].astype(np.int64) + g
        # First sequence absorbs the carried literal run.
        m0 = ls[0] + ll[0]
        ls[0] = carry_start
        ll[0] = m0 - carry_start
        ll_out.append(ll)
        ls_out.append(ls)
        off_out.append(off[:nm])
        mlc_out.append(ml[:nm] - 4)
        carry_start = int(last_end) + g
    # Final literal-only sequence.
    ll_out.append(np.array([data_len - carry_start], np.int64))
    ls_out.append(np.array([carry_start], np.int64))
    off_out.append(np.array([0], np.int32))
    mlc_out.append(np.array([0], np.int32))
    ll = np.concatenate(ll_out).astype(np.int32)
    ls = np.concatenate(ls_out).astype(np.int32)
    off = np.concatenate(off_out).astype(np.int32)
    mlc = np.concatenate(mlc_out).astype(np.int32)
    match = np.ones(ll.shape[0], np.int32)
    match[-1] = 0
    return _Merged(ll, ls, off, mlc, match, ll.shape[0])


def _as_u8(data) -> np.ndarray:
    if isinstance(data, np.ndarray):
        return np.ascontiguousarray(data, dtype=np.uint8)
    if len(data) == 0:
        return np.empty(0, np.uint8)
    return np.frombuffer(data, dtype=np.uint8)


def _levels_for(pad: int) -> int:
    return min(14 if pad <= (1 << 20) else 12, max(2, (pad - 1).bit_length()))


def _hybrid_lib():
    import ctypes

    from .. import native as _native

    lib = _native._lib()
    if not hasattr(lib.tlz4_compress_with_candidates, "_tlz4_configured"):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.tlz4_compress_with_candidates.restype = ctypes.c_int64
        lib.tlz4_compress_with_candidates.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64,
            u32p, u32p,
            i64p, i32p, ctypes.c_int32, ctypes.c_int64,
            u8p, ctypes.c_int64,
        ]
        lib.tlz4_compress_with_candidates._tlz4_configured = True
        lib.tlz4_hybrid_walk_row.restype = ctypes.c_int64
        lib.tlz4_hybrid_walk_row.argtypes = [
            u8p, ctypes.c_int64,
            u16p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, i64p, u8p, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.tlz4_hybrid_walk_chunk.restype = ctypes.c_int64
        lib.tlz4_hybrid_walk_chunk.argtypes = [
            u8p, ctypes.c_int64,
            u16p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32,
            u8p, ctypes.c_int64, ctypes.c_int32, i64p,
        ]
        lib.tlz4_hybrid_stitch.restype = ctypes.c_int64
        lib.tlz4_hybrid_stitch.argtypes = [
            u8p, ctypes.c_int64,
            u8p, i64p, i64p, i64p, i64p, ctypes.c_int32,
            u8p, ctypes.c_int64,
        ]
    return lib


def compress_block_hybrid(data, ext_dict=b"") -> bytes:
    """Compress one raw LZ4 block: device candidate search + host walk.

    The production encode shape (the encode mirror of the ring decoder's
    host-plan/device-kernel split): the TPU finds the 4 closest previous
    occurrences of every position's word — exact, via sort, the part that is
    data-parallel-heavy — and the native host walk turns them into wire
    bytes with exact extension (tlz4_compress_with_candidates). Because the
    host re-verifies every candidate byte-exactly, the output is spec-valid
    by construction — no fingerprint-collision verify pass is needed (the
    reference's always-valid-output guarantee,
    /root/reference/src/block/compress.rs:318-489).

    The walk is global over the chunk grid, so matches cross chunk
    boundaries (slightly better ratio than the all-device kernel's
    per-chunk truncation).
    """
    import ctypes

    src = _as_u8(data)
    dic = _as_u8(ext_dict)[-WINDOW_SIZE:]
    dlen = int(dic.shape[0])
    n_data = int(src.shape[0])
    if n_data == 0:
        return bytes([0x00])
    G = np.concatenate([dic, src]) if dlen else src
    g_len = G.shape[0]

    if g_len + 4 > _CHUNK_W:
        return _compress_hybrid_streaming(G, g_len, dlen, n_data)

    pad = packing.size_bucket(max(g_len + 4, 8))
    d12, d34 = _candidates_kernel(jnp.asarray(packing.pad_to(G, pad)))
    d12 = np.asarray(d12)[None]
    d34 = np.asarray(d34)[None]
    gstart = np.zeros(1, np.int64)
    dvec = np.array([dlen], np.int32)
    nrows = 1

    cap = get_maximum_output_size(n_data)
    out = np.empty(cap, np.uint8)
    lib = _hybrid_lib()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.tlz4_compress_with_candidates(
        G.ctypes.data_as(u8p), g_len, dlen,
        d12.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        d34.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        gstart.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dvec.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nrows, pad,
        out.ctypes.data_as(u8p), cap,
    )
    if rc < 0:
        from ..block.errors import CompressOutputTooSmall

        raise CompressOutputTooSmall(cap)
    return out[: int(rc)].tobytes()


def _compress_hybrid_streaming(G, g_len, dlen, n_data) -> bytes:
    """Multi-chunk hybrid encode, pipelined AND chunk-parallel: the stream
    uploads once, each chunk row's u16 best-delta plane is computed
    on-device and pulled back quad by quad, and the chunk walks run
    CONCURRENTLY on a host thread pool (each ~508 KiB chunk's dictionary is
    simply the preceding 64 KiB of the stream, so chunks share nothing —
    tlz4_hybrid_walk_chunk); tlz4_hybrid_stitch merges the per-chunk wires
    (pending literal tails fold into the next chunk's first sequence
    header). Steady state off-tunnel is max(plane kernel, walk/ncores); on
    this dev setup the d2h plane transfer dominates instead."""
    import ctypes
    from concurrent.futures import ThreadPoolExecutor

    bucket = packing.size_bucket(g_len + 8)
    gpad = jnp.asarray(packing.pad_to(G, bucket))
    nrows = -(-n_data // _CHUNK_C)
    starts, limits = [], []
    for i in range(nrows):
        base = i * _CHUNK_C
        s = 0 if i == 0 else dlen + base - WINDOW_SIZE
        starts.append(min(s, bucket - _CHUNK_W))
        limits.append(dlen + min(base + _CHUNK_C, n_data))
    R = _PLANE_ROWS
    nquads = -(-nrows // R)
    qstarts = np.array(
        starts + [starts[-1]] * (R * nquads - nrows), np.int32
    ).reshape(nquads, R)
    quads = [
        _best_plane_quad(gpad, jnp.asarray(q), _PLANE_POOL, _PLANE_STRIDE)
        for q in qstarts
    ]

    lib = _hybrid_lib()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i64p = ctypes.POINTER(ctypes.c_int64)

    # one flat wire buffer, a fixed-capacity region per chunk: walks write
    # their region directly, the stitch consumes (buffer, offsets) with no
    # concatenation pass
    ccap = 16 + 4 + (_CHUNK_C * 110) // 100 + 16
    wirebuf = np.empty(nrows * ccap, np.uint8)
    wire_off = (np.arange(nrows, dtype=np.int64) * ccap)
    wire_len = np.zeros(nrows, np.int64)
    tails = np.zeros(nrows, np.int64)
    chunk_start = dlen + np.arange(nrows, dtype=np.int64) * _CHUNK_C
    plane_len = _CHUNK_W // _PLANE_POOL
    pool_shift = _PLANE_POOL.bit_length() - 1
    planes = [None] * nrows  # keep fetched planes alive until their walk

    def walk_one(i):
        tail = np.zeros(1, np.int64)
        rc = lib.tlz4_hybrid_walk_chunk(
            G.ctypes.data_as(u8p), g_len,
            planes[i].ctypes.data_as(u16p),
            starts[i], int(chunk_start[i]), limits[i],
            plane_len, pool_shift,
            wirebuf[wire_off[i] :].ctypes.data_as(u8p), ccap,
            1 if i == nrows - 1 else 0,
            tail.ctypes.data_as(i64p),
        )
        if rc < 0:
            return rc
        wire_len[i] = rc
        tails[i] = tail[0]
        return rc

    from ..parallel.pipeline import _plan_executor

    wx = _plan_executor()
    walk_futs = []
    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(np.asarray, quads[0])
        for q in range(nquads):
            quad = fut.result()
            if q + 1 < nquads:
                fut = ex.submit(np.asarray, quads[q + 1])
            for i in range(R * q, min(R * q + R, nrows)):
                planes[i] = np.ascontiguousarray(quad[i - R * q])
                walk_futs.append(wx.submit(walk_one, i))
        rcs = [f.result() for f in walk_futs]
    cap = get_maximum_output_size(n_data)
    if any(rc < 0 for rc in rcs):
        from ..block.errors import CompressOutputTooSmall

        raise CompressOutputTooSmall(cap)
    out = np.empty(cap, np.uint8)
    rc = lib.tlz4_hybrid_stitch(
        G.ctypes.data_as(u8p), g_len,
        wirebuf.ctypes.data_as(u8p),
        wire_off.ctypes.data_as(i64p), wire_len.ctypes.data_as(i64p),
        chunk_start.ctypes.data_as(i64p), tails.ctypes.data_as(i64p),
        nrows,
        out.ctypes.data_as(u8p), cap,
    )
    if rc < 0:
        from ..block.errors import CompressOutputTooSmall

        raise CompressOutputTooSmall(cap)
    return out[: int(rc)].tobytes()


def compress_block_device(
    data,
    ext_dict=b"",
    *,
    verify: bool = True,
    as_array: bool = False,
):
    """Compress one raw LZ4 block on the device (no size header).

    ``verify`` roundtrips the result through the independent host decoder and
    falls back to the host encoder on any mismatch (the guard against
    fingerprint collisions in the LCP stage). Returns bytes, or
    (device uint8 array, length) when ``as_array`` is true.
    """
    src = _as_u8(data)
    dic = _as_u8(ext_dict)[-WINDOW_SIZE:]
    dlen = int(dic.shape[0])
    n_data = int(src.shape[0])

    if n_data + dlen + 4 > _CHUNK_W:
        out, total_comp = _compress_device_resident(src, dic)
        return _finish_device_block(
            out, total_comp, src, dic, verify=verify, as_array=as_array
        )

    # Single chunk at a per-size bucket.
    buf = np.concatenate([dic, src]) if dlen else src
    pad = packing.size_bucket(max(buf.shape[0] + 4, 8))
    nseq_pad = packing.size_bucket(max(8, pad // 4 + 2), minimum=256)
    res = _match_kernel(
        jnp.asarray(packing.pad_to(buf, pad)),
        jnp.int32(dlen),
        jnp.int32(buf.shape[0]),
        levels=_levels_for(pad),
        nseq_pad=nseq_pad,
    )
    ll, ls, off, ml, nm, last_end = (np.asarray(x) for x in res)
    chunks = [(ll, ls, off, ml, nm, last_end, dlen, 0)]
    merged = _merge_tables(chunks, n_data)
    comp_pad = packing.size_bucket(get_maximum_output_size(n_data))
    nseq_pad_g = packing.size_bucket(max(8, merged.nseq), minimum=256)
    src_pad = packing.size_bucket(max(n_data, 4))
    out, total_comp = _emit_kernel(
        jnp.asarray(packing.pad_to(src, src_pad).view("<u4")),
        jnp.asarray(packing.pad_to(merged.ll, nseq_pad_g)),
        jnp.asarray(packing.pad_to(merged.ls, nseq_pad_g)),
        jnp.asarray(packing.pad_to(merged.off, nseq_pad_g, fill=1)),
        jnp.asarray(packing.pad_to(merged.mlc, nseq_pad_g)),
        jnp.asarray(packing.pad_to(merged.match, nseq_pad_g)),
        jnp.int32(merged.nseq),
        comp_pad=comp_pad,
    )
    return _finish_device_block(
        out, total_comp, src, dic, verify=verify, as_array=as_array
    )


def _compress_device_resident(src: np.ndarray, dic: np.ndarray):
    """Resident multi-chunk device encode: h2d the stream once, slice chunk
    rows on-device, match per quad dispatch, merge + emit on device
    (_merge_emit). The only d2h before the wire bytes is one (nm, last_end)
    int32 pair per 508 KiB chunk — this is what replaced the per-chunk
    table fetches that capped the previous all-device encoder at ~1 MiB/s
    on the dev tunnel."""
    dlen = int(dic.shape[0])
    n_data = int(src.shape[0])
    nrows = -(-n_data // _CHUNK_C)
    brows = _row_bucket(nrows)
    nq = -(-brows // 4)

    G = np.concatenate([dic, src]) if dlen else src
    glen = G.shape[0]
    gpad_n = packing.size_bucket(glen + _CHUNK_W)
    gpad = jnp.asarray(packing.pad_to(G, gpad_n))
    words = jnp.asarray(packing.pad_to(src, packing.size_bucket(max(n_data, 4))).view("<u4"))

    starts = np.zeros(4 * nq, np.int32)
    d4 = np.zeros(4 * nq, np.int32)
    t4 = np.zeros(4 * nq, np.int32)
    g4 = np.zeros(4 * nq, np.int32)
    for i in range(nrows):
        base = dlen + i * _CHUNK_C              # chunk data start in G
        d_i = min(WINDOW_SIZE, base)
        clen = min(_CHUNK_C, n_data - i * _CHUNK_C)
        starts[i] = base - d_i
        d4[i] = d_i
        t4[i] = d_i + clen
        g4[i] = base - dlen - d_i               # chunk coord -> data coord
    nseq_pad = packing.size_bucket(_CHUNK_W // 4 + 2, minimum=256)
    levels = _levels_for(_CHUNK_W)

    quads = []
    for q in range(nq):
        sl = slice(4 * q, 4 * q + 4)
        quads.append(
            _match_quad(
                gpad, jnp.asarray(starts[sl]), jnp.asarray(d4[sl]),
                jnp.asarray(t4[sl]), levels=levels, nseq_pad=nseq_pad,
            )
        )
    ll, ls, off, ml, nm, last_end = (
        jnp.concatenate([qd[k] for qd in quads]) for k in range(6)
    )
    # host scalar fetch: per-chunk match count + trailing-literal start
    nm_h = np.asarray(nm)
    le_h = np.asarray(last_end)
    carry_vec = np.zeros(4 * nq, np.int32)
    carry = 0
    for i in range(4 * nq):
        carry_vec[i] = carry
        if i < nrows and nm_h[i] > 0:
            carry = int(le_h[i]) + int(g4[i])
    comp_pad = packing.size_bucket(get_maximum_output_size(n_data))
    return _merge_emit(
        words, ll, ls, off, ml,
        jnp.asarray(nm_h) * jnp.asarray((np.arange(4 * nq) < nrows).astype(np.int32)),
        jnp.asarray(g4), jnp.asarray(carry_vec),
        jnp.int32(carry), jnp.int32(n_data), comp_pad=comp_pad,
    )


def _finish_device_block(out, total_comp, src, dic, *, verify, as_array):
    n_data = int(src.shape[0])
    dlen = int(dic.shape[0])
    total = int(total_comp)
    if as_array and not verify:
        return out, total
    comp = np.asarray(out[:total]).tobytes()
    if verify:
        # Zero-write native verify walk (decode(comp)==src checked without
        # materializing the decode — native/lz4_native.cpp:tlz4_verify_block):
        # the fingerprint-collision guard at ~1/10 the old
        # decode-then-compare cost. Any mismatch falls back to the host
        # encoder, whose output is valid by construction.
        from .. import native as _native
        from ..block import compress_with_dict as _host_c

        try:
            ok = _native.verify_block(comp, src, dic if dlen else b"")
        except Exception:
            ok = False
        if not ok:  # pragma: no cover - fingerprint collision path
            return _host_c(src, dic) if dlen else _host_c(src, b"")
    if as_array:
        return out, total
    return comp
