"""Device block encode: data-parallel greedy LZ4 compression.

The reference encoder walks a cursor with a 4096-entry hash table (lz4_flex
src/block/compress.rs:318-489). The TPU formulation computes everything for
all positions at once and recovers the greedy walk algebraically:

  1. candidates — the closest previous occurrence of every 4-byte word,
     found by a lexicographic (word, position) sort: adjacent entries with
     equal words are (candidate, position) pairs. This is *exact* closest-
     match search — strictly stronger than the reference's collision-prone
     4096-entry table — so the ratio margin pays for the parallel-greedy
     simplifications below.
  2. match lengths — longest common prefix of (p, candidate) via binary
     lifting over power-of-two substring fingerprints; exact for levels
     0..2 (byte/u16/u32 loads), fingerprinted above that. Fingerprint
     collisions (~2^-32) can only overestimate a length; the optional
     roundtrip verify catches that and falls back to the host encoder.
     Matches longer than the lifting cap split into back-to-back sequences
     with the same offset (wire-legal, ~0.04% overhead).
  3. greedy chain — cursor jumps (match ? p+len : p+1) form a functional
     graph; the emitted sequence set is the orbit of the start position,
     recovered by pointer-doubling reachability exactly as in the decoder's
     parse (ops/parse.py).
  4. backward extension — matches extend left over their literal run while
     bytes agree (capped), mirroring backtrack_match
     (src/block/compress.rs:252-287).
  5. emission — per-sequence wire lengths (token/LSIC/literals/offset) are
     prefix-summed into byte offsets; every output byte then computes its
     role and value independently (scatter + cummax attribution, funnel
     gathers for literals).

External dictionaries ride the same machinery: the dictionary is prepended
in "concat space", candidates may land in it, and offsets fall out naturally
(the decoder's negative-source convention, ops/decode.py).

Spec conformance (lz4_Block_format.md via src/block/mod.rs:35-70): matches
start >= 13 bytes before the end, end at least 5 bytes before it, offsets
are 1..65535, inputs shorter than LZ4_MIN_LENGTH stay literal-only.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..spec.constants import get_maximum_output_size
from . import packing

_GOLDEN32 = np.uint32(0x9E3779B1)
_MIX32 = np.uint32(0x85EBCA6B)


def _mix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Combine two span fingerprints into the covering span's fingerprint."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    h = (a ^ ((b << 13) | (b >> 19))) * _MIX32
    return h ^ (h >> 15)


def _shift_read(arr: jnp.ndarray, k: int) -> jnp.ndarray:
    """arr shifted left by k (arr[i+k]), zero-padded — contiguous, no gather."""
    if k == 0:
        return arr
    return jnp.concatenate([arr[k:], jnp.zeros(k, arr.dtype)])


def encode_core(
    u8: jnp.ndarray,  # (PAD,) uint8 — ext_dict ++ input, zero padded
    words: jnp.ndarray,  # (PAD/4,) uint32 — same, packed
    d: jnp.ndarray,  # () int32 — dict length (input starts here)
    n: jnp.ndarray,  # () int32 — dict + input length
    *,
    levels: int,
    comp_pad: int,
    nseq_pad: int,
):
    """The encode stages as a plain traceable function (vmap/shard_map
    composable). Returns (comp_bytes[comp_pad], total_comp, nseq)."""
    pad = u8.shape[0]
    pos = jnp.arange(pad, dtype=jnp.int32)
    u = u8.astype(jnp.uint32)

    # Unaligned 4-byte words at every position (shifted adds, no gathers).
    w4 = u | (_shift_read(u, 1) << 8) | (_shift_read(u, 2) << 16) | (
        _shift_read(u, 3) << 24
    )

    # --- 1. k closest previous occurrences by (word, position) sort --------
    # The j-th predecessor in the sorted order with an equal word is the
    # j-th-closest previous occurrence; keeping several lets the selector
    # prefer a farther-but-longer match (the reference's sparse table often
    # lands on older occurrences and wins long matches that way).
    n_cands = 4
    sw, sp = jax.lax.sort((w4, pos.astype(jnp.uint32)), num_keys=2)
    spi = sp.astype(jnp.int32)
    cands = []
    for j in range(1, n_cands + 1):
        same = jnp.concatenate(
            [jnp.zeros(j, bool), sw[j:] == sw[:-j]]
        )
        prev = jnp.concatenate([jnp.zeros(j, jnp.int32), spi[:-j]])
        cands.append(
            jnp.full(pad, -1, jnp.int32).at[spi].set(jnp.where(same, prev, -1))
        )

    # --- 2. match lengths by binary lifting --------------------------------
    # H[k][p] fingerprints u8[p : p + 2^k]; levels 0..2 are exact loads.
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
    defer = jnp.concatenate([has_match[1:] & (mlen[1:] > mlen[:-1]), jnp.zeros(1, bool)])
    has_match = has_match & ~defer
    mlen = jnp.where(has_match, mlen, 0)
    c = jnp.maximum(cand, 0)

    # --- 3. greedy chain by pointer-doubling reachability ------------------
    sent = pad
    jump = jnp.where(has_match, pos + mlen, pos + 1)
    J = jnp.where(pos < n, jnp.clip(jump, 0, sent), sent)
    J = jnp.concatenate([J, jnp.array([sent], jnp.int32)])
    M = jnp.zeros(pad + 1, dtype=jnp.int32).at[d].set(1)
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
    E = jax.lax.associative_scan(jnp.maximum, ends)
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
    mstart = pos - b  # match start after extension
    mlen_x = mlen + b

    # --- 5a. per-sequence wire layout --------------------------------------
    # Sequences = matches on the chain, plus one final literal-only record.
    lit_len = mstart - prev_end
    mlc = jnp.clip(mlen_x - 4, 0, None)

    def lsic_n(v):
        return jnp.where(v >= 15, (v - 15) // 255 + 1, 0)

    comp_len = 1 + lsic_n(lit_len) + lit_len + jnp.where(is_match, 2 + lsic_n(mlc), 0)

    rank = jnp.cumsum(is_match.astype(jnp.int32)) - 1
    nmatch = rank[pad - 1] + 1
    tgt = jnp.where(is_match, rank, nseq_pad)

    def compact(field, fill=0):
        return (
            jnp.full(nseq_pad, fill, dtype=jnp.int32).at[tgt].set(field, mode="drop")
        )

    s_lit_len = compact(lit_len)
    s_lit_src = compact(prev_end)
    s_off = compact(pos - c, fill=1)
    s_mlc = compact(mlc)
    s_clen = compact(comp_len)
    s_match = (
        jnp.zeros(nseq_pad, jnp.int32).at[tgt].set(1, mode="drop")
    )

    # Final literal-only sequence.
    last_end = jnp.maximum(d, E[pad - 1])
    fin_ll = n - last_end
    fin_len = 1 + lsic_n(fin_ll) + fin_ll
    s_lit_len = s_lit_len.at[nmatch].set(fin_ll)
    s_lit_src = s_lit_src.at[nmatch].set(last_end)
    s_off = s_off.at[nmatch].set(1)
    s_mlc = s_mlc.at[nmatch].set(0)
    s_clen = s_clen.at[nmatch].set(fin_len)
    s_match = s_match.at[nmatch].set(0)
    nseq = nmatch + 1

    seq_i = jnp.arange(nseq_pad, dtype=jnp.int32)
    real = seq_i < nseq
    s_clen = jnp.where(real, s_clen, 0)
    ccum = jnp.cumsum(s_clen)
    s_coff = ccum - s_clen
    total_comp = ccum[nseq_pad - 1]

    # --- 5b. byte-level emission -------------------------------------------
    q = jnp.arange(comp_pad, dtype=jnp.int32)
    z = jnp.zeros(comp_pad, dtype=jnp.int32)
    z = z.at[jnp.where(real, s_coff, comp_pad)].max(seq_i, mode="drop")
    sq = jax.lax.associative_scan(jnp.maximum, z)

    ll = s_lit_len[sq]
    src = s_lit_src[sq]
    off = s_off[sq]
    mlcq = s_mlc[sq]
    hasm = s_match[sq] == 1
    delta = q - s_coff[sq]

    ll_v = ll - 15
    a = jnp.where(ll >= 15, (ll_v // 255) + 1, 0)
    t1 = 1 + a
    t2 = t1 + ll
    ml_v = mlcq - 15

    token = (
        (jnp.minimum(ll, 15) << 4) | jnp.where(hasm, jnp.minimum(mlcq, 15), 0)
    )
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
    return out, total_comp, nseq


_encode_kernel = partial(jax.jit, static_argnames=("levels", "comp_pad", "nseq_pad"))(
    encode_core
)


def _as_u8(data) -> np.ndarray:
    if isinstance(data, np.ndarray):
        return np.ascontiguousarray(data, dtype=np.uint8)
    if len(data) == 0:
        return np.empty(0, np.uint8)
    return np.frombuffer(data, dtype=np.uint8)


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
    fingerprint collisions in the LCP stage). Returns bytes, or the device
    uint8 array plus length when ``as_array`` is true.
    """
    src = _as_u8(data)
    dic = _as_u8(ext_dict)
    dlen = int(dic.shape[0])
    buf = np.concatenate([dic, src]) if dlen else src
    n = int(buf.shape[0])
    pad = packing.size_bucket(max(n + 4, 8))
    # Max match = 4 + 2^(levels+1) - 1; longer matches split into extra
    # sequences (~3 B each). Small inputs afford more fingerprint levels.
    levels = min(14 if pad <= (1 << 20) else 12, max(2, (pad - 1).bit_length()))
    comp_pad = packing.size_bucket(get_maximum_output_size(src.shape[0]))
    nseq_pad = packing.size_bucket(max(8, pad // 4 + 2), minimum=256)

    u8 = jnp.asarray(packing.pad_to(buf, pad))
    words = jnp.asarray(packing.pad_to(buf, pad).view("<u4"))
    out, total_comp, _ = _encode_kernel(
        u8,
        words,
        jnp.int32(dlen),
        jnp.int32(n),
        levels=levels,
        comp_pad=comp_pad,
        nseq_pad=nseq_pad,
    )
    total = int(total_comp)
    if as_array and not verify:
        return out, total
    comp = np.asarray(out[:total]).tobytes()
    if verify:
        from ..block import decompress, decompress_with_dict

        try:
            back = (
                decompress_with_dict(comp, src.shape[0], dic)
                if dlen
                else decompress(comp, src.shape[0])
            )
            ok = back == src.tobytes()
        except Exception:
            ok = False
        if not ok:  # pragma: no cover - fingerprint collision path
            from ..block import compress_with_dict as _host_c

            return _host_c(src, dic) if dlen else _host_c(src, b"")
    if as_array:
        return out, total
    return comp
