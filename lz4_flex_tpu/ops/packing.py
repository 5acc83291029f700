"""Byte/word packing primitives for the device codec.

TPU vector units operate on 32-bit lanes; all bulk byte work is therefore done
on little-endian u32 words with funnel shifts, and byte-granular access is a
word gather plus a shift. These helpers are shape-polymorphic jnp functions
used by the decode/encode/parse kernels.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Shape buckets: pad array lengths to the next bucket so jit caches stay small.
_BUCKET_MIN = 4096


def size_bucket(n: int, minimum: int = _BUCKET_MIN) -> int:
    """Round ``n`` up to the next power-of-two (or 1.5×power-of-two) bucket."""
    b = minimum
    while b < n:
        if (b + b // 2) >= n:
            return b + b // 2
        b *= 2
    return b


def pad_to(arr: np.ndarray, size: int, fill: int = 0) -> np.ndarray:
    """Pad a 1-D numpy array up to ``size`` with ``fill``."""
    if arr.shape[0] == size:
        return arr
    out = np.full(size, fill, dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out


def bytes_to_words(u8: jnp.ndarray) -> jnp.ndarray:
    """Pack a uint8 array (length divisible by 4) into little-endian int32
    words, returned as uint32."""
    b = u8.reshape(-1, 4).astype(jnp.uint32)
    return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)


def words_to_bytes(w: jnp.ndarray) -> jnp.ndarray:
    """Unpack uint32 little-endian words back into a uint8 array."""
    w = w.astype(jnp.uint32)
    b = jnp.stack(
        [w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF, (w >> 24) & 0xFF], axis=-1
    )
    return b.reshape(-1).astype(jnp.uint8)


def gather_bytes(words: jnp.ndarray, byte_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather bytes at ``byte_idx`` from a packed little-endian word buffer.

    Equivalent to u8[byte_idx] but as a u32 word gather + funnel shift, which
    keeps the access 32-bit-lane friendly. Indices are clamped to the buffer.
    """
    idx = jnp.clip(byte_idx, 0, words.shape[0] * 4 - 1)
    w = words[idx >> 2]
    return ((w >> ((idx & 3).astype(jnp.uint32) * 8)) & 0xFF).astype(jnp.uint32)


def gather_words_unaligned(words: jnp.ndarray, byte_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather 4-byte little-endian values starting at arbitrary byte offsets:
    two aligned word gathers + a funnel shift."""
    idx = jnp.clip(byte_idx, 0, words.shape[0] * 4 - 4)
    lo = words[idx >> 2]
    hi = words[jnp.clip((idx >> 2) + 1, 0, words.shape[0] - 1)]
    sh = (idx & 3).astype(jnp.uint32) * 8
    # sh == 0 must not shift hi by 32 (UB); mask it out instead.
    funneled = (lo >> sh) | jnp.where(sh == 0, 0, hi << (32 - sh))
    return funneled.astype(jnp.uint32)


_TILE_W = 512

_SCAN_OPS = {
    "sum": (jnp.cumsum, jnp.add, 0),
    "max": (jax.lax.cummax, jnp.maximum, None),  # identity filled per-dtype
    "min": (jax.lax.cummin, jnp.minimum, None),
}


def tiled_scan(kind: str, x: jnp.ndarray, *, reverse: bool = False) -> jnp.ndarray:
    """Inclusive cumulative scan that compiles in near-constant time.

    XLA:TPU compiles cumulative ops over large 1-D arrays in O(n^2) time
    (minutes at a few MB, hours at 10 MB) — for both lax.associative_scan
    and the native cumsum/cummax lowerings. Reshaped to (rows, 512), the
    native cumulative ops along the short static axis compile in ~2 s
    regardless of n; a carry scan over row totals stitches rows together.
    """
    op, fn, identity = _SCAN_OPS[kind]
    if identity is None:
        identity = (
            jnp.iinfo(x.dtype).min if kind == "max" else jnp.iinfo(x.dtype).max
        )
    n = x.shape[0]
    if reverse:
        return jnp.flip(tiled_scan(kind, jnp.flip(x)))
    if n <= 4 * _TILE_W or n % _TILE_W:
        return op(x)
    rows = x.reshape(-1, _TILE_W)
    inner = op(rows, axis=1)
    totals = inner[:, -1]
    if totals.shape[0] > 4 * _TILE_W and totals.shape[0] % _TILE_W == 0:
        carry_inc = tiled_scan(kind, totals)
    else:
        carry_inc = op(totals)
    carry = jnp.concatenate([jnp.full(1, identity, x.dtype), carry_inc[:-1]])
    return fn(inner, carry[:, None]).reshape(-1)


def tiled_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    return tiled_scan("sum", x)


def tiled_cummax(x: jnp.ndarray) -> jnp.ndarray:
    return tiled_scan("max", x)


def lsic_tables(u8: jnp.ndarray):
    """Vectorized LSIC (Linear Small-Integer Code) run decode.

    For every byte position q of ``u8`` (treated as the first byte of an LSIC
    extension run — lz4_flex reads these one byte at a time in read_integer,
    src/block/decompress.rs:126-157), returns:

      value[q]  — the decoded extension value (sum of the 0xFF run plus the
                  terminating byte)
      nbytes[q] — how many bytes the run occupies (run length + 1)

    Computed in O(n) with a reversed cumulative-minimum: nz_next[q] is the
    first position >= q whose byte != 0xFF.
    """
    n = u8.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    non_ff = u8 != 0xFF
    # Reverse cummin of (pos where non-ff else n-1): first non-0xFF at/after q.
    cand = jnp.where(non_ff, pos, n - 1)
    nz_next = tiled_scan("min", cand, reverse=True)
    run = nz_next - pos
    value = run * 255 + u8[nz_next].astype(jnp.int32)
    nbytes = run + 1
    return value, nbytes
