"""LZ4 block format — public API.

Capability parity with the reference's block API surface
(lz4_flex src/block/compress.rs:599-766, src/block/decompress_safe.rs:323-390,
src/block/mod.rs:151-157): one-shot and into-buffer compress/decompress, the
size-prepended convenience pair, external dictionaries, and a reusable
compression table.

The host implementation is the native C++ runtime (lz4_flex_tpu.native); the
pure-Python golden model is the fallback when no C++ toolchain is available.
The TPU device path lives in lz4_flex_tpu.ops / lz4_flex_tpu.models.
"""

from __future__ import annotations

import struct

import numpy as np

from ..spec.constants import get_maximum_output_size
from . import errors
from .errors import (
    CompressError,
    CompressOutputTooSmall,
    DecompressError,
    ExpectedAnotherByte,
    LiteralOutOfBounds,
    OffsetOutOfBounds,
    OffsetZero,
    OutputTooSmall,
)

try:  # native host runtime (preferred)
    from .. import native as _native

    _HAVE_NATIVE = _native.available()
except Exception:  # pragma: no cover - no toolchain
    _native = None
    _HAVE_NATIVE = False

if not _HAVE_NATIVE:  # pragma: no cover
    from ..spec import golden as _golden

__all__ = [
    "compress",
    "compress_prepend_size",
    "compress_with_dict",
    "compress_prepend_size_with_dict",
    "compress_into",
    "compress_into_with_dict",
    "compress_into_with_table",
    "CompressTable",
    "get_maximum_output_size",
    "decompress",
    "decompress_size_prepended",
    "decompress_with_dict",
    "decompress_size_prepended_with_dict",
    "decompress_into",
    "decompress_into_with_dict",
    "uncompressed_size",
    "errors",
    "CompressError",
    "CompressOutputTooSmall",
    "DecompressError",
    "ExpectedAnotherByte",
    "LiteralOutOfBounds",
    "OffsetOutOfBounds",
    "OffsetZero",
    "OutputTooSmall",
]


def _as_bytes(data) -> bytes:
    if isinstance(data, (bytes, bytearray, memoryview)):
        return bytes(data)
    if isinstance(data, np.ndarray):
        return data.tobytes()
    raise TypeError(f"expected bytes-like, got {type(data)!r}")


def _writable_u8(output) -> np.ndarray:
    """View a writable bytes-like as uint8 ndarray without copying."""
    if isinstance(output, np.ndarray):
        if output.dtype != np.uint8 or not output.flags.c_contiguous:
            raise TypeError("output array must be contiguous uint8")
        return output
    mv = memoryview(output)
    if mv.readonly:
        raise TypeError("output buffer is read-only")
    return np.frombuffer(mv, dtype=np.uint8)


def _trim_dict(ext_dict) -> bytes:
    d = _as_bytes(ext_dict)
    if len(d) <= 3:
        return b""
    return d[-65536:] if len(d) > 65536 else d


# ---------------------------------------------------------------------------
# Compression
# ---------------------------------------------------------------------------


def _compress_raw(data: bytes, ext_dict: bytes, out: np.ndarray | None):
    if _HAVE_NATIVE:
        use_hash5 = len(ext_dict) + len(data) >= 0xFFFF
        table = _native.new_table()
        if ext_dict:
            _native.init_dict_table(table, ext_dict, use_hash5)
        return _native.compress_block(
            data, ext_dict=ext_dict, table=table, use_hash5=use_hash5, out=out
        )
    comp = (
        _golden.compress_with_dict(data, ext_dict) if ext_dict else _golden.compress(data)
    )
    if out is None:
        return comp
    if len(comp) > out.size:
        raise CompressOutputTooSmall()
    out[: len(comp)] = np.frombuffer(comp, np.uint8)
    return len(comp)


def compress(data) -> bytes:
    """Compress all bytes of ``data`` (raw block, no size header)."""
    return _compress_raw(_as_bytes(data), b"", None)


def compress_prepend_size(data) -> bytes:
    """Compress with the uncompressed size prepended as little-endian u32."""
    data = _as_bytes(data)
    return struct.pack("<I", len(data)) + _compress_raw(data, b"", None)


def compress_with_dict(data, ext_dict) -> bytes:
    """Compress with an external dictionary (the last 64 KiB are used)."""
    return _compress_raw(_as_bytes(data), _trim_dict(ext_dict), None)


def compress_prepend_size_with_dict(data, ext_dict) -> bytes:
    data = _as_bytes(data)
    return struct.pack("<I", len(data)) + _compress_raw(data, _trim_dict(ext_dict), None)


def compress_into(data, output) -> int:
    """Compress into a preallocated buffer (>= get_maximum_output_size).

    Returns the number of compressed bytes written.
    """
    out = _writable_u8(output)
    data = _as_bytes(data)
    if out.size < get_maximum_output_size(len(data)):
        raise CompressOutputTooSmall()
    return _compress_raw(data, b"", out)


def compress_into_with_dict(data, output, ext_dict) -> int:
    out = _writable_u8(output)
    data = _as_bytes(data)
    if out.size < get_maximum_output_size(len(data)):
        raise CompressOutputTooSmall()
    return _compress_raw(data, _trim_dict(ext_dict), out)


class CompressTable:
    """A reusable compression table that avoids re-allocating the internal
    hash table on every call (parity with the reference's CompressTable,
    src/block/compress.rs:710-766).

    ``small()`` uses the 4-byte hash (inputs < 64 KiB); ``large()`` the 5-byte
    hash. A small table is transparently upgraded when a large input arrives.
    """

    __slots__ = ("_table", "_large")

    def __init__(self, large: bool = False) -> None:
        self._table = _native.new_table() if _HAVE_NATIVE else None
        self._large = large

    @classmethod
    def small(cls) -> "CompressTable":
        return cls(large=False)

    @classmethod
    def large(cls) -> "CompressTable":
        return cls(large=True)

    @property
    def is_large(self) -> bool:
        return self._large


def compress_into_with_table(data, output, table: CompressTable) -> int:
    """Compress into ``output`` reusing ``table``'s hash table allocation."""
    data = _as_bytes(data)
    out = _writable_u8(output)
    if out.size < get_maximum_output_size(len(data)):
        raise CompressOutputTooSmall()
    if len(data) >= 0xFFFF and not table._large:
        table._large = True
    if not _HAVE_NATIVE:
        return _compress_raw(data, b"", out)
    table._table[:] = 0
    return _native.compress_block(
        data, table=table._table, use_hash5=table._large, out=out
    )


# ---------------------------------------------------------------------------
# Decompression
# ---------------------------------------------------------------------------


def _decompress_raw(data: bytes, max_size: int, ext_dict: bytes,
                    out: np.ndarray | None, out_pos: int = 0):
    if _HAVE_NATIVE:
        return _native.decompress_block(
            data, max_size, ext_dict=ext_dict, out=out, out_pos=out_pos
        )
    res = _golden.decompress_block(data, max_size, ext_dict=ext_dict)
    if out is None:
        return res
    out[out_pos : out_pos + len(res)] = np.frombuffer(res, np.uint8)
    return len(res)


def decompress(data, min_uncompressed_size: int) -> bytes:
    """Decompress a raw block into a new buffer of at most
    ``min_uncompressed_size`` bytes (must be >= the real uncompressed size)."""
    return _decompress_raw(_as_bytes(data), min_uncompressed_size, b"", None)


def decompress_with_dict(data, min_uncompressed_size: int, ext_dict) -> bytes:
    return _decompress_raw(
        _as_bytes(data), min_uncompressed_size, _as_bytes(ext_dict), None
    )


def uncompressed_size(data) -> tuple[int, bytes]:
    """Read the little-endian u32 size prefix; returns (size, rest)."""
    data = _as_bytes(data)
    if len(data) < 4:
        raise ExpectedAnotherByte()
    (size,) = struct.unpack_from("<I", data)
    return size, data[4:]


def decompress_size_prepended(data) -> bytes:
    size, rest = uncompressed_size(data)
    return decompress(rest, size)


def decompress_size_prepended_with_dict(data, ext_dict) -> bytes:
    size, rest = uncompressed_size(data)
    return decompress_with_dict(rest, size, ext_dict)


def decompress_into(data, output) -> int:
    """Decompress into a preallocated buffer; returns bytes written."""
    out = _writable_u8(output)
    return _decompress_raw(_as_bytes(data), out.size, b"", out)


def decompress_into_with_dict(data, output, ext_dict) -> int:
    out = _writable_u8(output)
    return _decompress_raw(_as_bytes(data), out.size, _as_bytes(ext_dict), out)
