"""ctypes bindings for the native host runtime (lz4_native.cpp).

The shared library is compiled on first use with g++ and cached next to the
source, keyed by a source hash, so a fresh checkout self-builds. All entry
points accept/return numpy buffers to avoid per-byte Python overhead.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lz4_native.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None

# Error codes (keep in sync with lz4_native.cpp).
ERR_OUTPUT_TOO_SMALL = -1
ERR_LITERAL_OOB = -2
ERR_EXPECTED_ANOTHER_BYTE = -3
ERR_OFFSET_ZERO = -4
ERR_OFFSET_OOB = -5

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u32p = ctypes.POINTER(ctypes.c_uint32)
_u64p = ctypes.POINTER(ctypes.c_uint64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)


def _build() -> str:
    if os.environ.get("TLZ4_NO_NATIVE"):
        raise RuntimeError("native engine disabled by TLZ4_NO_NATIVE")
    # TLZ4_CXXFLAGS appends extra compile flags (e.g. the CI sanitizer job
    # passes "-fsanitize=address,undefined -fno-sanitize-recover=all");
    # the cache tag covers them so sanitized/plain builds coexist.
    extra = os.environ.get("TLZ4_CXXFLAGS", "").split()
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read() + " ".join(extra).encode()).hexdigest()[:16]
    so_path = os.path.join(_HERE, f"lz4_native_{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp.{os.getpid()}"
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-funroll-loops", "-shared",
                "-fPIC", "-fvisibility=hidden", "-std=c++17", "-pthread",
                *extra, _SRC, "-o", tmp,
            ],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so_path)
    return so_path


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        with _LOCK:
            if _LIB is None:
                lib = ctypes.CDLL(_build())
                lib.tlz4_compress_bound.restype = ctypes.c_int64
                lib.tlz4_compress_bound.argtypes = [ctypes.c_int64]
                lib.tlz4_init_dict_table.restype = None
                lib.tlz4_init_dict_table.argtypes = [_u64p, _u8p, ctypes.c_size_t, ctypes.c_int]
                lib.tlz4_compress_block.restype = ctypes.c_int64
                lib.tlz4_compress_block.argtypes = [
                    _u8p, ctypes.c_size_t, ctypes.c_size_t,
                    _u8p, ctypes.c_size_t,
                    _u8p, ctypes.c_size_t,
                    ctypes.c_uint64, _u64p, ctypes.c_int,
                ]
                lib.tlz4_decompress_block.restype = ctypes.c_int64
                lib.tlz4_decompress_block.argtypes = [
                    _u8p, ctypes.c_size_t,
                    _u8p, ctypes.c_size_t, ctypes.c_size_t,
                    _u8p, ctypes.c_size_t, _u64p,
                ]
                lib.tlz4_parse_sequences.restype = ctypes.c_int64
                lib.tlz4_parse_sequences.argtypes = [
                    _u8p, ctypes.c_size_t,
                    _i32p, _i32p, _i32p, _i32p, _i32p,
                    ctypes.c_int64, _i64p,
                ]
                lib.tlz4_xxh32.restype = ctypes.c_uint32
                lib.tlz4_xxh32.argtypes = [_u8p, ctypes.c_size_t, ctypes.c_uint32]
                lib.tlz4_xxh32_reset.restype = None
                lib.tlz4_xxh32_reset.argtypes = [_u32p, ctypes.c_uint32]
                lib.tlz4_xxh32_update.restype = None
                lib.tlz4_xxh32_update.argtypes = [_u32p, _u8p, ctypes.c_size_t]
                lib.tlz4_xxh32_digest.restype = ctypes.c_uint32
                lib.tlz4_xxh32_digest.argtypes = [_u32p]
                _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def _as_u8(buf) -> np.ndarray:
    """View a bytes-like or ndarray as a contiguous uint8 array (no copy when possible)."""
    if isinstance(buf, np.ndarray):
        arr = np.ascontiguousarray(buf, dtype=np.uint8)
    else:
        arr = np.frombuffer(buf, dtype=np.uint8) if len(buf) else np.empty(0, np.uint8)
    return arr


_EMPTY = np.zeros(1, dtype=np.uint8)  # non-null pointer for zero-length buffers


def _ptr(arr: np.ndarray):
    if arr.size == 0:
        return _EMPTY.ctypes.data_as(_u8p)
    return arr.ctypes.data_as(_u8p)


def compress_bound(n: int) -> int:
    return 16 + 4 + (n * 110) // 100


def new_table() -> np.ndarray:
    """A fresh (zeroed) 4096-entry match table."""
    return np.zeros(4096, dtype=np.uint64)


def init_dict_table(table: np.ndarray, ext_dict, use_hash5: bool) -> None:
    d = _as_u8(ext_dict)
    _lib().tlz4_init_dict_table(
        table.ctypes.data_as(_u64p), _ptr(d), d.size, int(use_hash5)
    )


def compress_block(
    data,
    input_pos: int = 0,
    ext_dict=b"",
    input_stream_offset: int | None = None,
    table: np.ndarray | None = None,
    use_hash5: bool | None = None,
    out: np.ndarray | None = None,
) -> bytes | int:
    """Greedy block encode. Returns bytes, or the compressed length when an
    ``out`` buffer is supplied (the caller reads ``out[:n]``)."""
    src = _as_u8(data)
    dic = _as_u8(ext_dict)
    if input_stream_offset is None:
        input_stream_offset = dic.size
    if use_hash5 is None:
        use_hash5 = dic.size + src.size >= 0xFFFF
    if table is None:
        table = new_table()
    return_bytes = out is None
    if out is None:
        out = np.empty(compress_bound(src.size - input_pos), dtype=np.uint8)
    n = _lib().tlz4_compress_block(
        _ptr(src), src.size, input_pos,
        _ptr(out), out.size,
        _ptr(dic), dic.size,
        input_stream_offset,
        table.ctypes.data_as(_u64p), int(use_hash5),
    )
    if n < 0:
        from ..block.errors import CompressOutputTooSmall

        raise CompressOutputTooSmall()
    return out[:n].tobytes() if return_bytes else int(n)


def decompress_block(
    data,
    max_output_size: int,
    ext_dict=b"",
    out: np.ndarray | None = None,
    out_pos: int = 0,
) -> bytes | int:
    """Token-walk block decode. Returns bytes, or the decompressed length when
    an ``out`` buffer is supplied (output appended at ``out[out_pos:]``)."""
    src = _as_u8(data)
    dic = _as_u8(ext_dict)
    return_bytes = out is None
    if out is None:
        out = np.empty(max_output_size, dtype=np.uint8)
        cap = max_output_size
    else:
        cap = out_pos + max_output_size
        if cap > out.size:
            cap = out.size
    expected = ctypes.c_uint64(0)
    n = _lib().tlz4_decompress_block(
        _ptr(src), src.size,
        _ptr(out), out_pos, cap,
        _ptr(dic), dic.size,
        ctypes.byref(expected),
    )
    if n < 0:
        _raise_decompress_error(int(n), int(expected.value), max_output_size)
    return out[out_pos : out_pos + n].tobytes() if return_bytes else int(n)


def measure_block(data) -> int:
    """Decoded size of one block via the size-only token walk (reads only
    token/LSIC bytes — ~15x cheaper than parse_sequences when just the size
    is needed). Raises the block error taxonomy on structural errors."""
    src = _as_u8(data)
    lib = _lib()
    if not hasattr(lib, "_tlz4_measure_configured"):
        lib.tlz4_measure_block.restype = ctypes.c_int64
        lib.tlz4_measure_block.argtypes = [_u8p, ctypes.c_size_t]
        lib._tlz4_measure_configured = True
    n = lib.tlz4_measure_block(_ptr(src), src.size)
    if n < 0:
        _raise_decompress_error(int(n), 0, 0)
    return int(n)


def verify_block(comp, ref, ext_dict=b"") -> bool:
    """True iff decode(comp, ext_dict) == ref, checked in one zero-write
    token walk (no output buffer). The cheap exactness guard for the device
    encoders' fingerprinted LCP stage — see tlz4_verify_block."""
    src = _as_u8(comp)
    refa = _as_u8(ref)
    dic = _as_u8(ext_dict)
    lib = _lib()
    if not hasattr(lib, "_tlz4_verify_configured"):
        lib.tlz4_verify_block.restype = ctypes.c_int64
        lib.tlz4_verify_block.argtypes = [
            _u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t,
            _u8p, ctypes.c_size_t,
        ]
        lib._tlz4_verify_configured = True
    n = lib.tlz4_verify_block(
        _ptr(src), src.size, _ptr(refa), refa.size, _ptr(dic), dic.size
    )
    return n >= 0


def _raise_decompress_error(code: int, expected: int, actual: int):
    from ..block import errors as E

    if code == ERR_OUTPUT_TOO_SMALL:
        raise E.OutputTooSmall(expected, actual)
    if code == ERR_LITERAL_OOB:
        raise E.LiteralOutOfBounds()
    if code == ERR_EXPECTED_ANOTHER_BYTE:
        raise E.ExpectedAnotherByte()
    if code == ERR_OFFSET_ZERO:
        raise E.OffsetZero()
    if code == ERR_OFFSET_OOB:
        raise E.OffsetOutOfBounds()
    raise E.DecompressError(f"unknown native error {code}")


def parse_sequences(data, max_seqs: int | None = None):
    """Parse a block into a fixed-width sequence table for device expansion.

    Returns (lit_start, lit_len, match_off, match_len, out_off, total_out),
    each an int32 array of length nseq.
    """
    src = _as_u8(data)
    if max_seqs is None:
        # A sequence is at least 3 bytes (token + offset), +1 final record.
        max_seqs = src.size // 3 + 2
    lit_start = np.empty(max_seqs, dtype=np.int32)
    lit_len = np.empty(max_seqs, dtype=np.int32)
    match_off = np.empty(max_seqs, dtype=np.int32)
    match_len = np.empty(max_seqs, dtype=np.int32)
    out_off = np.empty(max_seqs, dtype=np.int32)
    total = ctypes.c_int64(0)
    n = _lib().tlz4_parse_sequences(
        _ptr(src), src.size,
        lit_start.ctypes.data_as(_i32p), lit_len.ctypes.data_as(_i32p),
        match_off.ctypes.data_as(_i32p), match_len.ctypes.data_as(_i32p),
        out_off.ctypes.data_as(_i32p),
        max_seqs, ctypes.byref(total),
    )
    if n < 0:
        _raise_decompress_error(int(n), 0, 0)
    n = int(n)
    return (
        lit_start[:n], lit_len[:n], match_off[:n], match_len[:n], out_off[:n],
        int(total.value),
    )


def xxh32(data, seed: int = 0) -> int:
    src = _as_u8(data)
    return int(_lib().tlz4_xxh32(_ptr(src), src.size, seed))


class NativeXxHash32:
    """Streaming xxHash32 backed by the native library."""

    __slots__ = ("_state",)

    def __init__(self, seed: int = 0) -> None:
        self._state = np.zeros(11, dtype=np.uint32)
        _lib().tlz4_xxh32_reset(self._state.ctypes.data_as(_u32p), seed)

    def write(self, data) -> None:
        src = _as_u8(data)
        _lib().tlz4_xxh32_update(self._state.ctypes.data_as(_u32p), _ptr(src), src.size)

    def digest(self) -> int:
        return int(_lib().tlz4_xxh32_digest(self._state.ctypes.data_as(_u32p)))
