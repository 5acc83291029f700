"""ctypes bindings to the system C reference library (liblz4.so.1) used as
the CROSS-IMPLEMENTATION oracle — the role lzzzz plays in the reference's
test suite (/root/reference/tests/tests.rs:25-56,109-147). Block and frame
APIs both directions; tests skip when the library is absent.
"""

from __future__ import annotations

import ctypes

_LIB = None
_TRIED = False


def load():
    """The C lz4 library, or None when unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for name in ("liblz4.so.1", "liblz4.so", "liblz4.1.dylib"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            _configure(lib)
        except AttributeError:  # pragma: no cover - ancient liblz4
            continue
        _LIB = lib
        break
    return _LIB


def _configure(lib):
    u8p = ctypes.c_char_p
    lib.LZ4_compress_default.restype = ctypes.c_int
    lib.LZ4_compress_default.argtypes = [u8p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.LZ4_decompress_safe.restype = ctypes.c_int
    lib.LZ4_decompress_safe.argtypes = [u8p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.LZ4_decompress_safe_usingDict.restype = ctypes.c_int
    lib.LZ4_decompress_safe_usingDict.argtypes = [
        u8p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
    ]
    lib.LZ4_compressBound.restype = ctypes.c_int
    lib.LZ4_compressBound.argtypes = [ctypes.c_int]
    lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    lib.LZ4F_compressFrameBound.argtypes = [ctypes.c_size_t, ctypes.c_void_p]
    lib.LZ4F_compressFrame.restype = ctypes.c_size_t
    lib.LZ4F_compressFrame.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_void_p,
    ]
    lib.LZ4F_isError.restype = ctypes.c_uint
    lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
    lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
    lib.LZ4F_createDecompressionContext.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint,
    ]
    lib.LZ4F_freeDecompressionContext.restype = ctypes.c_size_t
    lib.LZ4F_freeDecompressionContext.argtypes = [ctypes.c_void_p]
    lib.LZ4F_decompress.restype = ctypes.c_size_t
    lib.LZ4F_decompress.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_void_p,
    ]


class FrameInfoC(ctypes.Structure):
    _fields_ = [
        ("blockSizeID", ctypes.c_int),
        ("blockMode", ctypes.c_int),
        ("contentChecksumFlag", ctypes.c_int),
        ("frameType", ctypes.c_int),
        ("contentSize", ctypes.c_ulonglong),
        ("dictID", ctypes.c_uint),
        ("blockChecksumFlag", ctypes.c_int),
    ]


class PreferencesC(ctypes.Structure):
    _fields_ = [
        ("frameInfo", FrameInfoC),
        ("compressionLevel", ctypes.c_int),
        ("autoFlush", ctypes.c_uint),
        ("favorDecSpeed", ctypes.c_uint),
        ("reserved", ctypes.c_uint * 3),
    ]


LZ4F_VERSION = 100


def c_compress_block(data: bytes) -> bytes:
    lib = load()
    cap = lib.LZ4_compressBound(len(data))
    dst = ctypes.create_string_buffer(cap)
    n = lib.LZ4_compress_default(data, dst, len(data), cap)
    assert n > 0, "C LZ4_compress_default failed"
    return dst.raw[:n]


def c_decompress_block(comp: bytes, out_size: int, dict_: bytes = b"") -> bytes:
    lib = load()
    dst = ctypes.create_string_buffer(max(out_size, 1))
    if dict_:
        n = lib.LZ4_decompress_safe_usingDict(
            comp, dst, len(comp), out_size, dict_, len(dict_)
        )
    else:
        n = lib.LZ4_decompress_safe(comp, dst, len(comp), out_size)
    assert n >= 0, f"C LZ4_decompress_safe failed ({n})"
    return dst.raw[:n]


def c_compress_frame(
    data: bytes,
    *,
    linked: bool = False,
    block_size_id: int = 0,
    content_checksum: bool = False,
    block_checksums: bool = False,
) -> bytes:
    lib = load()
    prefs = PreferencesC()
    prefs.frameInfo.blockSizeID = block_size_id  # 0=default,4..7=64K..4M
    prefs.frameInfo.blockMode = 0 if linked else 1  # LZ4F_blockLinked = 0
    prefs.frameInfo.contentChecksumFlag = 1 if content_checksum else 0
    prefs.frameInfo.blockChecksumFlag = 1 if block_checksums else 0
    cap = lib.LZ4F_compressFrameBound(len(data), ctypes.byref(prefs))
    dst = ctypes.create_string_buffer(cap)
    n = lib.LZ4F_compressFrame(dst, cap, data, len(data), ctypes.byref(prefs))
    assert not lib.LZ4F_isError(n), "C LZ4F_compressFrame failed"
    return dst.raw[:n]


def c_decompress_frame(comp: bytes, hint_size: int) -> bytes:
    lib = load()
    ctx = ctypes.c_void_p()
    rc = lib.LZ4F_createDecompressionContext(ctypes.byref(ctx), LZ4F_VERSION)
    assert not lib.LZ4F_isError(rc)
    try:
        out = bytearray()
        src = ctypes.create_string_buffer(comp, len(comp))
        src_pos = 0
        chunk = max(hint_size, 1 << 16)
        dst = ctypes.create_string_buffer(chunk)
        while src_pos < len(comp):
            dst_sz = ctypes.c_size_t(chunk)
            src_sz = ctypes.c_size_t(len(comp) - src_pos)
            rc = lib.LZ4F_decompress(
                ctx, dst, ctypes.byref(dst_sz),
                ctypes.byref(src, src_pos), ctypes.byref(src_sz), None,
            )
            assert not lib.LZ4F_isError(rc), "C LZ4F_decompress failed"
            out += dst.raw[: dst_sz.value]
            if src_sz.value == 0:  # no progress: would loop forever
                assert rc == 0, "C frame decoder stalled mid-frame"
                break
            src_pos += src_sz.value
        return bytes(out)
    finally:
        lib.LZ4F_freeDecompressionContext(ctx)
