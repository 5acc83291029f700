"""Frame format: roundtrips over all mode combinations, checksums, legacy,
skippable, concatenation, corruption — the analog of the reference's frame
tests (tests/tests.rs:625-745)."""

import io
import random
import struct

import pytest

from lz4_flex_tpu import frame
from lz4_flex_tpu.frame import (
    BlockMode,
    BlockSize,
    FrameDecoder,
    FrameEncoder,
    FrameInfo,
)
from lz4_flex_tpu.frame import errors as FE


def _roundtrip(data: bytes, fi: FrameInfo | None = None, chunk: int | None = None) -> bytes:
    buf = io.BytesIO()
    enc = FrameEncoder(buf, fi)
    if chunk:
        for i in range(0, len(data), chunk):
            enc.write(data[i : i + chunk])
    else:
        enc.write(data)
    enc.finish()
    comp = buf.getvalue()
    assert frame.decompress(comp) == data
    return comp


def test_roundtrip_all_corpora_all_modes(corpus_set):
    for name, data in corpus_set.items():
        for bm in [BlockMode.Independent, BlockMode.Linked]:
            for bc, cc in [(False, False), (True, True)]:
                fi = FrameInfo(block_mode=bm, block_checksums=bc, content_checksum=cc)
                _roundtrip(data, fi, chunk=7777)


def test_roundtrip_all_block_sizes(corpus_65k):
    data = corpus_65k * 20
    for bs in [BlockSize.Max64KB, BlockSize.Max256KB, BlockSize.Max1MB, BlockSize.Max4MB]:
        for bm in [BlockMode.Independent, BlockMode.Linked]:
            _roundtrip(data, FrameInfo(block_size=bs, block_mode=bm), chunk=123_457)


def test_frame_ratio_gates(corpus_34k, corpus_65k, corpus_66k_json):
    """tests/tests.rs:175-192 analog."""
    for data, gate in [(corpus_34k, 0.585), (corpus_65k, 0.574), (corpus_66k_json, 0.235)]:
        comp = _roundtrip(data)
        assert len(comp) / len(data) < gate


def test_block_size_monotone_ratio(corpus_65k):
    """Bigger blocks must not compress worse (tests/tests.rs:688-709 analog)."""
    data = corpus_65k * 160  # ~10 MB
    prev = None
    for bs in [BlockSize.Max64KB, BlockSize.Max256KB, BlockSize.Max1MB, BlockSize.Max4MB]:
        n = len(_roundtrip(data, FrameInfo(block_size=bs)))
        if prev is not None:
            assert n < prev
        prev = n


def test_linked_beats_independent_on_small_blocks(corpus_65k):
    data = corpus_65k * 20
    ind = _roundtrip(data, FrameInfo(block_size=BlockSize.Max64KB))
    lnk = _roundtrip(
        data, FrameInfo(block_size=BlockSize.Max64KB, block_mode=BlockMode.Linked)
    )
    assert len(lnk) < len(ind)


def test_empty_frame():
    buf = io.BytesIO()
    FrameEncoder(buf).finish()
    comp = buf.getvalue()
    assert len(comp) >= 11  # header + end mark
    assert frame.decompress(comp) == b""


def test_auto_finish():
    buf = io.BytesIO()
    with FrameEncoder(buf).auto_finish() as enc:
        enc.write(b"via auto finish")
    assert frame.decompress(buf.getvalue()) == b"via auto finish"


def test_encoder_context_manager():
    buf = io.BytesIO()
    with FrameEncoder(buf) as enc:
        enc.write(b"ctx managed")
    assert frame.decompress(buf.getvalue()) == b"ctx managed"


def test_content_size_roundtrip_and_mismatch():
    buf = io.BytesIO()
    enc = FrameEncoder(buf, FrameInfo(content_size=5))
    enc.write(b"12345")
    enc.finish()
    assert frame.decompress(buf.getvalue()) == b"12345"

    enc = FrameEncoder(io.BytesIO(), FrameInfo(content_size=99))
    enc.write(b"12345")
    with pytest.raises(FE.ContentLengthError):
        enc.finish()


def test_content_size_mismatch_on_decode():
    buf = io.BytesIO()
    enc = FrameEncoder(buf, FrameInfo(content_size=5))
    enc.write(b"12345")
    enc.finish()
    comp = bytearray(buf.getvalue())
    # Patch the promised content size (bytes 6..14) and fix the header checksum.
    comp[6:14] = struct.pack("<Q", 6)
    from lz4_flex_tpu.utils.checksum import xxh32

    comp[14] = (xxh32(bytes(comp[4:14]), 0) >> 8) & 0xFF
    with pytest.raises(FE.ContentLengthError):
        frame.decompress(bytes(comp))


def test_concatenated_frames_read_contract(corpus_1k, corpus_34k):
    """read() returns 0 at each frame boundary; the next read resumes
    (reference tests/tests.rs:633-647)."""
    buf = io.BytesIO()
    enc = FrameEncoder(buf)
    enc.write(corpus_1k)
    enc.try_finish()
    enc.write(corpus_34k)
    enc.finish()
    dec = FrameDecoder(io.BytesIO(buf.getvalue()))
    assert dec.readall() == corpus_1k
    assert dec.readall() == corpus_34k
    assert dec.readall() == b""


def test_multi_frame_encoder_resets_state(corpus_65k):
    """Linked-frame state must not leak across frames from one encoder."""
    buf = io.BytesIO()
    enc = FrameEncoder(buf, FrameInfo(block_mode=BlockMode.Linked))
    enc.write(corpus_65k * 3)
    enc.try_finish()
    enc.write(corpus_65k * 2)
    enc.finish()
    dec = FrameDecoder(io.BytesIO(buf.getvalue()))
    assert dec.readall() == corpus_65k * 3
    assert dec.readall() == corpus_65k * 2


def test_block_checksum_corruption(corpus_34k):
    comp = bytearray(frame.compress(corpus_34k, FrameInfo(block_checksums=True)))
    comp[len(comp) // 2] ^= 0x5A
    with pytest.raises((FE.BlockChecksumError, FE.DecompressionError)):
        frame.decompress(bytes(comp))


def test_content_checksum_corruption(corpus_34k):
    comp = bytearray(frame.compress(corpus_34k, FrameInfo(content_checksum=True)))
    comp[-1] ^= 0x5A  # flip a bit in the trailing content checksum
    with pytest.raises(FE.ContentChecksumError):
        frame.decompress(bytes(comp))


def test_header_errors():
    with pytest.raises(FE.WrongMagicNumber):
        frame.decompress(b"\x00\x00\x00\x00 definitely not lz4")
    comp = bytearray(frame.compress(b"hello"))
    comp[4] |= 0b10  # reserved FLG bit
    with pytest.raises((FE.ReservedBitsSet, FE.HeaderChecksumError)):
        frame.decompress(bytes(comp))
    comp = bytearray(frame.compress(b"hello"))
    comp[5] ^= 0x01  # reserved BD bit
    with pytest.raises((FE.ReservedBitsSet, FE.HeaderChecksumError)):
        frame.decompress(bytes(comp))
    comp = bytearray(frame.compress(b"hello"))
    comp[6] ^= 0xFF  # corrupt header checksum byte region
    with pytest.raises(FE.FrameError):
        frame.decompress(bytes(comp))


def test_unsupported_version():
    comp = bytearray(frame.compress(b"hello"))
    comp[4] = (comp[4] & ~0b11000000) | 0b10000000
    from lz4_flex_tpu.utils.checksum import xxh32

    comp[6] = (xxh32(bytes(comp[4:6]), 0) >> 8) & 0xFF
    with pytest.raises(FE.UnsupportedVersion):
        frame.decompress(bytes(comp))


def test_skippable_frame_surfaced():
    sk = struct.pack("<II", 0x184D2A50, 7) + b"junk!!!"
    with pytest.raises(FE.SkippableFrame) as ei:
        frame.decompress(sk)
    assert ei.value.size == 7


def test_legacy_frame_roundtrip(corpus_34k):
    comp = frame.compress(corpus_34k, FrameInfo(legacy_frame=True))
    assert comp[:4] == struct.pack("<I", 0x184C2102)
    assert frame.decompress(comp) == corpus_34k


def test_legacy_frame_multiblock():
    rng = random.Random(5)
    # >8MB forces multiple legacy blocks
    data = bytes(rng.randrange(256) for _ in range(1000)) * 9000
    comp = frame.compress(data, FrameInfo(legacy_frame=True))
    assert frame.decompress(comp) == data


def test_legacy_then_standard_frame(corpus_1k, corpus_34k):
    legacy = frame.compress(corpus_34k, FrameInfo(legacy_frame=True))
    std = frame.compress(corpus_1k)
    assert frame.decompress(legacy + std) == corpus_34k + corpus_1k


def test_dict_id_rejected():
    fi = FrameInfo(block_size=BlockSize.Max64KB)
    fi.dict_id = 77
    raw = fi.write()
    with pytest.raises(FE.DictionaryNotSupported):
        frame.decompress(raw + struct.pack("<I", 0))


def test_truncated_stream_errors(corpus_34k):
    comp = frame.compress(corpus_34k, FrameInfo(content_checksum=True))
    with pytest.raises(FE.FrameError):
        frame.decompress(comp[: len(comp) // 2])


def test_corrupt_frame_never_crashes(corpus_1k):
    """Fuzz-tier analog of fuzz_decomp_corrupt_frame."""
    rng = random.Random(777)
    base = bytearray(
        frame.compress(corpus_1k, FrameInfo(block_checksums=True, content_checksum=True))
    )
    for _ in range(300):
        mutated = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        try:
            frame.decompress(bytes(mutated))
        except (FE.FrameError, Exception):
            pass


def test_flush_mid_stream(corpus_34k):
    buf = io.BytesIO()
    enc = FrameEncoder(buf)
    enc.write(corpus_34k[:100])
    enc.flush()  # forces a short block
    enc.write(corpus_34k[100:])
    enc.finish()
    assert frame.decompress(buf.getvalue()) == corpus_34k
