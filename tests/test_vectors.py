"""Frozen known-answer wire vectors.

Every engine in this repo (golden Python, native C++, XLA device kernels,
ring plan builder) was written here, and two of them transcribe the same
reference algorithm — so a shared spec misreading could pass every
differential test. These vectors are the independent oracle: compressed
bytes hand-derived from the published LZ4 block/frame format specs
(lz4_Block_format.md / lz4_Frame_format.md, mirrored by the reference at
/root/reference/src/block/mod.rs:1-3 and src/frame/header.rs:93-127), with
the expected plaintext written out literally. Frame checksums are computed
with the independent `xxhash` package, not this repo's implementation.

Covers: token split, LSIC runs crossing the 255-byte extension boundary,
overlap offsets 1/2/7, MAX_DISTANCE (65535) references, stored blocks,
every FLG bit, legacy + skippable + concatenated frames, linked-mode
cross-block references — plus poisoned-buffer leak checks on
``decompress_into`` (the reference's fuzz_decomp_no_output_leak analog).
"""

import struct

import numpy as np
import pytest
import xxhash

from lz4_flex_tpu import block, frame
from lz4_flex_tpu.block import errors as block_errors
from lz4_flex_tpu.frame import errors as frame_errors
from lz4_flex_tpu.frame.device import decompress_frame_device
from lz4_flex_tpu.ops.decode import decode_block_device
from lz4_flex_tpu.ops.ringdecode import (
    build_ring_plan,
    decode_block_ring,
    simulate_ring_plan,
)
from lz4_flex_tpu.spec import golden

# ---------------------------------------------------------------------------
# Block-format vectors: (name, compressed bytes, expected output)
# ---------------------------------------------------------------------------

_LSIC_530 = bytes((i * 7 + 3) % 256 for i in range(530))
_LSIC_270 = bytes((i * 11 + 5) % 256 for i in range(270))

BLOCK_VECTORS = [
    # token 0x00: zero literals, end of block => empty output
    ("empty_token", bytes([0x00]), b""),
    # literal-only last sequence (spec: last sequence has no match part)
    ("lit_only", bytes([0x50]) + b"Hello", b"Hello"),
    # 4 literals + match(offset=4, len=4) + literal tail:
    # token 0x40 = ll 4, ml code 0 (=MINMATCH)
    (
        "lit_match_tail",
        bytes([0x40]) + b"abcd" + bytes([0x04, 0x00, 0x50]) + b"XYZWV",
        b"abcdabcdXYZWV",
    ),
    # offset-1 RLE: 'A' then 19 self-overlapping copies of it.
    # token 0x1F = ll 1, ml code 15; extension byte 0x00 => ml = 15+0+4 = 19
    (
        "rle_off1",
        bytes([0x1F]) + b"A" + bytes([0x01, 0x00, 0x00, 0x50]) + b"BCDEF",
        b"A" * 20 + b"BCDEF",
    ),
    # offset-2 overlap: token 0x26 = ll 2, ml 6+4=10
    (
        "off2_overlap",
        bytes([0x26]) + b"ab" + bytes([0x02, 0x00, 0x50]) + b"01234",
        b"ab" + b"ababababab" + b"01234",
    ),
    # offset-7 overlap: token 0x76 = ll 7, ml 10
    (
        "off7_overlap",
        bytes([0x76]) + b"abcdefg" + bytes([0x07, 0x00, 0x50]) + b"56789",
        b"abcdefg" + b"abcdefgabc" + b"56789",
    ),
    # LSIC literal run through two 0xFF extension bytes:
    # ll = 15 + 255 + 255 + 5 = 530
    ("lsic_lit_530", bytes([0xF0, 0xFF, 0xFF, 0x05]) + _LSIC_530, _LSIC_530),
    # LSIC literal run ending exactly on the 255 boundary:
    # ll = 15 + 255 + 0 = 270 (the 0x00 extension byte is mandatory)
    ("lsic_lit_270", bytes([0xF0, 0xFF, 0x00]) + _LSIC_270, _LSIC_270),
    # LSIC match run: token 0x4F = ll 4, ml = 15 + 255 + 0 + 4 = 274 over
    # a period-4 source => "wxyz" cycled
    (
        "lsic_match_274",
        bytes([0x4F]) + b"wxyz" + bytes([0x04, 0x00, 0xFF, 0x00, 0x50])
        + b"TAIL!",
        b"wxyz" + (b"wxyz" * 69)[:274] + b"TAIL!",
    ),
    # MAX_DISTANCE: a 65535-byte literal run (LSIC: 15 + 255*256 + 240),
    # then a match at offset 65535 reaching the very first byte
    (
        "max_distance",
        bytes([0xF0]) + bytes([0xFF] * 256) + bytes([0xF0])
        + (b"Z" + b"A" * 65534) + bytes([0xFF, 0xFF, 0x50]) + b"tail5",
        b"Z" + b"A" * 65534 + b"ZAAA" + b"tail5",
    ),
]

BLOCK_ERROR_VECTORS = [
    ("offset_zero", bytes([0x14]) + b"Q" + bytes([0x00, 0x00, 0x50]) + b"ABCDE",
     block_errors.OffsetZero),
    ("offset_oob", bytes([0x14]) + b"Q" + bytes([0x05, 0x00, 0x50]) + b"ABCDE",
     block_errors.OffsetOutOfBounds),
    ("truncated_lsic", bytes([0xF0, 0xFF]), block_errors.ExpectedAnotherByte),
    ("lit_past_end", bytes([0x90]) + b"abc", block_errors.LiteralOutOfBounds),
    # spec: the last sequence must be literal-only; ending on a match is
    # malformed (the next token read hits end-of-input)
    ("end_on_match", bytes([0x14]) + b"Q" + bytes([0x01, 0x00]),
     block_errors.ExpectedAnotherByte),
    ("empty_input", b"", block_errors.ExpectedAnotherByte),
]


@pytest.mark.parametrize("name,comp,expected",
                         BLOCK_VECTORS, ids=[v[0] for v in BLOCK_VECTORS])
def test_block_vector_all_engines(name, comp, expected):
    n = len(expected)
    # golden Python model
    assert golden.decompress_block(comp, n) == expected
    # native C++ host engine
    assert block.decompress(comp, n) == expected
    # XLA device expansion (host parse)
    assert decode_block_device(comp, n) == expected
    # ring plan builder + numpy kernel simulator
    if n:
        cn = np.frombuffer(comp, np.uint8)
        plan = build_ring_plan(cn, n)
        assert plan is not None
        assert simulate_ring_plan(plan, cn) == expected


@pytest.mark.parametrize("name,comp,err", BLOCK_ERROR_VECTORS,
                         ids=[v[0] for v in BLOCK_ERROR_VECTORS])
def test_block_error_vector_all_engines(name, comp, err):
    with pytest.raises(err):
        golden.decompress_block(comp, 1 << 20)
    with pytest.raises(err):
        block.decompress(comp, 1 << 20)
    with pytest.raises(err):
        decode_block_device(comp, 1 << 20)
    with pytest.raises(err):
        build_ring_plan(np.frombuffer(bytearray(comp), np.uint8), 1 << 20)


def test_block_vectors_ring_kernel_interpret():
    # The Pallas kernel itself (interpret mode) on the overlap/LSIC vectors.
    for name, comp, expected in BLOCK_VECTORS:
        if name in ("rle_off1", "off2_overlap", "off7_overlap",
                    "lsic_match_274"):
            got = decode_block_ring(np.frombuffer(comp, np.uint8),
                                    len(expected), interpret=True)
            assert got == expected, name


def test_poisoned_buffer_no_leak():
    # The reference's fuzz_decomp_no_output_leak analog
    # (/root/reference/fuzz/fuzz_targets/fuzz_decomp_no_output_leak.rs):
    # decode into buffers pre-filled with different poisons; the decoded
    # region must be identical (a difference means uninitialized/poison
    # bytes leaked into the output).
    for name, comp, expected in BLOCK_VECTORS:
        out_ff = np.full(len(expected) + 64, 0xFF, np.uint8)
        out_00 = np.zeros(len(expected) + 64, np.uint8)
        n1 = block.decompress_into(comp, out_ff)
        n2 = block.decompress_into(comp, out_00)
        assert n1 == n2 == len(expected), name
        assert out_ff[:n1].tobytes() == expected, name
        assert out_00[:n2].tobytes() == expected, name


def test_poisoned_buffer_no_leak_with_dict():
    ext = b"0123456789abcdef" * 8
    data = b"abcdef" + ext[-32:] + b"qrs" * 40
    comp = block.compress_with_dict(data, ext)
    out_ff = np.full(len(data) + 32, 0xFF, np.uint8)
    out_00 = np.zeros(len(data) + 32, np.uint8)
    n1 = block.decompress_into_with_dict(comp, out_ff, ext)
    n2 = block.decompress_into_with_dict(comp, out_00, ext)
    assert n1 == n2 == len(data)
    assert out_ff[:n1].tobytes() == data
    assert out_00[:n2].tobytes() == data


# ---------------------------------------------------------------------------
# Frame-format vectors
# ---------------------------------------------------------------------------

MAGIC = 0x184D2204
LEGACY_MAGIC = 0x184C2102


def _descriptor(flg: int, bd: int, content_size: int | None = None) -> bytes:
    body = bytes([flg, bd])
    if content_size is not None:
        body += struct.pack("<Q", content_size)
    hc = (xxhash.xxh32(body, 0).intdigest() >> 8) & 0xFF
    return struct.pack("<I", MAGIC) + body + bytes([hc])


def _frame_decoders(wire: bytes) -> list[bytes]:
    return [frame.decompress(wire), decompress_frame_device(wire)]


def test_frame_vector_minimal():
    # FLG 0x40: version 01, all optional bits clear (linked mode).
    # BD 0x40: 64 KB max block size.
    blk = bytes([0x50]) + b"Hello"
    wire = (
        _descriptor(0x40, 0x40)
        + struct.pack("<I", len(blk)) + blk
        + struct.pack("<I", 0)  # EndMark
    )
    for got in _frame_decoders(wire):
        assert got == b"Hello"


def test_frame_vector_all_flags():
    # FLG 0x7C: version + independent blocks + block checksums +
    # content size + content checksum. Stored (uncompressed) block: the
    # BlockInfo high bit (src/frame/header.rs:376-411).
    content = b"RAWBYTES"
    wire = (
        _descriptor(0x7C, 0x40, content_size=len(content))
        + struct.pack("<I", 0x80000000 | len(content)) + content
        + struct.pack("<I", xxhash.xxh32(content, 0).intdigest())
        + struct.pack("<I", 0)
        + struct.pack("<I", xxhash.xxh32(content, 0).intdigest())
    )
    for got in _frame_decoders(wire):
        assert got == content


def test_frame_vector_compressed_block_checksum():
    blk = bytes([0x40]) + b"abcd" + bytes([0x04, 0x00, 0x50]) + b"XYZWV"
    content = b"abcdabcdXYZWV"
    wire = (
        _descriptor(0x74, 0x40, content_size=None)  # indep+blockck+contentck
        + struct.pack("<I", len(blk)) + blk
        + struct.pack("<I", xxhash.xxh32(blk, 0).intdigest())
        + struct.pack("<I", 0)
        + struct.pack("<I", xxhash.xxh32(content, 0).intdigest())
    )
    for got in _frame_decoders(wire):
        assert got == content


def test_frame_vector_linked_cross_block():
    # Two linked blocks; block 2 opens with a match reaching into block 1's
    # output (token 0x04: zero literals, ml 8, offset 5).
    blk1 = bytes([0x50]) + b"ABCDE"
    blk2 = bytes([0x04, 0x05, 0x00, 0x50]) + b"FGHIJ"
    wire = (
        _descriptor(0x40, 0x40)
        + struct.pack("<I", len(blk1)) + blk1
        + struct.pack("<I", len(blk2)) + blk2
        + struct.pack("<I", 0)
    )
    expected = b"ABCDE" + b"ABCDEABC" + b"FGHIJ"
    for got in _frame_decoders(wire):
        assert got == expected


def test_frame_vector_independent_rejects_cross_block():
    # The same wire with the independence bit SET must fail: block 2's
    # offset-5 match has no in-block history.
    blk1 = bytes([0x50]) + b"ABCDE"
    blk2 = bytes([0x04, 0x05, 0x00, 0x50]) + b"FGHIJ"
    wire = (
        _descriptor(0x60, 0x40)
        + struct.pack("<I", len(blk1)) + blk1
        + struct.pack("<I", len(blk2)) + blk2
        + struct.pack("<I", 0)
    )
    for decode in (frame.decompress, decompress_frame_device):
        with pytest.raises(
            (frame_errors.FrameError, frame_errors.DecompressionError)
        ):
            decode(wire)


def test_frame_vector_legacy():
    blk = bytes([0x40]) + b"abcd" + bytes([0x04, 0x00, 0x50]) + b"XYZWV"
    wire = struct.pack("<I", LEGACY_MAGIC) + struct.pack("<I", len(blk)) + blk
    for got in _frame_decoders(wire):
        assert got == b"abcdabcdXYZWV"


def test_frame_vector_skippable_then_frame():
    blk = bytes([0x50]) + b"Hello"
    skip = struct.pack("<I", 0x184D2A50) + struct.pack("<I", 7) + b"skipme!"
    wire = skip + (
        _descriptor(0x40, 0x40)
        + struct.pack("<I", len(blk)) + blk
        + struct.pack("<I", 0)
    )
    # The streaming decoder surfaces skippable frames to the caller — the
    # reference's Error::SkippableFrame contract (src/frame/mod.rs:35-72) —
    # while the one-shot device decoder skips them transparently.
    with pytest.raises(frame_errors.SkippableFrame) as exc:
        frame.decompress(wire)
    assert exc.value.size == 7
    assert decompress_frame_device(wire) == b"Hello"


def test_frame_vector_concatenated():
    def one(text: bytes) -> bytes:
        blk = bytes([len(text) << 4]) + text
        return (
            _descriptor(0x40, 0x40)
            + struct.pack("<I", len(blk)) + blk
            + struct.pack("<I", 0)
        )

    wire = one(b"first") + one(b"second!")
    for got in _frame_decoders(wire):
        assert got == b"firstsecond!"


def test_frame_vector_bad_header_checksum():
    good = _descriptor(0x40, 0x40)
    bad = good[:-1] + bytes([good[-1] ^ 0xFF])
    wire = bad + struct.pack("<I", 0)
    for decode in (frame.decompress, decompress_frame_device):
        with pytest.raises(frame_errors.FrameError):
            decode(wire)


def test_frame_vector_reserved_bits():
    # FLG bit1 is reserved and must be zero.
    body = bytes([0x42, 0x40])
    hc = (xxhash.xxh32(body, 0).intdigest() >> 8) & 0xFF
    wire = struct.pack("<I", MAGIC) + body + bytes([hc]) + struct.pack("<I", 0)
    for decode in (frame.decompress, decompress_frame_device):
        with pytest.raises(frame_errors.FrameError):
            decode(wire)
