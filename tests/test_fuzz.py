"""Property/fuzz tier: the reference's fuzz-target and miri-loop analogs
(SURVEY.md §4.3-4.4): corrupt inputs must raise typed errors, never crash;
random inputs roundtrip through every frame configuration; repeated decodes
are deterministic (the no-output-leak contract)."""

import io
import random

import pytest

from lz4_flex_tpu import block, frame
from lz4_flex_tpu.block.errors import DecompressError
from lz4_flex_tpu.frame import BlockMode, BlockSize, FrameDecoder, FrameEncoder, FrameInfo
from lz4_flex_tpu.frame.errors import FrameError


def test_corrupt_block_loop():
    # miri_tests/src/main.rs analog (1,000 iterations, reference scale):
    # random buffers through the block decoder.
    rng = random.Random(0xBAD5EED)
    for _ in range(1000):
        n = rng.randrange(0, 200)
        buf = bytes(rng.randrange(256) for _ in range(n))
        try:
            block.decompress_size_prepended(buf)
        except DecompressError:
            pass


def test_corrupt_block_with_dict_loop():
    rng = random.Random(0xD1C7)
    d = bytes(rng.randrange(256) for _ in range(1000))
    for _ in range(1000):
        buf = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))
        try:
            block.decompress_size_prepended_with_dict(buf, d)
        except DecompressError:
            pass


def test_corrupt_frame_loop():
    # fuzz_decomp_corrupt_frame analog: valid magic/header prefix + garbage.
    rng = random.Random(0xF4A3E)
    head = frame.compress(b"seed data for a valid header")[:7]
    for _ in range(1000):
        tail = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 100)))
        try:
            frame.decompress(head + tail)
        except (FrameError, DecompressError):
            pass


def test_roundtrip_random_frame_configs():
    # fuzz_roundtrip_frame analog: all BlockMode x BlockSize x checksum
    # combos with chunked writes and mid-stream flushes.
    rng = random.Random(0xF00D)
    sizes = [BlockSize.Max64KB, BlockSize.Max256KB]
    for i in range(24):
        fi = FrameInfo(
            block_size=sizes[i % 2],
            block_mode=BlockMode.Linked if i % 4 < 2 else BlockMode.Independent,
            block_checksums=bool(i & 1),
            content_checksum=bool(i & 2),
        )
        data = bytes(
            rng.choice(b"abcdefgh \n") if rng.random() < 0.8 else rng.randrange(256)
            for _ in range(rng.randrange(0, 150_000))
        )
        out = io.BytesIO()
        enc = FrameEncoder(out, fi)
        pos = 0
        while pos < len(data):
            step = rng.randrange(1, 70_000)
            enc.write(data[pos : pos + step])
            if rng.random() < 0.2:
                enc.flush()
            pos += step
        enc.finish()
        assert FrameDecoder(io.BytesIO(out.getvalue())).read_all() == data


def test_decode_poisoned_buffer_no_leak():
    # fuzz_decomp_no_output_leak analog: decode the same stream into
    # buffers pre-filled with different poison patterns; the decoded region
    # must be identical (poison leaking in means the decoder read bytes it
    # never wrote — the reference's 0xFF-poisoned-Vec check).
    import numpy as np

    rng = random.Random(1)
    data = bytes(rng.choice(b"abcdef") for _ in range(50_000))
    comp = block.compress(data)
    out_ff = np.full(len(data) + 128, 0xFF, np.uint8)
    out_00 = np.zeros(len(data) + 128, np.uint8)
    n1 = block.decompress_into(comp, out_ff)
    n2 = block.decompress_into(comp, out_00)
    assert n1 == n2 == len(data)
    assert out_ff[:n1].tobytes() == data
    assert out_00[:n2].tobytes() == data
