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


def test_corrupt_ring_plan_loop():
    # The ring-plan builder (tlz4_build_ring_plan2) is the production parser
    # for untrusted input on every device decode path; its manual pointer
    # arithmetic gets the same randomized coverage as the block decoder:
    # random buffers and mutated valid blocks must either raise a typed
    # DecompressError, return None (static-shape overflow), or produce a
    # plan whose simulation matches the host decoder byte-for-byte.
    import numpy as np

    from lz4_flex_tpu.ops.ringdecode import build_ring_plan, simulate_ring_plan

    rng = random.Random(0x51A6)
    base = bytes(
        rng.choice(b"abcdefgh \n") if rng.random() < 0.8 else rng.randrange(256)
        for _ in range(4000)
    )
    valid = block.compress(base)
    for i in range(500):
        if i % 2 == 0:
            buf = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 150)))
            expect = rng.randrange(0, 400)
        else:
            b = bytearray(valid)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            buf = bytes(b)
            expect = len(base)
        arr = np.frombuffer(buf, np.uint8)
        try:
            host = block.decompress(buf, expect)
        except DecompressError:
            host = None
        try:
            plan = build_ring_plan(arr, expect)
        except DecompressError:
            continue  # typed error is always acceptable
        if plan is None:
            continue  # static-shape overflow -> engine fallback
        assert host is not None  # builder must not accept what the host rejects
        assert simulate_ring_plan(plan, arr) == host


def test_ring_plan_lifetime_guard():
    # The 2-generation record-array pool invalidates a plan on the second
    # subsequent build in the same thread; uploading a stale plan must fail
    # loudly (RuntimeError), not corrupt output.
    import numpy as np

    from lz4_flex_tpu.ops.ringdecode import (
        build_ring_plan,
        ring_plan_device_arrays,
    )

    data = bytes(random.Random(3).choice(b"abcdef") for _ in range(40_000))
    comp = np.frombuffer(block.compress(data), np.uint8)
    a = build_ring_plan(comp, len(data))
    b = build_ring_plan(comp, len(data))
    assert a is not None and b is not None
    ring_plan_device_arrays(a, comp)  # one subsequent build: still live
    c = build_ring_plan(comp, len(data))
    assert c is not None
    with pytest.raises(RuntimeError):
        ring_plan_device_arrays(a, comp)  # two subsequent builds: stale
    ring_plan_device_arrays(b, comp)  # one subsequent build: still live
    ring_plan_device_arrays(c, comp)


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


def test_corrupt_ring_plan_loop_tr512():
    """The same corrupt-input contract for 512-row tiles (the dense
    reserved-fire packer + widened row masks): typed error, overflow
    fallback, or a simulation that matches the host decoder exactly."""
    import numpy as np

    from lz4_flex_tpu.ops.ringdecode import build_ring_plan, simulate_ring_plan

    rng = random.Random(0x512)
    base = bytes(
        rng.choice(b"qrstuvwx \n") if rng.random() < 0.8 else rng.randrange(256)
        for _ in range(80000)
    )
    valid = block.compress(base)
    for i in range(120):
        if i % 2 == 0:
            buf = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 150)))
            expect = rng.randrange(0, 400)
        else:
            b = bytearray(valid)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            buf = bytes(b)
            expect = len(base)
        arr = np.frombuffer(buf, np.uint8)
        try:
            host = block.decompress(buf, expect)
        except DecompressError:
            host = None
        try:
            plan = build_ring_plan(arr, expect, tile_rows=512)
        except DecompressError:
            continue
        if plan is None:
            continue
        assert host is not None
        assert simulate_ring_plan(plan, arr) == host


def test_hybrid_streaming_boundary_fuzz():
    """Chunk-parallel streaming encode at adversarial sizes around the
    chunk boundary (pending-literal stitch, LSIC-threshold merges,
    matchless chunks): every output must roundtrip through the
    independent host decoder."""
    import numpy as np

    from lz4_flex_tpu.ops.encode import _CHUNK_C, compress_block_hybrid

    rng = random.Random(0xC41F)
    vocab = [
        bytes(rng.randrange(97, 123) for _ in range(rng.randrange(3, 9)))
        for _ in range(128)
    ]

    def corpus(n, mode):
        if mode == 0:  # compressible text
            out = b" ".join(
                vocab[rng.randrange(len(vocab))] for _ in range(n // 5 + 2)
            )
            return out[:n]
        if mode == 1:  # incompressible
            return bytes(rng.randrange(256) for _ in range(n))
        # alternating: random head, compressible tail (matchless chunk 0)
        h = bytes(rng.randrange(256) for _ in range(n // 2))
        t = (b"pattern! " * (n // 18 + 1))[: n - len(h)]
        return h + t

    for delta in (-7, -1, 0, 1, 13):
        for mode in (0, 1, 2):
            for mult in (1, 2):
                n = _CHUNK_C * mult + delta
                data = corpus(n, mode)
                comp = compress_block_hybrid(data)
                assert block.decompress(comp, len(data)) == data, (
                    delta, mode, mult,
                )
