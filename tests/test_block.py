"""Block format: roundtrips, golden/native differential, ratio gates,
error taxonomy — the analog of the reference's block tests
(tests/tests.rs:78-192 and src/block/decompress*.rs error tests)."""

import random
import struct

import numpy as np
import pytest

from lz4_flex_tpu import block
from lz4_flex_tpu.block import errors as E
from lz4_flex_tpu.spec import golden


def test_roundtrip_all_corpora(corpus_set):
    for name, data in corpus_set.items():
        comp = block.compress(data)
        assert block.decompress(comp, len(data)) == data, name
        comp2 = block.compress_prepend_size(data)
        assert block.decompress_size_prepended(comp2) == data, name


def test_native_equals_golden(corpus_set):
    """The native encoder must emit byte-identical streams to the golden model."""
    for name, data in corpus_set.items():
        assert block.compress(data) == golden.compress(data), name
        # golden decoder accepts native-compressed data
        assert golden.decompress_block(block.compress(data), len(data)) == data, name


def test_ratio_gates(corpus_34k, corpus_65k, corpus_66k_json):
    """Quantitative gates from the reference test suite (tests/tests.rs:159-171)."""
    for data, gate in [(corpus_34k, 0.585), (corpus_65k, 0.574), (corpus_66k_json, 0.229)]:
        ratio = len(block.compress(data)) / len(data)
        assert ratio < gate, (len(data), ratio, gate)


def test_compress_into():
    data = b"hello world, hello world, hello!" * 10
    out = bytearray(block.get_maximum_output_size(len(data)))
    n = block.compress_into(data, out)
    assert block.decompress(bytes(out[:n]), len(data)) == data
    with pytest.raises(E.CompressOutputTooSmall):
        block.compress_into(data, bytearray(4))


def test_compress_into_with_table():
    table = block.CompressTable()
    data = b"hello world, hello world, hello!"
    out = bytearray(block.get_maximum_output_size(len(data)))
    n = block.compress_into_with_table(data, out, table)
    assert block.decompress(bytes(out[:n]), len(data)) == data
    # auto-upgrade on large input
    big = bytes(range(256)) * 300
    out = bytearray(block.get_maximum_output_size(len(big)))
    n = block.compress_into_with_table(big, out, table)
    assert table.is_large
    assert block.decompress(bytes(out[:n]), len(big)) == big
    # result identical to the one-shot path
    assert bytes(out[:n]) == block.compress(big)


def test_decompress_into():
    data = b"some data to squash " * 100
    comp = block.compress(data)
    out = bytearray(len(data))
    n = block.decompress_into(comp, out)
    assert n == len(data) and bytes(out) == data


def test_dict_roundtrip():
    data = bytes([10, 12, 14, 16, 18] * 4)
    comp = block.compress_with_dict(data, data)
    assert len(comp) < len(block.compress(data))
    assert block.decompress_with_dict(comp, len(data), data) == data
    comp2 = block.compress_prepend_size_with_dict(data, data)
    assert block.decompress_size_prepended_with_dict(comp2, data) == data


def test_dict_tiny_no_panic():
    data = bytes([10, 12, 14, 16, 18] * 4)
    block.compress_with_dict(data, bytes([10, 12, 14]))  # must not raise


def test_dict_larger_than_window():
    data = b"a" * 29
    ext = b"a" * (1024 * 1024)
    comp = block.compress_prepend_size_with_dict(data, ext)
    assert block.decompress_size_prepended_with_dict(comp, ext) == data


def test_dict_into_with_dict():
    data = bytes([10, 12, 14, 16, 18] * 4)
    comp = block.compress_with_dict(data, data)
    out = bytearray(2 * len(data))
    n = block.decompress_into_with_dict(comp, out, data)
    assert bytes(out[:n]) == data


def test_conformant_last_block():
    """End-of-block restrictions (reference src/block/compress.rs:952-988)."""
    aaas = b"a" * 15
    assert len(block.compress(aaas[:12])) > 12  # incompressible
    assert len(block.compress(aaas[:13])) <= 13
    assert len(block.compress(aaas[:14])) <= 14
    assert len(block.compress(aaas[:15])) <= 15
    assert len(block.compress_with_dict(aaas[:11], aaas)) > 11
    assert len(block.compress_with_dict(aaas[:12], aaas)) > 12
    assert len(block.compress_with_dict(aaas[:13], aaas)) <= 13


def test_uncompressed_size():
    data = struct.pack("<I", 42) + b"rest"
    size, rest = block.uncompressed_size(data)
    assert size == 42 and rest == b"rest"
    with pytest.raises(E.ExpectedAnotherByte):
        block.uncompressed_size(b"\x01\x02")


def test_large_lsic_roundtrip():
    """LSIC length extensions with many 0xFF bytes survive the roundtrip."""
    data = bytes(100_000)  # one giant match -> long LSIC chain
    comp = block.compress_prepend_size(data)
    assert block.decompress_size_prepended(comp) == data


def test_error_all_literal():
    assert block.decompress(bytes([0x30, ord("a"), ord("4"), ord("9")]), 3) == b"a49"


def test_error_incomplete_input():
    for bad in [b"", b"\xf0", b"\x0f\x00", b"\x0f\x01\x00"]:
        with pytest.raises(E.ExpectedAnotherByte):
            block.decompress(bad, 255)


def test_error_offsets():
    with pytest.raises(E.LiteralOutOfBounds):
        block.decompress(bytes([0x40, ord("a"), 1, 0]), 4)
    with pytest.raises(E.OutputTooSmall) as ei:
        block.decompress(bytes([0x20, 97, 97, 1, 0]), 1)
    assert ei.value.expected == 2 and ei.value.actual == 1
    with pytest.raises(E.OutputTooSmall):
        block.decompress(bytes([0x10, 97, 1, 0]), 4)
    with pytest.raises(E.OffsetOutOfBounds):
        block.decompress(
            bytes([0x0E, 255, 0] + [0] * 17), 256
        )
    with pytest.raises(E.OffsetOutOfBounds):
        block.decompress_with_dict(
            bytes([0x0E, 255, 0, 0x70] + [0] * 7), 256, bytes(250)
        )
    with pytest.raises(E.OffsetZero):
        block.decompress(bytes([0x0E, 0, 0, 0x70] + [0] * 7), 256)


def test_corrupt_input_never_crashes():
    """Fuzz-tier analog (reference fuzz_decomp_corrupt_block): random garbage
    must either decode or raise DecompressError — never crash."""
    rng = random.Random(1234)
    for _ in range(500):
        n = rng.randrange(0, 100)
        data = bytes(rng.randrange(256) for _ in range(n))
        try:
            block.decompress(data, 512)
        except E.DecompressError:
            pass
        try:
            block.decompress_with_dict(data, 512, b"some dictionary bytes here")
        except E.DecompressError:
            pass


def test_mutated_valid_stream_never_crashes(corpus_1k):
    rng = random.Random(99)
    comp = bytearray(block.compress(corpus_1k))
    for _ in range(300):
        mutated = bytearray(comp)
        for _ in range(rng.randrange(1, 4)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        try:
            block.decompress(bytes(mutated), len(corpus_1k))
        except E.DecompressError:
            pass


def test_no_output_leak():
    """Decompressing the same data twice into poisoned buffers must produce
    identical bytes (reference fuzz_decomp_no_output_leak)."""
    data = b"payload that compresses: payload payload payload"
    comp = block.compress(data)
    out1 = np.full(len(data), 0xFF, np.uint8)
    out2 = np.full(len(data), 0xAA, np.uint8)
    n1 = block.decompress_into(comp, out1)
    n2 = block.decompress_into(comp, out2)
    assert n1 == n2 and out1[:n1].tobytes() == out2[:n2].tobytes()


def test_proptest_random_roundtrips():
    """Property-test analog of the reference's proptest block (tests/tests.rs:593-623)."""
    rng = random.Random(31337)
    for _ in range(60):
        parts = []
        for _ in range(rng.randrange(1, 8)):
            kind = rng.randrange(3)
            n = rng.randrange(0, 2000)
            if kind == 0:
                parts.append(bytes(rng.randrange(256) for _ in range(n)))
            elif kind == 1:
                parts.append(bytes([rng.randrange(256)]) * n)
            else:
                word = bytes(rng.randrange(97, 123) for _ in range(rng.randrange(1, 9)))
                parts.append(word * (n // max(1, len(word))))
        data = b"".join(parts)
        comp = block.compress_prepend_size(data)
        assert block.decompress_size_prepended(comp) == data


def test_native_verify_block():
    """Zero-write verify walk (tlz4_verify_block): must agree with the real
    decoder on valid payloads, corrupted payloads, corrupted references,
    dict-referencing matches, overlap/RLE matches, and empty blocks."""
    from lz4_flex_tpu import native

    rng = random.Random(99)
    vocab = [
        bytes(rng.randrange(97, 123) for _ in range(rng.randrange(3, 9)))
        for _ in range(64)
    ]
    data = b" ".join(vocab[rng.randrange(len(vocab))] for _ in range(20000))
    comp = block.compress(data)
    assert native.verify_block(comp, data)
    bad = bytearray(data)
    bad[len(bad) // 2] ^= 1
    assert not native.verify_block(comp, bytes(bad))
    badc = bytearray(comp)
    badc[len(badc) // 3] ^= 0x10
    assert not native.verify_block(bytes(badc), data)
    # short/long reference both mismatch
    assert not native.verify_block(comp, data + b"x")
    assert not native.verify_block(comp, data[:-1])
    # dict-referencing matches: every dict flip that changes the decode
    # must be detected (and flips that don't, must not false-positive)
    dic = b"The quick brown fox jumps over the lazy dog. " * 50
    tail = dic[:400] + b" and then something else entirely 123"
    cd = block.compress_with_dict(tail, dic)
    assert native.verify_block(cd, tail, dic)
    for pos in range(len(dic) - 120, len(dic)):
        flip = bytearray(dic)
        flip[pos] ^= 1
        try:
            changed = (
                block.decompress_with_dict(cd, len(tail), bytes(flip)) != tail
            )
        except E.DecompressError:
            changed = True
        assert native.verify_block(cd, tail, bytes(flip)) == (not changed)
    # RLE / overlapping matches
    rle = b"a" * 100000 + b"xyz"
    crle = block.compress(rle)
    assert native.verify_block(crle, rle)
    flip = bytearray(rle)
    flip[50000] ^= 1
    assert not native.verify_block(crle, bytes(flip))
    # empty block
    assert native.verify_block(block.compress(b""), b"")


def test_native_measure_block():
    """Size-only walk must match the full decode size on every corpus shape,
    and raise the error taxonomy on truncation."""
    from lz4_flex_tpu import native

    rng = random.Random(7)
    for data in (
        b"",
        b"a",
        b"a" * 5000,
        bytes(rng.randrange(256) for _ in range(3000)),
        b" ".join(
            bytes(rng.randrange(97, 123) for _ in range(rng.randrange(3, 9)))
            for _ in range(5000)
        ),
    ):
        comp = block.compress(data)
        assert native.measure_block(comp) == len(data)
    comp = block.compress(b"hello hello hello hello hello")
    with pytest.raises(E.DecompressError):
        native.measure_block(comp[: len(comp) // 2])
