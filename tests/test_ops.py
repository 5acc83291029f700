"""Device kernel tests: decode/encode/parse vs the host engines.

Mirrors the reference test strategy (SURVEY.md §4): roundtrips over the
corpus set through every engine pairing, cross-engine oracles (device encode
-> host decode and vice versa), ratio gates (tests/tests.rs:159-171), and the
malformed-input error taxonomy (src/block/decompress.rs:530-623)."""

import numpy as np
import pytest

from lz4_flex_tpu import block
from lz4_flex_tpu.block import errors as block_errors
from lz4_flex_tpu.ops import (
    compress_block_device,
    decode_block_device,
    parse_sequences_device,
)
from lz4_flex_tpu.ops.sequences import parse_sequences_host


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def test_decode_hybrid_roundtrip_corpus(corpus_set):
    for name, data in corpus_set.items():
        comp = block.compress(data)
        assert decode_block_device(comp, len(data)) == data, name


def test_decode_device_parse_roundtrip_corpus(corpus_set):
    for name, data in corpus_set.items():
        comp = block.compress(data)
        assert decode_block_device(comp, len(data), parse="device") == data, name


def test_decode_with_dict(corpus_65k):
    d, tail = corpus_65k[:50_000], corpus_65k[50_000:]
    comp = block.compress_with_dict(tail, d)
    assert decode_block_device(comp, len(tail), ext_dict=d) == tail
    assert decode_block_device(comp, len(tail), ext_dict=d, parse="device") == tail


def test_decode_overlapping_and_rle():
    # offset==1 byte-fill and short-period overlap copies stress the
    # pointer-doubling resolution (decompress_safe.rs:301-318 analog).
    for data in [b"a" * 100_000, b"ab" * 30_000, b"abcdefg" * 9_000]:
        comp = block.compress(data)
        assert decode_block_device(comp, len(data)) == data


def test_decode_output_too_small(corpus_34k):
    comp = block.compress(corpus_34k)
    with pytest.raises(block_errors.OutputTooSmall):
        decode_block_device(comp, len(corpus_34k) - 1)


def test_decode_offset_out_of_bounds():
    # 1 literal, then a match with offset 3000 into nothing, then a valid
    # literal-only terminator — well-formed except for the wild offset.
    bad = bytes([0x14, 0x41, 0xB8, 0x0B, 0x50]) + b"ABCDE"
    with pytest.raises(block_errors.OffsetOutOfBounds):
        decode_block_device(bad, 100)


def test_parse_errors_match_host():
    # Error-TAXONOMY parity: the device parser must raise the same exception
    # type as the host parser, not merely some DecompressError
    # (src/block/mod.rs:82-98 error set).
    cases = [
        b"",  # empty input
        bytes([0x40]),  # literal run past end
        bytes([0x10, 0x41]),  # missing offset
        bytes([0x12, 0x41, 0x00, 0x00]),  # offset zero
        bytes([0xF0, 0xFF, 0xFF]),  # LSIC run truncated
        bytes([0xF0] + [0xFF] * 4095),  # LSIC run to exactly a pad bucket
    ]
    for raw in cases:
        try:
            parse_sequences_host(raw)
            host_err = None
        except block_errors.DecompressError as e:
            host_err = type(e)
        if host_err is None:
            continue
        for engine in ["walk", "doubling"]:
            with pytest.raises(host_err):
                parse_sequences_device(raw, engine=engine)


def test_parse_walk_matches_doubling(corpus_34k):
    comp = block.compress(corpus_34k)
    w = parse_sequences_device(comp, engine="walk")
    d = parse_sequences_device(comp, engine="doubling")
    assert w.nseq == d.nseq and w.total_out == d.total_out
    for f in ["lit_start", "lit_len", "match_off", "match_len", "out_off"]:
        np.testing.assert_array_equal(getattr(w, f), getattr(d, f))


def test_device_parse_matches_host_parse(corpus_set):
    for name, data in corpus_set.items():
        comp = block.compress(data)
        if not comp:
            continue
        h = parse_sequences_host(comp)
        d = parse_sequences_device(comp)
        assert h.nseq == d.nseq, name
        np.testing.assert_array_equal(h.lit_start, d.lit_start, err_msg=name)
        np.testing.assert_array_equal(h.lit_len, d.lit_len, err_msg=name)
        np.testing.assert_array_equal(h.match_off, d.match_off, err_msg=name)
        np.testing.assert_array_equal(h.match_len, d.match_len, err_msg=name)
        np.testing.assert_array_equal(h.out_off, d.out_off, err_msg=name)
        assert h.total_out == d.total_out == len(data), name


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def test_encode_device_roundtrip_corpus(corpus_set):
    for name, data in corpus_set.items():
        comp = compress_block_device(data)
        assert block.decompress(comp, len(data)) == data, name
        # and through the device decoder too
        assert decode_block_device(comp, len(data)) == data, name


def test_encode_device_ratio_gates(corpus_34k, corpus_65k, corpus_66k_json):
    # The reference's hard ratio assertions (tests/tests.rs:159-171).
    gates = [(corpus_34k, 0.585), (corpus_65k, 0.574), (corpus_66k_json, 0.229)]
    for data, gate in gates:
        comp = compress_block_device(data)
        assert len(comp) / len(data) < gate


def test_encode_device_beats_or_matches_host(corpus_set):
    # The exact closest-match finder should never lose to the 4096-entry
    # hash table by more than the long-match split overhead (~0.1%).
    for name, data in corpus_set.items():
        if len(data) < 1024:
            continue
        dev = len(compress_block_device(data))
        host = len(block.compress(data))
        assert dev <= host * 1.01 + 64, (name, dev, host)


def test_encode_device_with_dict(corpus_65k):
    d, tail = corpus_65k[:50_000], corpus_65k[50_000:]
    comp = compress_block_device(tail, ext_dict=d)
    assert block.decompress_with_dict(comp, len(tail), d) == tail
    # dict should help vs no dict on correlated text
    assert len(comp) < len(compress_block_device(tail))


def test_encode_device_small_and_incompressible():
    rng = np.random.default_rng(0)
    rand = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    for data in [b"", b"x", b"ab", b"abcdefghijkl", rand]:
        comp = compress_block_device(data)
        assert block.decompress(comp, len(data)) == data


def test_encode_large_word_soup_roundtrip():
    # Regression: shuffled-vocabulary text at scale triggered differential
    # cancellation in a linear fingerprint combine (correlated ASCII pairs
    # like '.'/',' + 's'/'c' collided), producing bogus matches. Also covers
    # the fixed-width chunked encode path (> _CHUNK_C bytes).
    rng = np.random.default_rng(0xC0111DE)
    words = [bytes(w) for w in np.array_split(np.frombuffer(
        (b"alpha beta gamma delta epsilon zeta eta theta iota kappa " * 400),
        np.uint8), 997)]
    data = b" ".join(words[rng.integers(0, len(words))] for _ in range(60_000))
    data = data[:600_000]
    comp = compress_block_device(data, verify=False)
    assert block.decompress(comp, len(data)) == data


def test_encode_spec_conformant_tail():
    # Spec: last 5 bytes literal, last match starts >= 12 bytes from end
    # (test_conformant_last_block analog, compress.rs:952-988).
    data = b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"  # 30 a's
    comp = compress_block_device(data)
    seq = parse_sequences_host(comp)
    ends = seq.out_off + seq.lit_len + seq.match_len
    starts = seq.out_off + seq.lit_len
    m = seq.match_len > 0
    assert (ends[m] <= len(data) - 5).all()
    assert (starts[m] <= len(data) - 12).all()


# ---------------------------------------------------------------------------
# Hybrid encoder: device exact candidate search + native host walk
# (production encode shape; /root/reference/src/block/compress.rs:318-489
# capability via a TPU-first split instead of a hash-table scan)
# ---------------------------------------------------------------------------


def test_encode_hybrid_roundtrip_corpus(corpus_set):
    from lz4_flex_tpu.ops import compress_block_hybrid

    for name, data in corpus_set.items():
        comp = compress_block_hybrid(data)
        assert block.decompress(comp, len(data)) == data, name
        assert decode_block_device(comp, len(data)) == data, name


def test_encode_hybrid_ratio_gates(corpus_34k, corpus_65k, corpus_66k_json):
    from lz4_flex_tpu.ops import compress_block_hybrid

    gates = [(corpus_34k, 0.585), (corpus_65k, 0.574), (corpus_66k_json, 0.229)]
    for data, gate in gates:
        comp = compress_block_hybrid(data)
        assert len(comp) / len(data) < gate


def test_encode_hybrid_beats_native_table(corpus_set):
    # Exact 4-closest candidates + lazy + global walk should never lose to
    # the 4096-entry hash-table host engine.
    from lz4_flex_tpu.ops import compress_block_hybrid

    for name, data in corpus_set.items():
        if len(data) < 1024:
            continue
        hyb = len(compress_block_hybrid(data))
        host = len(block.compress(data))
        assert hyb <= host, (name, hyb, host)


def test_encode_hybrid_with_dict(corpus_65k):
    from lz4_flex_tpu.ops import compress_block_hybrid

    d = corpus_65k[:4096]
    tail = corpus_65k[4096:]
    comp = compress_block_hybrid(tail, ext_dict=d)
    assert block.decompress_with_dict(comp, len(tail), d) == tail
    assert len(comp) < len(compress_block_hybrid(tail))


def test_encode_hybrid_multichunk_crossing():
    # Input wider than one device chunk row: the host walk is global, so
    # matches crossing the chunk boundary must still roundtrip and the
    # window carried into row 2 must let its start reference row-1 bytes.
    from lz4_flex_tpu.ops import compress_block_hybrid
    from lz4_flex_tpu.ops.encode import _CHUNK_C

    rng = np.random.default_rng(7)
    words = [bytes(rng.integers(97, 123, rng.integers(3, 9))) for _ in range(500)]
    data = b" ".join(words[rng.integers(0, 500)] for _ in range(_CHUNK_C // 4))
    data = data[: _CHUNK_C + 70000]
    comp = compress_block_hybrid(data)
    assert block.decompress(comp, len(data)) == data
    assert len(comp) < len(data) // 2


def test_encode_hybrid_small_and_incompressible():
    from lz4_flex_tpu.ops import compress_block_hybrid

    rng = np.random.default_rng(3)
    for data in [b"", b"a", b"abcd" * 4, bytes(rng.integers(0, 256, 4096))]:
        comp = compress_block_hybrid(data)
        assert block.decompress(comp, len(data)) == data


def test_hybrid_streaming_multichunk_roundtrip():
    """The chunk-parallel streaming hybrid encoder (>1 chunk: concurrent
    walks + stitch of pending literal tails into the next chunk's first
    sequence) must roundtrip through the independent host decoder, with and
    without an external dictionary."""
    from lz4_flex_tpu.ops.encode import _CHUNK_C, compress_block_hybrid

    rng = np.random.default_rng(11)
    vocab = [
        bytes(rng.integers(97, 123, rng.integers(3, 9)).tobytes())
        for _ in range(256)
    ]
    n = int(_CHUNK_C * 2.5)
    data = b" ".join(
        vocab[rng.integers(0, len(vocab))] for _ in range(n // 6)
    )[:n]
    comp = compress_block_hybrid(data)
    assert block.decompress(comp, len(data)) == data
    assert len(comp) < len(data)  # really compressed

    dic = data[-65536:]
    tail = data[: _CHUNK_C + 50_000]
    cd = compress_block_hybrid(tail, ext_dict=dic)
    assert block.decompress_with_dict(cd, len(tail), dic) == tail

    # matchless (incompressible) chunks exercise the pending-run stitch
    rnd = rng.integers(0, 256, _CHUNK_C + 70_000, dtype=np.uint8).tobytes()
    cr = compress_block_hybrid(rnd)
    assert block.decompress(cr, len(rnd)) == rnd
