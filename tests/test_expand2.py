"""Differential tests for the fragment-structured expansion kernel
(ops/expand2.py) against the v1 per-byte doubling kernel and the host
decoder — the independent-implementation oracle pattern of the reference's
cross-impl tests (tests/tests.rs:109-147)."""

import numpy as np
import pytest

from lz4_flex_tpu import block
from lz4_flex_tpu.ops.decode import decode_block_device, expand_on_device
from lz4_flex_tpu.ops.sequences import parse_sequences_host


def _expand(comp: bytes, n: int, dic: bytes, engine: str) -> bytes:
    comp_np = np.frombuffer(comp, np.uint8)
    seq = parse_sequences_host(comp_np)
    dic_np = np.frombuffer(dic, np.uint8) if dic else np.empty(0, np.uint8)
    out = expand_on_device(comp_np, seq, dic_np, n, engine=engine)
    return bytes(np.asarray(out).tobytes())


def _roundtrip_both(data: bytes, dic: bytes = b""):
    comp = (
        block.compress_with_dict(data, dic) if dic else block.compress(data)
    )
    for engine in ("v1", "v2"):
        assert _expand(comp, len(data), dic, engine) == data, engine


def test_expand2_corpus(corpus_34k):
    _roundtrip_both(corpus_34k)


def test_expand2_rle_and_overlap():
    # offset-1 byte fill, short cyclic overlaps, long runs: the deep-chain
    # cases the analytic self-overlap collapse handles
    # (src/block/decompress_safe.rs:301-318).
    _roundtrip_both(b"\x00" * 30000)
    _roundtrip_both(b"ab" * 9000)
    _roundtrip_both(b"abc" * 5000 + b"xyzw" * 2500)
    _roundtrip_both(bytes(range(256)) * 16 + b"A" * 5000)


def test_expand2_dict_crossing(corpus_34k):
    dic = corpus_34k[:4096]
    body = corpus_34k[2048:20000]
    _roundtrip_both(body, dic)


def test_expand2_match_into_dict_tail():
    # matches that start in the dictionary and extend into the output
    # (copy_from_dict stitch, src/block/decompress.rs:85-109)
    dic = b"0123456789" * 800
    data = dic[-100:] + b"fresh bytes" + dic[-100:]
    _roundtrip_both(data, dic)


def test_expand2_small_and_edge():
    _roundtrip_both(b"A")
    _roundtrip_both(b"hello world, hello world!")
    _roundtrip_both(b"x" * 13)


def test_expand2_random_soup():
    rng = np.random.default_rng(42)
    for n in (1000, 5000, 20000):
        data = rng.integers(0, 8, n, dtype=np.uint8).tobytes()
        _roundtrip_both(data)


def test_expand2_public_path(corpus_34k):
    # decode_block_device routes through the default engine.
    comp = block.compress(corpus_34k)
    assert decode_block_device(comp, len(corpus_34k)) == corpus_34k


def test_expand2_fragmented_text(corpus_34k):
    # word-soup shuffle: many short matches -> dense fragment structure,
    # exercising the tier-2 (>K fragments per cell) materialization path
    words = corpus_34k.split()
    rng = np.random.default_rng(3)
    soup = b" ".join(words[i] for i in rng.integers(0, len(words), 8000))
    _roundtrip_both(soup)
