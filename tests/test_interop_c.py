"""Cross-implementation interop against the system C reference library
(liblz4) — the oracle role lzzzz plays in the reference's suite
(/root/reference/tests/tests.rs:109-147): compress with C / decompress
here and vice versa, block and frame, every engine that produces wire
bytes. Skipped when liblz4 is absent from the image.
"""

import random

import numpy as np
import pytest

from lz4_flex_tpu import block, frame
from lz4_flex_tpu.frame import BlockMode, BlockSize, FrameInfo

from . import c_oracle

pytestmark = pytest.mark.skipif(
    c_oracle.load() is None, reason="system liblz4 not available"
)


def _corpora():
    rng = random.Random(4242)
    vocab = [
        bytes(rng.randrange(97, 123) for _ in range(rng.randrange(3, 9)))
        for _ in range(300)
    ]
    word_soup = b" ".join(
        vocab[rng.randrange(len(vocab))] for _ in range(30000)
    )
    return [
        b"",
        b"a",
        b"hello hello hello hello hello hello",
        b"a" * 100000,
        bytes(rng.randrange(256) for _ in range(5000)),
        word_soup[:200_000],
    ]


def test_c_compress_host_decompress():
    """C-compressed blocks must decode byte-exactly on every decoder tier."""
    from lz4_flex_tpu.spec import golden

    for data in _corpora():
        if not data:
            continue  # C block API emits nothing useful for b""
        comp = c_oracle.c_compress_block(data)
        assert block.decompress(comp, len(data)) == data
        assert golden.decompress_block(comp, len(data)) == data


def test_host_compress_c_decompress():
    """Blocks from the host encoder must decode with the C library."""
    for data in _corpora():
        comp = block.compress(data)
        assert c_oracle.c_decompress_block(comp, len(data)) == data


def test_hybrid_and_device_compress_c_decompress():
    """Blocks from the production hybrid encoder AND the all-device encoder
    must decode with the C library (wire-format validity proven against the
    reference implementation, not just our own decoders)."""
    from lz4_flex_tpu.ops.encode import compress_block_device, compress_block_hybrid

    data = _corpora()[-1]
    comp_h = compress_block_hybrid(data)
    assert c_oracle.c_decompress_block(comp_h, len(data)) == data
    comp_d = compress_block_device(data[:60_000])
    assert c_oracle.c_decompress_block(comp_d, 60_000) == data[:60_000]


def test_dict_blocks_interop_both_directions():
    data = _corpora()[-1]
    dic, tail = data[:65536], data[65536:150_000]
    ours = block.compress_with_dict(tail, dic)
    assert c_oracle.c_decompress_block(ours, len(tail), dic) == tail


def test_c_frames_decode_here():
    """C-built frames (all mode combinations) must decode through our
    FrameDecoder, host and device engines."""
    data = _corpora()[-1]
    for linked in (False, True):
        for cc in (False, True):
            for bc in (False, True):
                comp = c_oracle.c_compress_frame(
                    data, linked=linked, content_checksum=cc,
                    block_checksums=bc, block_size_id=4,  # 64 KB blocks
                )
                assert frame.decompress(comp) == data, (linked, cc, bc)
    comp = c_oracle.c_compress_frame(data, linked=True, block_size_id=0)
    import io

    from lz4_flex_tpu.frame import FrameDecoder

    dec = FrameDecoder(io.BytesIO(comp), engine="device")
    assert dec.read_all() == data


def test_our_frames_decode_with_c():
    """Frames from our encoder (both block modes, checksums on) must decode
    with the C library's frame decoder."""
    data = _corpora()[-1]
    for mode in (BlockMode.Independent, BlockMode.Linked):
        fi = FrameInfo(
            block_size=BlockSize.Max64KB,
            block_mode=mode,
            content_checksum=True,
            block_checksums=True,
        )
        comp = frame.compress(data, frame_info=fi)
        assert c_oracle.c_decompress_frame(comp, len(data)) == data, mode


def test_ratio_parity_vs_c():
    """Our host encoder's ratio must stay within a whisker of the C
    library's on the reference corpora (the reference's own comparison,
    README.md:17-30); the hybrid encoder must beat it."""
    import pathlib

    p = pathlib.Path("/root/reference/benches/compression_66k_JSON.txt")
    if not p.exists():
        pytest.skip("reference corpus missing")
    data = p.read_bytes()
    c_n = len(c_oracle.c_compress_block(data))
    ours_n = len(block.compress(data))
    assert ours_n <= c_n * 1.01  # host greedy ~ C greedy
    from lz4_flex_tpu.ops.encode import compress_block_hybrid

    hyb_n = len(compress_block_hybrid(data))
    assert hyb_n < c_n  # exact k-closest candidates beat the hash table
