"""Mesh pipeline tests on the virtual 8-device CPU mesh (conftest).

Covers: sharded independent/linked frame encode, sharded independent block
decode, the fused whole-frame device decode (linked included), the one-jit
roundtrip step with its length all-gather, the device frame codec vs the
host streaming codec, and the driver entry points."""

import io

import numpy as np
import pytest

import jax

from lz4_flex_tpu import block, frame
from lz4_flex_tpu.frame import BlockMode, BlockSize, FrameInfo
from lz4_flex_tpu.frame.device import (
    compress_frame_device,
    decompress_frame_device,
)
from lz4_flex_tpu.ops.decode import decode_parts_fused
from lz4_flex_tpu.parallel import (
    codec_mesh,
    decode_blocks_sharded,
    encode_blocks_sharded,
    roundtrip_step_sharded,
)


def _data(size=40_000):
    import random

    rng = random.Random(42)
    out = bytearray()
    words = [b"alpha", b"beta", b"gamma", b"delta", bytes(rng.randrange(256) for _ in range(16))]
    while len(out) < size:
        out += words[rng.randrange(len(words))]
    return bytes(out[:size])


BS = 4096  # small blocks: 10 blocks across 8 devices


def test_encode_blocks_sharded_independent():
    data = _data()
    payloads, lens = encode_blocks_sharded(data, BS)
    assert sum(lens) == len(data)
    # every payload decodes with the host engine
    pos = 0
    for comp, blen in zip(payloads, lens):
        assert block.decompress(comp, blen) == data[pos : pos + blen]
        pos += blen


def test_encode_blocks_sharded_linked():
    data = _data()
    payloads, lens = encode_blocks_sharded(data, BS, linked=True)
    # linked blocks need the previous 64 KiB as dictionary
    pos = 0
    for comp, blen in zip(payloads, lens):
        d = data[max(0, pos - 65536) : pos]
        assert block.decompress_with_dict(comp, blen, d) == data[pos : pos + blen]
        pos += blen
    # linked should not be larger than independent on correlated data
    indep, _ = encode_blocks_sharded(data, BS)
    assert sum(map(len, payloads)) <= sum(map(len, indep))


def test_encode_blocks_sharded_hybrid_single_device():
    # A 1-device mesh with chunk-scale blocks routes through the hybrid
    # encoder (device candidate search + native walk) instead of shard_map
    # (parallel/pipeline.py single-device branch); payloads must stay
    # host-decodable, independent and linked.
    from jax.sharding import Mesh

    from lz4_flex_tpu.ops.encode import _CHUNK_C

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("blocks",))
    data = _data(_CHUNK_C + 70000)  # two blocks, second partial
    for linked in (False, True):
        payloads, lens = encode_blocks_sharded(
            data, _CHUNK_C, linked=linked, mesh=mesh1
        )
        assert sum(lens) == len(data) and len(payloads) == 2
        pos = 0
        for comp, blen in zip(payloads, lens):
            d = data[max(0, pos - 65536) : pos] if linked else b""
            assert block.decompress_with_dict(comp, blen, d) == data[pos : pos + blen]
            pos += blen


def test_decode_blocks_sharded():
    data = _data()
    payloads = []
    blocks = [data[i : i + BS] for i in range(0, len(data), BS)]
    payloads = [block.compress(b) for b in blocks]
    out = decode_blocks_sharded(payloads, BS)
    assert b"".join(out) == data


def test_decode_blocks_sharded_ring_is_production_path():
    # The mesh decode must run the ring engine per device (interpret mode on
    # this CPU mesh) — not silently fall back to the XLA expansion engine.
    from lz4_flex_tpu.parallel.pipeline import decode_blocks_sharded_ring

    data = _data()
    blocks = [data[i : i + BS] for i in range(0, len(data), BS)]
    payloads = [block.compress(b) for b in blocks]
    out = decode_blocks_sharded_ring(payloads, BS)
    assert out is not None and b"".join(out) == data
    # uneven split: fewer blocks than devices
    out3 = decode_blocks_sharded_ring(payloads[:3], BS)
    assert out3 is not None and b"".join(out3) == b"".join(blocks[:3])


def test_decode_parts_fused_mixed():
    data = _data()
    blocks = [data[i : i + BS] for i in range(0, len(data), BS)]
    parts = []
    for i, b in enumerate(blocks):
        if i % 3 == 2:
            parts.append((b, False))  # stored block
        else:
            parts.append((block.compress(b), True))
    assert decode_parts_fused(parts) == data


def test_decode_parts_fused_linked():
    data = _data()
    parts = []
    window = b""
    for i in range(0, len(data), BS):
        b = data[i : i + BS]
        parts.append((block.compress_with_dict(b, window), True))
        window = (window + b)[-65536:]
    assert decode_parts_fused(parts) == data


def test_decode_blocks_sharded_offset_oob():
    # A match reaching before the block start must raise, not silently
    # clamp into garbage (checked-decode parity, src/block/mod.rs:94).
    from lz4_flex_tpu.block import errors as block_errors

    bad = bytes([0x10, 0x41, 100, 0, 0x00])  # 'A', match offset 100, end token
    with pytest.raises(block_errors.OffsetOutOfBounds):
        decode_blocks_sharded([bad], BS)


def test_decode_blocks_sharded_output_too_small():
    from lz4_flex_tpu.block import errors as block_errors

    data = _data(3 * BS)[: 2 * BS + 100]
    payloads = [block.compress(data)]  # decodes to > BS bytes
    with pytest.raises(block_errors.OutputTooSmall):
        decode_blocks_sharded(payloads, BS)


def test_frame_device_rejects_cross_block_ref_independent():
    # An independent-mode frame whose second block back-references the first
    # block's output must fail exactly as the reference does
    # (src/frame/decompress.rs:294-306 decodes each block with no dict).
    import struct

    from lz4_flex_tpu.frame import errors as frame_errors
    from lz4_flex_tpu.frame.header import BlockInfo, BlockInfoKind

    fi = FrameInfo(block_size=BlockSize.Max64KB, block_mode=BlockMode.Independent)
    blk1 = block.compress(b"ABCDEFGH")
    # token: 1 literal + match len 4; literal 'Z'; offset 5 -> reaches into
    # block 1's output; then a 5-literal terminator sequence.
    blk2 = bytes([0x10, 0x5A, 5, 0, 0x50]) + b"WXYZQ"
    out = bytearray(fi.write())
    for payload in (blk1, blk2):
        out += BlockInfo(BlockInfoKind.Compressed, len(payload)).write()
        out += payload
    out += BlockInfo(BlockInfoKind.EndMark).write()
    with pytest.raises(frame_errors.DecompressionError):
        decompress_frame_device(bytes(out))


def test_roundtrip_step_sharded():
    data = _data()
    comp, lens, offsets, ok = roundtrip_step_sharded(data, BS)
    assert bool(ok)
    lens = np.asarray(lens)
    offsets = np.asarray(offsets)
    nblocks = -(-len(data) // BS)
    assert (np.cumsum(lens) - lens == offsets).all()
    assert lens[:nblocks].sum() > 0


@pytest.mark.parametrize("mode", [BlockMode.Independent, BlockMode.Linked])
@pytest.mark.parametrize("checksums", [False, True])
def test_frame_device_vs_host(mode, checksums):
    data = _data()
    fi = FrameInfo(
        block_size=BlockSize.Max64KB,
        block_mode=mode,
        block_checksums=checksums,
        content_checksum=checksums,
    )
    dev = compress_frame_device(data, fi)
    # host streaming decoder reads the device-compressed frame
    assert frame.decompress(dev) == data
    # device decoder reads the host-compressed frame
    host = frame.compress(data, fi)
    assert decompress_frame_device(host) == data
    # device roundtrip
    assert decompress_frame_device(dev) == data


def test_frame_device_concatenated_and_legacy():
    data = _data(8000)
    f1 = compress_frame_device(data)
    f2 = compress_frame_device(data[::-1], FrameInfo(legacy_frame=True))
    assert decompress_frame_device(f1 + f2) == data + data[::-1]
    assert frame.decompress(f1 + f2) == data + data[::-1]


def test_frame_device_empty():
    assert decompress_frame_device(compress_frame_device(b"")) == b""


def test_frame_device_sharded_decode():
    # Independent all-compressed frames (several blocks) route through
    # decode_blocks_sharded when a mesh is supplied.
    data = _data(300_000)
    f = compress_frame_device(data, FrameInfo(block_size=BlockSize.Max64KB))
    assert decompress_frame_device(f, mesh=codec_mesh()) == data


def test_codec_model_roundtrip():
    from lz4_flex_tpu.models import CodecConfig, LZ4Codec

    data = _data()
    codec = LZ4Codec(CodecConfig(block_size=BlockSize.Max64KB))
    assert codec.decompress(codec.compress(data)) == data
    assert frame.decompress(codec.compress(data)) == data


def test_graft_entry():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g

    fn, args = g.entry()
    out, lens, errs = jax.jit(fn)(*args)
    assert not np.asarray(errs).any()
    g.dryrun_multichip(8)


def test_fetch_global_forced_replication_matches_direct():
    """The N-host assembly path (on-device all-gather to a replicated array,
    addressable-data read) must produce the same bytes as the direct
    single-process read — dryrun_multichip asserts the same on the driver's
    virtual mesh."""
    from functools import partial

    import jax.numpy as jnp

    from lz4_flex_tpu.parallel.mesh import BLOCK_AXIS
    from lz4_flex_tpu.parallel.pipeline import fetch_global, shard_map

    mesh = codec_mesh()
    spec = jax.sharding.PartitionSpec(BLOCK_AXIS)
    x = jnp.arange(8 * 16, dtype=jnp.int32).reshape(8, 16)
    y = jax.jit(
        shard_map(lambda a: a * 2, mesh=mesh, in_specs=(spec,), out_specs=spec)
    )(x)
    np.testing.assert_array_equal(
        fetch_global(y, force_replicate=True), fetch_global(y)
    )


def test_distributed_init_single_process_noop():
    from lz4_flex_tpu.parallel.mesh import distributed_init

    assert distributed_init() is False
    assert distributed_init() is False  # idempotent
