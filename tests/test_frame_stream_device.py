"""Streaming frame codec on the device engine.

FrameEncoder/FrameDecoder(engine="device") serve the reference's primary
streaming io capability (src/frame/compress.rs:374-404, decompress.rs:352)
with the block work batched through the TPU pipeline: the encoder dispatches
one block per mesh device, the decoder greedily batches blocks per device
call. These tests run on the 8-virtual-device CPU mesh (conftest) and check
both directions cross-engine against the host runtime.
"""

import io

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


def _encode_device(data: bytes, fi: FrameInfo | None, chunk: int = 50_001) -> bytes:
    buf = io.BytesIO()
    enc = FrameEncoder(buf, fi, engine="device")
    for i in range(0, len(data), chunk):
        enc.write(data[i : i + chunk])
    enc.finish()
    return buf.getvalue()


def _decode_device(comp: bytes) -> bytes:
    dec = FrameDecoder(io.BytesIO(comp), engine="device")
    return dec.read_all()


@pytest.mark.parametrize("bm", [BlockMode.Independent, BlockMode.Linked])
def test_stream_device_roundtrip_multibatch(corpus_65k, bm):
    # >8 blocks of 64 KiB: exercises the batch boundary and, in linked mode,
    # the 64 KiB window carry between device dispatches.
    data = corpus_65k * 10
    fi = FrameInfo(block_size=BlockSize.Max64KB, block_mode=bm)
    comp = _encode_device(data, fi)
    # Cross-engine both ways: host reads the device frame, device reads it too.
    assert frame.decompress(comp) == data
    assert _decode_device(comp) == data


@pytest.mark.parametrize("bm", [BlockMode.Independent, BlockMode.Linked])
def test_stream_device_decodes_host_frames(corpus_65k, bm):
    data = corpus_65k * 6
    fi = FrameInfo(
        block_size=BlockSize.Max64KB,
        block_mode=bm,
        block_checksums=True,
        content_checksum=True,
    )
    buf = io.BytesIO()
    enc = FrameEncoder(buf, fi)  # host engine writes
    enc.write(data)
    enc.finish()
    assert _decode_device(buf.getvalue()) == data


def test_stream_device_checksums_and_content_size(corpus_34k):
    fi = FrameInfo(
        block_size=BlockSize.Max64KB,
        block_checksums=True,
        content_checksum=True,
        content_size=len(corpus_34k),
    )
    comp = _encode_device(corpus_34k, fi)
    assert frame.decompress(comp) == corpus_34k
    assert _decode_device(comp) == corpus_34k
    # Device decoder must catch a flipped payload byte via the block checksum.
    bad = bytearray(comp)
    bad[len(bad) // 2] ^= 0xFF
    with pytest.raises((FE.BlockChecksumError, FE.DecompressionError, FE.FrameError)):
        _decode_device(bytes(bad))


def test_stream_device_flush_short_blocks(corpus_34k):
    # flush() forces short blocks mid-stream; the device batch must handle
    # blocks shorter than block_size at arbitrary positions.
    fi = FrameInfo(block_size=BlockSize.Max64KB, block_mode=BlockMode.Linked)
    buf = io.BytesIO()
    enc = FrameEncoder(buf, fi, engine="device")
    enc.write(corpus_34k[:1000])
    enc.flush()
    enc.write(corpus_34k[1000:])
    enc.finish()
    out = buf.getvalue()
    assert frame.decompress(out) == corpus_34k
    assert _decode_device(out) == corpus_34k


def test_stream_device_stored_block_fallback():
    import os

    data = os.urandom(70_000)  # incompressible: must fall back to stored blocks
    fi = FrameInfo(block_size=BlockSize.Max64KB)
    comp = _encode_device(data, fi)
    assert frame.decompress(comp) == data
    assert _decode_device(comp) == data
    assert len(comp) < len(data) + 1024  # stored, not inflated


def test_stream_device_empty_and_concatenated(corpus_1k):
    buf = io.BytesIO()
    enc = FrameEncoder(buf, FrameInfo(), engine="device")
    enc.finish()  # empty frame
    empty = buf.getvalue()
    assert _decode_device(empty) == b""

    comp = empty + _encode_device(corpus_1k, FrameInfo())
    assert _decode_device(comp) == corpus_1k


def test_stream_device_legacy_frame(corpus_34k):
    fi = FrameInfo(legacy_frame=True)
    comp = _encode_device(corpus_34k, fi)
    assert frame.decompress(comp) == corpus_34k
    assert _decode_device(comp) == corpus_34k


def test_device_engine_sync_fallback_mid_pipeline(corpus_65k, monkeypatch):
    """Regression: when dispatch_parts_ring returns None (plan overflow /
    NFMAX ladder exhaustion) while a batch is in flight, the just-collected
    parts are stashed for a synchronous decode and the in-flight batch is
    flushed — the flush must NOT destroy the stash (that silently dropped a
    whole batch whose wire bytes were already consumed). Forced by making
    dispatch_parts_ring fail on alternating batches."""
    import io as _io

    from lz4_flex_tpu import frame
    from lz4_flex_tpu.frame import BlockMode, BlockSize, FrameDecoder, FrameInfo
    from lz4_flex_tpu.ops import ringdecode

    monkeypatch.setattr(FrameDecoder, "RING_INTERPRET", True)
    monkeypatch.setattr(FrameDecoder, "DEVICE_BATCH_BLOCKS", 2)
    real = ringdecode.dispatch_parts_ring
    calls = {"n": 0}

    def flaky(parts, **kw):
        calls["n"] += 1
        if calls["n"] % 2 == 0:
            return None  # force the sync fallback mid-pipeline
        return real(parts, **kw)

    monkeypatch.setattr(ringdecode, "dispatch_parts_ring", flaky)
    data = corpus_65k * 6  # ~12 batches of 2 blocks
    fi = FrameInfo(
        block_size=BlockSize.Max64KB,
        block_mode=BlockMode.Independent,
        # checksums OFF: the original bug was silent without them
    )
    buf = frame.compress(data, frame_info=fi)
    dec = FrameDecoder(_io.BytesIO(buf), engine="device")
    assert dec.read_all() == data
    assert calls["n"] >= 4  # both paths actually exercised


def test_device_engine_pipelined_batches(corpus_65k, monkeypatch):
    """The device engine's pipelined path: batch i+1's wire read + plan
    build overlap batch i's (dispatched, unfetched) kernel. Forced onto the
    interpret-mode ring kernel with tiny batch budgets so several pipeline
    stages (prime, steady, end-of-frame flush, concatenated restart) run."""
    import io

    from lz4_flex_tpu import frame
    from lz4_flex_tpu.frame import BlockMode, BlockSize, FrameDecoder, FrameInfo

    monkeypatch.setattr(FrameDecoder, "RING_INTERPRET", True)
    monkeypatch.setattr(FrameDecoder, "DEVICE_BATCH_BLOCKS", 2)
    data = corpus_65k * 3
    fi = FrameInfo(
        block_size=BlockSize.Max64KB,
        block_mode=BlockMode.Independent,
        content_checksum=True,
    )
    buf = frame.compress(data, frame_info=fi)
    buf += frame.compress(data[:10000], frame_info=fi)
    dec = FrameDecoder(io.BytesIO(buf), engine="device")
    assert dec.read_all() == data + data[:10000]
