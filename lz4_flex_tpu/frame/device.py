"""One-shot frame codec on the device engine.

The streaming FrameEncoder/FrameDecoder (encoder.py / decoder.py) drive the
native host runtime block-by-block — the right engine for io streams. These
one-shot functions are the TPU bulk path: all frame blocks are staged to the
device at once, compressed/decompressed data-parallel over the mesh
(parallel/pipeline.py), and reassembled in frame order on the host. Both
block modes are supported:

  - encode: independent AND linked blocks are data-parallel (a linked
    block's dictionary is a slice of the input, known upfront);
  - decode: one fused global expansion resolves the whole frame's match
    dependency graph at once (ops.decode.decode_parts_fused), so linked
    frames decode as parallel as independent ones.

Wire format matches the reference exactly: descriptor, BlockInfo words with
the stored-block fallback (src/frame/compress.rs:301-306), optional xxHash32
block/content checksums, end mark, legacy frames.
"""

from __future__ import annotations

import struct

from ..spec.constants import LZ4F_LEGACY_MAGIC_NUMBER
from ..utils.checksum import xxh32
from . import errors
from .header import BlockInfo, BlockInfoKind, BlockMode, BlockSize, FrameInfo


def compress_frame_device(
    data, frame_info: FrameInfo | None = None, *, mesh=None, verify: bool = True
) -> bytes:
    """Compress ``data`` into one LZ4 frame with mesh-parallel block encode.

    ``verify`` (default on) roundtrip-checks every payload through the host
    decoder before framing it — the production guard against device-encoder
    fingerprint collisions (see parallel.pipeline.encode_blocks_sharded)."""
    from ..parallel.pipeline import encode_blocks_sharded

    data = bytes(data)
    fi = frame_info if frame_info is not None else FrameInfo()
    if fi.block_size == BlockSize.Auto:
        fi.block_size = BlockSize.from_buf_length(len(data))
    if fi.legacy_frame:
        fi.block_size = BlockSize.Max8MB
        fi.block_mode = BlockMode.Independent
    block_size = fi.block_size.get_size()
    linked = fi.block_mode == BlockMode.Linked and not fi.legacy_frame

    if fi.content_size is not None and fi.content_size != len(data):
        raise errors.ContentLengthError(fi.content_size, len(data))

    out = bytearray()
    if fi.legacy_frame:
        out += struct.pack("<I", LZ4F_LEGACY_MAGIC_NUMBER)
    else:
        out += fi.write()

    if data:
        payloads, lens = encode_blocks_sharded(
            data, block_size, linked=linked, mesh=mesh, verify=verify
        )
    else:
        payloads, lens = [], []

    pos = 0
    for comp, blen in zip(payloads, lens):
        raw = data[pos : pos + blen]
        pos += blen
        if fi.legacy_frame:
            out += struct.pack("<I", len(comp))
            out += comp
            continue
        if len(comp) < blen:
            info, payload = BlockInfo(BlockInfoKind.Compressed, len(comp)), comp
        else:
            info, payload = BlockInfo(BlockInfoKind.Uncompressed, blen), raw
        out += info.write()
        out += payload
        if fi.block_checksums:
            out += struct.pack("<I", xxh32(payload, 0))

    if not fi.legacy_frame:
        out += BlockInfo(BlockInfoKind.EndMark).write()
        if fi.content_checksum:
            out += struct.pack("<I", xxh32(data, 0))
    return bytes(out)


def decompress_frame_device(data, *, mesh=None) -> bytes:
    """Decompress every concatenated frame in ``data`` on the device.

    Independent-mode frames whose blocks are all compressed shard
    data-parallel over ``mesh`` when one is given; everything else (linked
    frames, stored blocks, legacy frames) goes through the fused global
    expansion (one device call per frame)."""
    from ..ops.decode import decode_parts_fused
    from ..spec.constants import (
        MAGIC_NUMBER_SIZE,
        MIN_FRAME_INFO_SIZE,
    )

    data = bytes(data)
    pos = 0
    chunks = []
    while pos < len(data):
        # ---- header -------------------------------------------------------
        head = data[pos : pos + MIN_FRAME_INFO_SIZE]
        if len(head) < MAGIC_NUMBER_SIZE:
            raise errors.FrameError("truncated frame header")
        required = FrameInfo.read_size(head)
        head = data[pos : pos + required]
        if len(head) < required:
            raise errors.FrameError("truncated frame header")
        try:
            fi = FrameInfo.read(head)
        except errors.SkippableFrame as sf:
            pos += MAGIC_NUMBER_SIZE + 4 + sf.size
            continue
        if fi.dict_id is not None:
            raise errors.DictionaryNotSupported()
        pos += required
        max_block_size = fi.block_size.get_size()

        # ---- block walk ---------------------------------------------------
        parts = []
        while True:
            if fi.legacy_frame:
                if pos + 4 > len(data):
                    break  # legacy frames end at EOF / next magic
                (word,) = struct.unpack_from("<I", data, pos)
                from .decoder import _is_any_magic

                if _is_any_magic(word):
                    break
                pos += 4
                if word > 16 + 4 + (8 * 1024 * 1024 * 110) // 100:
                    raise errors.BlockTooBig()
                payload = data[pos : pos + word]
                if len(payload) < word:
                    raise errors.FrameError("truncated block")
                pos += word
                parts.append((payload, True))
                continue
            if pos + 4 > len(data):
                raise errors.FrameError("truncated block info")
            info = BlockInfo.read(data[pos : pos + 4])
            pos += 4
            if info.kind is BlockInfoKind.EndMark:
                break
            if info.size > max_block_size:
                raise errors.BlockTooBig()
            payload = data[pos : pos + info.size]
            if len(payload) < info.size:
                raise errors.FrameError("truncated block payload")
            pos += info.size
            if fi.block_checksums:
                if pos + 4 > len(data):
                    raise errors.FrameError("truncated block checksum")
                (expected,) = struct.unpack_from("<I", data, pos)
                pos += 4
                if xxh32(payload, 0) != expected:
                    raise errors.BlockChecksumError()
            parts.append((payload, info.kind is BlockInfoKind.Compressed))

        # ---- device decode ------------------------------------------------
        from ..block.errors import DecompressError

        independent = fi.legacy_frame or fi.block_mode == BlockMode.Independent
        try:
            if (
                mesh is not None
                and not fi.legacy_frame
                and fi.block_mode == BlockMode.Independent
                and len(parts) > 1
                and all(is_comp for _, is_comp in parts)
            ):
                from ..parallel.pipeline import decode_blocks_sharded

                out = b"".join(
                    decode_blocks_sharded(
                        [p for p, _ in parts], max_block_size, mesh=mesh
                    )
                )
            else:
                # Primary engine: the Pallas ring kernel (one plan covers the
                # whole frame body, linked or independent). Frames that do
                # not fit the static plan shape fall back to the XLA fused
                # global expansion.
                from ..ops.ringdecode import decode_parts_ring

                out = decode_parts_ring(
                    parts,
                    independent=independent,
                    max_block_size=max_block_size,
                )
                if out is None:
                    out = decode_parts_fused(
                        parts,
                        independent=independent,
                        max_block_size=max_block_size,
                    )
        except DecompressError as e:
            raise errors.DecompressionError(e) from e

        if not fi.legacy_frame:
            if fi.content_size is not None and len(out) != fi.content_size:
                raise errors.ContentLengthError(fi.content_size, len(out))
            if fi.content_checksum:
                if pos + 4 > len(data):
                    raise errors.FrameError("truncated content checksum")
                (expected,) = struct.unpack_from("<I", data, pos)
                pos += 4
                if xxh32(out, 0) != expected:
                    raise errors.ContentChecksumError()
        chunks.append(out)
    return b"".join(chunks)
