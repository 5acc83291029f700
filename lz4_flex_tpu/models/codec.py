"""The flagship model: a configured LZ4 codec pipeline.

Bundles the device kernels (ops/), the mesh pipelines (parallel/) and the
frame wire format (frame/) behind one object, the way a model class bundles
layers: configuration (block size/mode, checksums — the reference's
FrameInfo builder, src/frame/header.rs:130-192) plus jit-compiled array
steps (encode_step / decode_step) and byte-level conveniences
(compress / decompress)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..frame.header import BlockMode, BlockSize, FrameInfo
from ..ops import packing
from ..spec.constants import get_maximum_output_size


@dataclass
class CodecConfig:
    """Runtime configuration (FrameInfo analog for the device pipeline)."""

    block_size: BlockSize = BlockSize.Max64KB
    block_mode: BlockMode = BlockMode.Independent
    block_checksums: bool = False
    content_checksum: bool = False
    verify: bool = True  # roundtrip-verify device encodes (collision guard)

    def frame_info(self) -> FrameInfo:
        return FrameInfo(
            block_size=self.block_size,
            block_mode=self.block_mode,
            block_checksums=self.block_checksums,
            content_checksum=self.content_checksum,
        )


class LZ4Codec:
    """End-to-end device codec over an optional mesh.

    compress/decompress speak the LZ4 frame wire format; encode_step and
    decode_step are the jittable array programs underneath (batched blocks
    in, batched payloads out) for embedding into larger device pipelines.
    """

    def __init__(self, config: CodecConfig | None = None, mesh=None) -> None:
        self.config = config or CodecConfig()
        self.mesh = mesh

    # -- byte-level frame API ------------------------------------------------

    def compress(self, data) -> bytes:
        from ..frame.device import compress_frame_device

        return compress_frame_device(
            data, self.config.frame_info(), mesh=self.mesh, verify=self.config.verify
        )

    def decompress(self, data) -> bytes:
        from ..frame.device import decompress_frame_device

        return decompress_frame_device(data, mesh=self.mesh)

    def compress_block(self, data, ext_dict=b"") -> bytes:
        from ..ops.encode import compress_block_device

        return compress_block_device(data, ext_dict, verify=self.config.verify)

    def decompress_block(self, data, max_output_size: int, ext_dict=b"") -> bytes:
        from ..ops.decode import decode_block_device

        return decode_block_device(data, max_output_size, ext_dict)

    # -- jittable array steps ------------------------------------------------

    def encode_step(self, block_bytes: jnp.ndarray, dict_lens, total_lens):
        """Batched block encode: (B, S) uint8 rows (dict ++ data, padded) ->
        ((B, C) uint8 payloads, (B,) lengths). Jittable; vmap/shard_map ready."""
        from ..parallel.pipeline import _encode_batch

        width = block_bytes.shape[1]
        levels = min(12, max(2, (width - 1).bit_length()))
        comp_pad = packing.size_bucket(get_maximum_output_size(width))
        nseq_pad = packing.size_bucket(max(8, width // 4 + 2), minimum=256)
        words = jax.vmap(packing.bytes_to_words)(block_bytes)
        return _encode_batch(
            block_bytes,
            words,
            dict_lens,
            total_lens,
            levels=levels,
            comp_pad=comp_pad,
            nseq_pad=nseq_pad,
        )

    def decode_step(self, comp_bytes: jnp.ndarray, comp_lens):
        """Batched independent-block decode: (B, C) uint8 payload rows ->
        ((B, S) uint8 outputs, (B,) lengths, (B, 5) error flags).

        Contract: C must exceed every comp_len by at least one zero byte
        (truncation detection for blocks ending mid-LSIC run)."""
        from ..parallel.pipeline import _decode_batch

        width = comp_bytes.shape[1]
        out_pad = packing.size_bucket(self.config.block_size.get_size())
        nseq_pad = packing.size_bucket(max(8, width // 3 + 2), minimum=256)
        return _decode_batch(comp_bytes, comp_lens, out_pad=out_pad, nseq_pad=nseq_pad)
