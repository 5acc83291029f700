"""Streaming LZ4 frame encoder.

Capability parity with lz4_flex's FrameEncoder (src/frame/compress.rs:62-404):
buffered writes, auto block-size detection from the first write, independent
and linked block modes with 64 KiB window carry-over, the incompressible-block
fallback to stored blocks, optional block/content checksums, promised
content-size validation, multi-frame reuse of one encoder, and a
finish-on-drop wrapper. As an extension over the reference, the legacy frame
format can be *written* as well as read.

Two block engines serve the same io.Write surface: ``engine="host"``
(default) drives the native runtime block-by-block, the hash table carried
across blocks with 64-bit logical stream positions (which removes the
reference's u32 `reposition` wrap handling by construction);
``engine="device"`` batches buffered blocks — one block per mesh device —
through the sharded TPU encode pipeline (parallel.pipeline), so streaming
compression runs on the device without slurping the input.
"""

from __future__ import annotations

import struct

import numpy as np

from ..spec.constants import LZ4F_LEGACY_MAGIC_NUMBER, WINDOW_SIZE
from ..utils.checksum import XxHash32, xxh32
from . import errors
from .header import BlockInfo, BlockInfoKind, BlockMode, BlockSize, FrameInfo

try:
    from .. import native as _native

    _HAVE_NATIVE = _native.available()
except Exception:  # pragma: no cover
    _native = None
    _HAVE_NATIVE = False

if not _HAVE_NATIVE:  # pragma: no cover
    from ..spec import golden as _golden


class FrameEncoder:
    """A writer compressing bytes into an LZ4 frame on an underlying stream.

    Must be finalized with :meth:`finish` / :meth:`try_finish`, or used as a
    context manager (which finishes on exit).
    """

    def __init__(
        self,
        w,
        frame_info: FrameInfo | None = None,
        *,
        engine: str = "host",
        mesh=None,
    ) -> None:
        if engine not in ("host", "device"):
            raise ValueError(f"unknown engine {engine!r}")
        self._w = w
        self._frame_info = frame_info if frame_info is not None else FrameInfo()
        self._is_frame_open = False
        self._data_to_frame_written = False
        self._content_len = 0
        self._content_hasher = XxHash32(0)
        self._pending = bytearray()
        self._window = b""
        self._table = _native.new_table() if _HAVE_NATIVE else None
        self._finished = False
        self._engine = engine
        self._mesh = mesh
        self._device_batch: int | None = None  # blocks per device dispatch

    # -- accessors ----------------------------------------------------------

    @property
    def frame_info(self) -> FrameInfo:
        return self._frame_info

    def get_ref(self):
        return self._w

    def get_mut(self):
        return self._w

    def into_inner(self):
        """Return the underlying writer without flushing (may leave the
        output unfinished)."""
        return self._w

    # -- context manager / auto-finish --------------------------------------

    def __enter__(self) -> "FrameEncoder":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.try_finish()

    def auto_finish(self) -> "AutoFinishEncoder":
        return AutoFinishEncoder(self)

    # -- frame lifecycle -----------------------------------------------------

    def _begin_frame(self, buf_len: int) -> None:
        self._is_frame_open = True
        if self._frame_info.block_size == BlockSize.Auto:
            self._frame_info.block_size = BlockSize.from_buf_length(buf_len)
        if self._frame_info.legacy_frame:
            # Legacy frames are always independent 8 MiB blocks.
            self._frame_info.block_size = BlockSize.Max8MB
            self._frame_info.block_mode = BlockMode.Independent
            self._w.write(struct.pack("<I", LZ4F_LEGACY_MAGIC_NUMBER))
        else:
            self._w.write(self._frame_info.write())
        if self._content_len != 0:
            # Second or later frame on this encoder: reset compressor state.
            self._content_len = 0
            self._content_hasher = XxHash32(0)
            self._window = b""
            if self._table is not None:
                self._table[:] = 0

    def _end_frame(self) -> None:
        assert self._is_frame_open
        self._is_frame_open = False
        if self._frame_info.legacy_frame:
            return  # legacy frames have no end mark or checksums
        if (
            self._frame_info.content_size is not None
            and self._frame_info.content_size != self._content_len
        ):
            raise errors.ContentLengthError(
                self._frame_info.content_size, self._content_len
            )
        self._w.write(BlockInfo(BlockInfoKind.EndMark).write())
        if self._frame_info.content_checksum:
            self._w.write(struct.pack("<I", self._content_hasher.digest()))

    def _compress_pending_block(self, block: bytes) -> bytes:
        """Compress one block with the carried window/table state."""
        window = self._window
        if _HAVE_NATIVE:
            arr = np.empty(len(window) + len(block), np.uint8)
            if window:
                arr[: len(window)] = np.frombuffer(window, np.uint8)
            arr[len(window) :] = np.frombuffer(block, np.uint8)
            comp = _native.compress_block(
                arr,
                input_pos=len(window),
                input_stream_offset=self._content_len - len(block) - len(window),
                table=self._table,
                use_hash5=True,
            )
        else:  # pragma: no cover - golden fallback
            comp = _golden.compress_block(
                window + block,
                input_pos=len(window),
                input_stream_offset=self._content_len - len(block) - len(window),
                use_hash5=True,
            )
        return comp

    def _write_block(self) -> None:
        assert self._is_frame_open
        max_block_size = self._frame_info.block_size.get_size()
        block = bytes(self._pending[:max_block_size])
        del self._pending[: len(block)]
        self._content_len += len(block)

        if self._frame_info.legacy_frame:
            comp = self._compress_pending_block(block)
            self._w.write(struct.pack("<I", len(comp)))
            self._w.write(comp)
            return

        comp = self._compress_pending_block(block)
        if len(comp) < len(block):
            info, payload = BlockInfo(BlockInfoKind.Compressed, len(comp)), comp
        else:
            # Compression didn't shrink the data: store it raw.
            info, payload = BlockInfo(BlockInfoKind.Uncompressed, len(block)), block
        self._w.write(info.write())
        self._w.write(payload)
        if self._frame_info.block_checksums:
            self._w.write(struct.pack("<I", xxh32(payload, 0)))
        if self._frame_info.content_checksum:
            self._content_hasher.write(block)
        if self._frame_info.block_mode == BlockMode.Linked:
            self._window = (self._window + block)[-WINDOW_SIZE:]

    # -- device engine ---------------------------------------------------------

    def _device_batch_blocks(self) -> int:
        """Blocks per device dispatch: one mesh row per device, so every
        dispatch (including the final partial batch) pads to the same
        (ndev, width) kernel shape and compiles once."""
        if self._device_batch is None:
            if self._mesh is not None:
                self._device_batch = int(self._mesh.devices.size)
            else:
                from ..parallel.mesh import codec_mesh

                self._mesh = codec_mesh()
                self._device_batch = int(self._mesh.devices.size)
        return self._device_batch

    def _write_device_blocks(self, *, all_pending: bool) -> None:
        """Compress buffered full blocks (all buffered bytes when
        ``all_pending``) through the sharded device pipeline and write them
        in frame order — the TPU path serving the streaming io.Write surface
        (reference capability: src/frame/compress.rs:374-404)."""
        from ..parallel.pipeline import encode_blocks_sharded

        fi = self._frame_info
        bs = fi.block_size.get_size()
        if all_pending:
            take = len(self._pending)
        else:
            # Exactly one ndev-block batch per dispatch: constant kernel shape.
            take = min(len(self._pending) // bs, self._device_batch_blocks()) * bs
        if take == 0:
            return
        chunk = bytes(self._pending[:take])
        del self._pending[:take]
        linked = fi.block_mode == BlockMode.Linked and not fi.legacy_frame
        payloads, lens = encode_blocks_sharded(
            chunk, bs, linked=linked, mesh=self._mesh, carry=self._window
        )
        pos = 0
        for comp, blen in zip(payloads, lens):
            raw = chunk[pos : pos + blen]
            pos += blen
            self._content_len += blen
            if fi.legacy_frame:
                self._w.write(struct.pack("<I", len(comp)))
                self._w.write(comp)
            else:
                if len(comp) < blen:
                    info, payload = BlockInfo(BlockInfoKind.Compressed, len(comp)), comp
                else:
                    info, payload = BlockInfo(BlockInfoKind.Uncompressed, blen), raw
                self._w.write(info.write())
                self._w.write(payload)
                if fi.block_checksums:
                    self._w.write(struct.pack("<I", xxh32(payload, 0)))
                if fi.content_checksum:
                    self._content_hasher.write(raw)
            if linked:
                self._window = (
                    (self._window + raw) if blen < WINDOW_SIZE else raw
                )[-WINDOW_SIZE:]

    # -- io.Write surface -----------------------------------------------------

    def write(self, buf) -> int:
        buf = bytes(buf)
        if not self._is_frame_open and buf:
            self._begin_frame(len(buf))
        self._pending += buf
        max_block_size = self._frame_info.block_size.get_size()
        if self._engine == "device":
            batch = self._device_batch_blocks() * max_block_size
            while len(self._pending) >= batch:
                self._write_device_blocks(all_pending=False)
            return len(buf)
        while len(self._pending) >= max_block_size:
            self._write_block()
        return len(buf)

    def flush(self) -> None:
        """Force-compress any buffered bytes into a (possibly short) block."""
        if self._pending:
            if self._engine == "device":
                batch = (
                    self._device_batch_blocks()
                    * self._frame_info.block_size.get_size()
                )
                while len(self._pending) >= batch:
                    self._write_device_blocks(all_pending=False)
                self._write_device_blocks(all_pending=True)
            else:
                self._write_block()
        if hasattr(self._w, "flush"):
            self._w.flush()

    def try_finish(self) -> None:
        """Flush buffered data and write the stream terminator (idempotent)."""
        self.flush()
        if not self._is_frame_open:
            if self._data_to_frame_written:
                return  # already finished
            # Empty input still produces a valid (empty) frame.
            self._begin_frame(0)
        self._end_frame()
        self._data_to_frame_written = True

    def finish(self):
        """Finalize the stream and return the underlying writer."""
        self.try_finish()
        return self._w


class AutoFinishEncoder:
    """Wrapper around :class:`FrameEncoder` that finishes the stream when
    closed or garbage-collected; errors during implicit finish are ignored."""

    def __init__(self, encoder: FrameEncoder) -> None:
        self._encoder = encoder

    def write(self, buf) -> int:
        return self._encoder.write(buf)

    def flush(self) -> None:
        self._encoder.flush()

    def close(self) -> None:
        enc, self._encoder = self._encoder, None
        if enc is not None:
            try:
                enc.try_finish()
            except Exception:
                pass

    def __enter__(self) -> "AutoFinishEncoder":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.close()

    def __del__(self) -> None:
        self.close()
