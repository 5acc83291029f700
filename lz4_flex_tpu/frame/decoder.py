"""Streaming LZ4 frame decoder.

Capability parity with lz4_flex's FrameDecoder (src/frame/decompress.rs:48-422):
incremental header parsing (standard, legacy-short-header and skippable
frames), stored and compressed blocks, linked-block 64 KiB window carry-over,
block/content checksum verification, content-size validation, and the
reference's frame-boundary contract — ``read`` returns 0 at the end of each
frame and a subsequent ``read`` resumes with the next concatenated frame.

Extension over the reference: within a legacy frame, a magic-number word in
block position starts the next frame (matching the C lz4 CLI) instead of
erroring, and ``read_all()`` drains every concatenated frame at once.

Two block engines serve the same io.Read surface: ``engine="host"``
(default) decodes block-by-block on the native runtime; ``engine="device"``
greedily batches blocks and decodes each batch in one device dispatch (ring
kernel with fused-expansion fallback), carrying the linked-mode window as a
stored pseudo-block between batches.
"""

from __future__ import annotations

import io
import struct

from ..spec.constants import (
    LZ4F_LEGACY_MAGIC_NUMBER,
    LZ4F_MAGIC_NUMBER,
    LZ4F_SKIPPABLE_MAGIC_MAX,
    LZ4F_SKIPPABLE_MAGIC_MIN,
    MAGIC_NUMBER_SIZE,
    MIN_FRAME_INFO_SIZE,
    WINDOW_SIZE,
)
from ..block.errors import DecompressError
from ..utils.checksum import XxHash32, xxh32
from . import errors
from .header import BlockInfo, BlockInfoKind, BlockMode, FrameInfo

try:
    from .. import native as _native

    _HAVE_NATIVE = _native.available()
except Exception:  # pragma: no cover
    _native = None
    _HAVE_NATIVE = False

if not _HAVE_NATIVE:  # pragma: no cover
    from ..spec import golden as _golden


def _is_any_magic(word: int) -> bool:
    return (
        word == LZ4F_MAGIC_NUMBER
        or word == LZ4F_LEGACY_MAGIC_NUMBER
        or LZ4F_SKIPPABLE_MAGIC_MIN <= word <= LZ4F_SKIPPABLE_MAGIC_MAX
    )


class FrameDecoder(io.RawIOBase):
    """A reader decompressing an LZ4 frame from an underlying stream."""

    #: device engine: max blocks batched per dispatch, the payload-bytes
    #: budget that bounds read-ahead memory (8 MiB ≈ one legacy block), and
    #: the projected-decoded-bytes budget that bounds the dispatch's output
    #: plus plan scratch (without it, 32 highly-compressible legacy blocks
    #: could decode to ~256 MiB in one batch).
    DEVICE_BATCH_BLOCKS = 32
    DEVICE_BATCH_BYTES = 8 * 1024 * 1024
    DEVICE_BATCH_DECODED_BYTES = 32 * 1024 * 1024
    #: tests set this to run the pipelined ring path in Pallas interpret
    #: mode on CPU (off-TPU the engine otherwise takes the sync fallback)
    RING_INTERPRET = False

    def __init__(self, r, *, engine: str = "host", mesh=None) -> None:
        super().__init__()
        if engine not in ("host", "device"):
            raise ValueError(f"unknown engine {engine!r}")
        self._r = r
        self._pushback = b""  # bytes read ahead of the current position
        self._frame_info: FrameInfo | None = None
        self._content_hasher = XxHash32(0)
        self._content_len = 0
        self._window = b""
        self._out = b""
        self._out_pos = 0
        self._engine = engine
        self._mesh = mesh
        # device-engine pipeline: one dispatched-but-unfetched batch
        # (device uint8 array, total_out) — batch i's kernel runs while
        # batch i+1's wire bytes are read and its plan is built
        self._pending = None
        self._parts_stash = None  # sync-path batch deferred by a flush

    # -- accessors ------------------------------------------------------------

    def get_ref(self):
        return self._r

    def get_mut(self):
        return self._r

    def into_inner(self):
        return self._r

    @property
    def frame_info(self) -> FrameInfo | None:
        """FrameInfo of the frame currently being decoded (None between frames)."""
        return self._frame_info

    def readable(self) -> bool:
        return True

    # -- low-level input ------------------------------------------------------

    def _read_upto(self, n: int) -> bytes:
        if self._pushback:
            take, self._pushback = self._pushback[:n], self._pushback[n:]
            if len(take) == n:
                return take
            rest = self._r.read(n - len(take)) or b""
            return take + rest
        return self._r.read(n) or b""

    def _read_exact(self, n: int) -> bytes:
        chunks = []
        got = 0
        while got < n:
            b = self._read_upto(n - got)
            if not b:
                raise errors.FrameError(
                    f"unexpected end of stream: needed {n} bytes, got {got}"
                )
            chunks.append(b)
            got += len(b)
        return b"".join(chunks)

    # -- frame parsing ----------------------------------------------------------

    def _read_frame_info(self) -> bool:
        """Parse the next frame header. Returns False on clean EOF."""
        head = self._read_upto(MAGIC_NUMBER_SIZE)
        if not head:
            return False
        if len(head) < MAGIC_NUMBER_SIZE:
            head += self._read_exact(MAGIC_NUMBER_SIZE - len(head))
        (magic,) = struct.unpack("<I", head)
        if magic != LZ4F_LEGACY_MAGIC_NUMBER:
            head += self._read_exact(MIN_FRAME_INFO_SIZE - MAGIC_NUMBER_SIZE)
        required = FrameInfo.read_size(head)
        if required > len(head):
            head += self._read_exact(required - len(head))
        frame_info = FrameInfo.read(head)  # raises SkippableFrame for skippables
        if frame_info.dict_id is not None:
            raise errors.DictionaryNotSupported()
        self._frame_info = frame_info
        self._content_hasher = XxHash32(0)
        self._content_len = 0
        self._window = b""
        self._out = b""
        self._out_pos = 0
        return True

    def _check_block_checksum(self, data: bytes) -> None:
        (expected,) = struct.unpack("<I", self._read_exact(4))
        if xxh32(data, 0) != expected:
            raise errors.BlockChecksumError()

    def _decompress_block(self, comp: bytes, max_block_size: int) -> bytes:
        window = self._window
        try:
            if _HAVE_NATIVE:
                return _native.decompress_block(comp, max_block_size, ext_dict=window)
            return _golden.decompress_block(comp, max_block_size, ext_dict=window)
        except DecompressError as e:
            raise errors.DecompressionError(e) from e

    def _end_of_frame(self) -> None:
        fi = self._frame_info
        if fi.content_size is not None and self._content_len != fi.content_size:
            raise errors.ContentLengthError(fi.content_size, self._content_len)
        if fi.content_checksum:
            (expected,) = struct.unpack("<I", self._read_exact(4))
            if self._content_hasher.digest() != expected:
                raise errors.ContentChecksumError()
        self._frame_info = None

    # -- device engine ---------------------------------------------------------

    def _flush_pending(self) -> int:
        """Fetch and emit the dispatched-but-unfetched batch, if any."""
        if self._pending is None:
            return 0
        import numpy as np

        dev, total = self._pending
        self._pending = None
        # NOTE: self._parts_stash must NOT be cleared here — the
        # ring-plan-unavailable path stashes the just-collected parts and then
        # flushes the in-flight batch; the stash is consumed at the top of
        # _read_blocks_device on the next call. Clearing it silently dropped
        # a batch whose wire bytes were already consumed.
        out = np.asarray(dev).reshape(-1)[:total].tobytes()
        self._append_output(out)
        return len(out)

    def _dispatch_parts_device(self, parts, max_block_size: int):
        """Dispatch an INDEPENDENT-mode batch on the ring engine without
        fetching (returns (device array, total) or None to take the
        synchronous path). The caller overlaps the next batch's wire read +
        plan build with this batch's kernel execution — the pipelined
        steady state the bench measures is the shape production runs."""
        from ..ops.ringdecode import dispatch_parts_ring

        try:
            r = dispatch_parts_ring(
                parts, independent=True, max_block_size=max_block_size,
                interpret=self.RING_INTERPRET,
            )
        except DecompressError as e:
            raise errors.DecompressionError(e) from e
        if r is not None and isinstance(r[0], bytes):
            return None  # empty batch: no dispatch to pipeline
        return r

    def _decode_parts_device(self, parts, max_block_size: int) -> bytes:
        """Decode a batch of frame blocks on the device. Linked-mode batches
        prepend the carried 64 KiB window as a stored pseudo-block, so window
        back-references are plain positions in the fused global expansion
        (ops.decode.decode_parts_fused) and the result is sliced off."""
        from ..ops.decode import decode_parts_fused
        from ..ops.ringdecode import decode_parts_ring

        fi = self._frame_info
        independent = fi.legacy_frame or fi.block_mode == BlockMode.Independent
        window = b"" if independent else self._window
        full = list(parts)
        if window:
            full.insert(0, (window, False))
        cap = max(max_block_size, len(window))
        try:
            out = decode_parts_ring(
                full, independent=independent, max_block_size=cap
            )
            if out is None:
                out = decode_parts_fused(
                    full, independent=independent, max_block_size=cap
                )
        except DecompressError as e:
            raise errors.DecompressionError(e) from e
        return out[len(window) :]

    def _read_blocks_device(self) -> int:
        """Device-engine block read: greedily collect a batch of blocks (up
        to DEVICE_BATCH_BLOCKS / DEVICE_BATCH_BYTES, stopping early at the
        frame end), decode them in one device dispatch, and emit the batch as
        the current output span. Wire-format handling (BlockInfo words,
        checksums, end marks, legacy magic boundaries) is identical to the
        host path; only the block decompression is batched."""
        fi = self._frame_info
        max_block_size = fi.block_size.get_size()
        if self._parts_stash is not None:
            parts, mbs = self._parts_stash
            self._parts_stash = None
            out = self._decode_parts_device(parts, mbs)
            self._append_output(out)
            return len(out)
        parts: list[tuple[bytes, bool]] = []
        total = 0
        projected = 0  # decoded-bytes upper bound (stored: exact; else max)

        while (
            len(parts) < self.DEVICE_BATCH_BLOCKS
            and total <= self.DEVICE_BATCH_BYTES
            and projected < self.DEVICE_BATCH_DECODED_BYTES
        ):
            word_bytes = self._read_upto(4)
            if len(word_bytes) == 0:
                if parts:
                    break  # decode what we have; EOF surfaces next call
                if self._pending is not None:
                    return self._flush_pending()
                self._frame_info = None
                return 0
            if len(word_bytes) < 4:
                word_bytes += self._read_exact(4 - len(word_bytes))

            if fi.legacy_frame:
                (word,) = struct.unpack("<I", word_bytes)
                if _is_any_magic(word):
                    self._pushback = word_bytes + self._pushback
                    if parts:
                        break
                    if self._pending is not None:
                        return self._flush_pending()
                    self._frame_info = None
                    return 0
                if word > 16 + 4 + (8 * 1024 * 1024 * 110) // 100:
                    raise errors.BlockTooBig()
                comp = self._read_exact(word)
                parts.append((comp, True))
                total += word
                projected += 8 * 1024 * 1024  # legacy max block size
                continue

            info = BlockInfo.read(word_bytes)
            if info.kind is BlockInfoKind.EndMark:
                if parts:
                    # Decode the batch first; re-see the end mark next call.
                    self._pushback = word_bytes + self._pushback
                    break
                if self._pending is not None:
                    # emit the in-flight batch; re-see the end mark next call
                    self._pushback = word_bytes + self._pushback
                    return self._flush_pending()
                self._end_of_frame()
                return 0
            if info.size > max_block_size:
                raise errors.BlockTooBig()
            payload = self._read_exact(info.size)
            if fi.block_checksums:
                self._check_block_checksum(payload)
            parts.append((payload, info.kind is BlockInfoKind.Compressed))
            total += info.size
            projected += (
                max_block_size
                if info.kind is BlockInfoKind.Compressed
                else info.size
            )

        # Pipelined path (independent/legacy frames, ring engine): dispatch
        # this batch asynchronously, emit the PREVIOUS batch while the
        # device works — the host reads wire bytes and builds the next plan
        # under the kernel's execution.
        independent = fi.legacy_frame or fi.block_mode == BlockMode.Independent
        if independent:
            disp = self._dispatch_parts_device(parts, max_block_size)
            if disp is not None:
                prev_emitted = self._flush_pending()
                self._pending = disp
                if prev_emitted:
                    return prev_emitted
                # first batch of the pipeline: prime by reading the next one
                return self._read_blocks_device()
        if self._pending is not None:
            # ring plan unavailable mid-pipeline: emit the in-flight batch
            # now, decode the just-collected parts synchronously next call
            self._parts_stash = (parts, max_block_size)
            return self._flush_pending()
        out = self._decode_parts_device(parts, max_block_size)
        self._append_output(out)
        return len(out)

    def _read_block(self) -> int:
        """Decode the next block into the output buffer. Returns its size
        (0 = end of frame or stream)."""
        if self._engine == "device":
            return self._read_blocks_device()
        fi = self._frame_info
        max_block_size = fi.block_size.get_size()

        word_bytes = self._read_upto(4)
        if len(word_bytes) == 0:
            # EOF at a block boundary ends the stream cleanly.
            self._frame_info = None
            return 0
        if len(word_bytes) < 4:
            word_bytes += self._read_exact(4 - len(word_bytes))

        if fi.legacy_frame:
            (word,) = struct.unpack("<I", word_bytes)
            if _is_any_magic(word):
                # Next frame follows immediately (no end mark in legacy frames).
                self._pushback = word_bytes + self._pushback
                self._frame_info = None
                return 0
            if word > 16 + 4 + (8 * 1024 * 1024 * 110) // 100:
                raise errors.BlockTooBig()
            comp = self._read_exact(word)
            out = self._decompress_block(comp, max_block_size)
            self._append_output(out)
            return len(out)

        info = BlockInfo.read(word_bytes)
        if info.kind is BlockInfoKind.EndMark:
            self._end_of_frame()
            return 0
        if info.size > max_block_size:
            raise errors.BlockTooBig()
        payload = self._read_exact(info.size)
        if fi.block_checksums:
            self._check_block_checksum(payload)
        if info.kind is BlockInfoKind.Uncompressed:
            out = payload
        else:
            out = self._decompress_block(payload, max_block_size)
        self._append_output(out)
        return len(out)

    def _append_output(self, out: bytes) -> None:
        fi = self._frame_info
        self._out = out
        self._out_pos = 0
        self._content_len += len(out)
        if fi.content_checksum:
            self._content_hasher.write(out)
        if fi.block_mode == BlockMode.Linked:
            self._window = (self._window + out)[-WINDOW_SIZE:]

    # -- io.RawIOBase surface ----------------------------------------------------

    def readinto(self, b) -> int:
        view = memoryview(b)
        if len(view) == 0:
            return 0
        while True:
            avail = len(self._out) - self._out_pos
            if avail > 0:
                n = min(avail, len(view))
                view[:n] = self._out[self._out_pos : self._out_pos + n]
                self._out_pos += n
                return n
            if self._frame_info is None:
                if not self._read_frame_info():
                    return 0
            if self._read_block() == 0:
                # Frame boundary: signal EOF; the next read resumes with the
                # next concatenated frame (reference contract).
                return 0

    def read_all(self) -> bytes:
        """Drain every concatenated frame from the stream (extension)."""
        chunks = []
        while True:
            got = self.readall()  # reads until a frame boundary
            if got:
                chunks.append(got)
                continue
            # A zero-length result is either a frame boundary or true EOF;
            # probe for another frame.
            if self._frame_info is None and not self._probe_next_frame():
                break
        return b"".join(chunks)

    def _probe_next_frame(self) -> bool:
        head = self._read_upto(1)
        if not head:
            return False
        self._pushback = head + self._pushback
        return True
