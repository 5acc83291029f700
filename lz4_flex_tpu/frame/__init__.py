"""LZ4 frame format: streaming encoder/decoder, descriptor, error taxonomy."""

from . import errors
from .decoder import FrameDecoder
from .encoder import AutoFinishEncoder, FrameEncoder
from .errors import FrameError
from .header import BlockInfo, BlockInfoKind, BlockMode, BlockSize, FrameInfo

__all__ = [
    "AutoFinishEncoder",
    "BlockInfo",
    "BlockInfoKind",
    "BlockMode",
    "BlockSize",
    "FrameDecoder",
    "FrameEncoder",
    "FrameError",
    "FrameInfo",
    "errors",
]


def compress(data: bytes, frame_info: FrameInfo | None = None) -> bytes:
    """One-shot frame compression convenience."""
    import io

    buf = io.BytesIO()
    enc = FrameEncoder(buf, frame_info)
    enc.write(data)
    enc.finish()
    return buf.getvalue()


def decompress(data: bytes) -> bytes:
    """One-shot decompression of all concatenated frames in ``data``."""
    import io

    return FrameDecoder(io.BytesIO(data)).read_all()
