"""Device pipeline demo: compress a file into an LZ4 frame with the
mesh-parallel device encoder, decode it back with one fused device
expansion, and verify against the host streaming engine.

Usage: python examples/device_pipeline.py [file]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lz4_flex_tpu import frame
from lz4_flex_tpu.frame import BlockMode, BlockSize, FrameInfo
from lz4_flex_tpu.models import CodecConfig, LZ4Codec

path = sys.argv[1] if len(sys.argv) > 1 else None
data = (
    pathlib.Path(path).read_bytes()
    if path
    else b"The quick brown fox jumps over the lazy dog. " * 2000
)

codec = LZ4Codec(
    CodecConfig(
        block_size=BlockSize.Max64KB,
        block_mode=BlockMode.Linked,
        content_checksum=True,
    )
)
compressed = codec.compress(data)
restored = codec.decompress(compressed)
assert restored == data
assert frame.decompress(compressed) == data  # host engine cross-check
print(
    f"{len(data)} -> {len(compressed)} bytes "
    f"(ratio {len(compressed) / max(len(data), 1):.4f}), roundtrip OK"
)
