"""lz4_flex_tpu — a TPU-native LZ4 codec framework.

Full capability surface of the LZ4 block and frame formats (see SURVEY.md for
the reference inventory): one-shot and streaming APIs, external dictionaries,
linked blocks, checksums, legacy/skippable frames and a CLI — with JAX/XLA
device kernels for bulk encode/decode and a native C++ host runtime for
streaming IO.

Block-format convenience functions are re-exported at the top level for parity
with the reference crate root (lz4_flex src/lib.rs:96-105).
"""

from . import block, frame
from .block import (
    compress,
    compress_into,
    compress_prepend_size,
    compress_prepend_size_with_dict,
    compress_with_dict,
    decompress,
    decompress_into,
    decompress_size_prepended,
    decompress_size_prepended_with_dict,
    decompress_with_dict,
    get_maximum_output_size,
)

__version__ = "0.1.0"

__all__ = [
    "block",
    "frame",
    "compress",
    "compress_into",
    "compress_prepend_size",
    "compress_prepend_size_with_dict",
    "compress_with_dict",
    "decompress",
    "decompress_into",
    "decompress_size_prepended",
    "decompress_size_prepended_with_dict",
    "decompress_with_dict",
    "get_maximum_output_size",
    "__version__",
]
