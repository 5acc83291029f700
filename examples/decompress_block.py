"""One-shot block decompression (reference examples/decompress_block.rs parity).

Usage: python examples/decompress_block.py < input.lz4b > output
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lz4_flex_tpu import decompress_size_prepended

sys.stdout.buffer.write(decompress_size_prepended(sys.stdin.buffer.read()))
