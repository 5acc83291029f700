"""One-shot block compression (reference examples/compress_block.rs parity).

Usage: python examples/compress_block.py < input > output.lz4b
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lz4_flex_tpu import compress_prepend_size

sys.stdout.buffer.write(compress_prepend_size(sys.stdin.buffer.read()))
