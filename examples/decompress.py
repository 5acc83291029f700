"""stdin -> stdout LZ4 frame decompression (reference examples/decompress.rs parity).

Usage: python examples/decompress.py < input.lz4 > output
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lz4_flex_tpu.frame import FrameDecoder

dec = FrameDecoder(sys.stdin.buffer)
sys.stdout.buffer.write(dec.read_all())
