"""stdin -> stdout LZ4 frame compression (reference examples/compress.rs parity).

Usage: python examples/compress.py < input > output.lz4
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lz4_flex_tpu.frame import FrameEncoder

enc = FrameEncoder(sys.stdout.buffer)
while chunk := sys.stdin.buffer.read(1 << 20):
    enc.write(chunk)
enc.finish()
