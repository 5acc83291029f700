"""TPU device kernels for the LZ4 codec.

This package is the compute path of the framework: vectorized, jit-compiled
array programs that re-express the reference's sequential pointer loops
(lz4_flex src/block/compress.rs:318-489, src/block/decompress.rs:201-444) as
data-parallel XLA programs — hash/candidate generation for all positions at
once, match resolution by pointer doubling, output layout by prefix sums and
scatters.

Modules:
  packing   — byte/word packing primitives and vectorized LSIC helpers
  sequences — the fixed-width sequence-table interchange format
  decode    — device block decode (sequence expansion by parallel offset
              resolution), hybrid host-parse and full device-parse paths
  parse     — speculative on-device token parse + list ranking
  encode    — device block encode (sort-based match finder, binary-lifting
              LCP, greedy chain by pointer doubling, prefix-sum emission)
"""

from . import packing, sequences
from .decode import decode_block_device
from .encode import compress_block_device, compress_block_hybrid
from .parse import parse_sequences_device

__all__ = [
    "packing",
    "sequences",
    "decode_block_device",
    "compress_block_device",
    "compress_block_hybrid",
    "parse_sequences_device",
]
