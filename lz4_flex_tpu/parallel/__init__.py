"""Multi-chip scale-out for the codec.

The reference is single-threaded (SURVEY.md §2.3); the units of parallelism
its formats expose become first-class mesh programs here:

  - independent frame blocks shard data-parallel over a device mesh
    ("blocks" axis) — encode and decode;
  - linked-block encode is also data-parallel: each block's 64 KiB dictionary
    is the *input's* previous tail, known upfront, so the window carry-over
    chain (src/frame/compress.rs:327-356) only constrains decode;
  - linked-block decode is resolved globally instead of pipelined: the
    per-block sequence tables merge into one frame-wide table and a single
    fused expansion handles every cross-block window reference as a plain
    global output position (ops.decode.decode_parts_fused).

Communication rides jax.sharding + shard_map collectives; there is no
custom transport. Multi-host: ``distributed_init`` bootstraps the process
group (jax.distributed), and the pipelines' payload/length gathers go
through ``pipeline.fetch_global`` — an on-device all-gather to a replicated
array with only addressable shards read back — so frame assembly survives a
real N-process mesh (no host ever touches a non-addressable shard).
"""

from .mesh import codec_mesh, distributed_init, local_codec_mesh
from .pipeline import (
    decode_blocks_sharded,
    encode_blocks_sharded,
    fetch_global,
    roundtrip_step_sharded,
    stage_blocks,
)

__all__ = [
    "codec_mesh",
    "distributed_init",
    "fetch_global",
    "local_codec_mesh",
    "encode_blocks_sharded",
    "decode_blocks_sharded",
    "roundtrip_step_sharded",
    "stage_blocks",
]
