#!/usr/bin/env python3
"""Stage-level TPU profile of the expand2 pipeline on the bench corpus."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

import bench
from lz4_flex_tpu import block
from lz4_flex_tpu.ops import packing
from lz4_flex_tpu.ops.decode import _expand_kernel
from lz4_flex_tpu.ops.expand2 import (
    build_source_map,
    materialize_cells,
    resolve_cells,
)
from lz4_flex_tpu.ops.sequences import parse_sequences_host

from functools import partial


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}/{dev.device_kind}", flush=True)
    data = bench.build_corpus()
    n = len(data)
    comp = block.compress(data)
    comp_np = np.frombuffer(comp, np.uint8)
    comp_pad = packing.size_bucket(comp_np.shape[0])
    out_pad = packing.size_bucket(n)
    seq = parse_sequences_host(comp_np)
    nsp = packing.size_bucket(max(seq.nseq, 4), minimum=256)
    comp_words = jnp.asarray(packing.pad_to(comp_np, comp_pad).view("<u4"))
    oo = jnp.asarray(packing.pad_to(seq.out_off, nsp, fill=out_pad))
    ls = jnp.asarray(packing.pad_to(seq.lit_start, nsp))
    ll = jnp.asarray(packing.pad_to(seq.lit_len, nsp))
    mo = jnp.asarray(packing.pad_to(seq.match_off, nsp, fill=1))
    dw = jnp.zeros(1, jnp.uint32)
    print(f"n={n} comp={comp_np.shape[0]} nseq={seq.nseq}", flush=True)

    # stage 1: build
    f_build = jax.jit(
        partial(build_source_map, out_pad=out_pad, comp_pad=comp_pad, dict_bytes=0)
    )
    s = f_build(oo, ls, ll, mo, jnp.int32(0), jnp.int32(n))
    t = bench.device_time(
        lambda: f_build(oo, ls, ll, mo, jnp.int32(0), jnp.int32(n)),
        sync=lambda r: r[:1],
    )
    print(f"build_source_map : {t*1e3:8.2f} ms", flush=True)

    # stage 2: resolve
    f_res = jax.jit(partial(resolve_cells, out_pad=out_pad))
    sr = f_res(s)
    t = bench.device_time(lambda: f_res(s), sync=lambda r: r[:1])
    print(f"resolve_cells    : {t*1e3:8.2f} ms", flush=True)
    assert not bool(np.asarray(sr[:: out_pad // 1024] >= 0).any())

    # stage 3: materialize
    guard_words = 4
    words_g = jnp.concatenate(
        [
            jnp.zeros(guard_words, jnp.uint32),
            comp_words,
            jnp.zeros(guard_words + 2, jnp.uint32),
        ]
    )
    f_mat = jax.jit(
        partial(materialize_cells, out_pad=out_pad, guard_words=guard_words)
    )
    outb = f_mat(sr, words_g)
    t = bench.device_time(lambda: f_mat(sr, words_g), sync=lambda r: r[:1])
    print(f"materialize_cells: {t*1e3:8.2f} ms", flush=True)
    ok = bytes(np.asarray(outb[:n]).tobytes()) == data
    print(f"v2 roundtrip ok={ok}", flush=True)

    # whole v2 + v1 comparison
    from lz4_flex_tpu.ops.decode import _expand2_kernel

    args = (comp_words, dw, oo, ls, ll, mo, jnp.int32(0), jnp.int32(n))
    f2 = lambda: _expand2_kernel(*args, out_pad=out_pad, has_dict=False)
    r2 = f2()
    t2 = bench.device_time(f2, sync=lambda r: r[:1])
    print(f"expand2 total    : {t2*1e3:8.2f} ms -> {n/t2/2**20:.1f} MiB/s", flush=True)
    f1 = lambda: _expand_kernel(*args, out_pad=out_pad, has_dict=False)
    r1 = f1()
    t1 = bench.device_time(f1, sync=lambda r: r[:1])
    print(f"expand1 total    : {t1*1e3:8.2f} ms -> {n/t1/2**20:.1f} MiB/s", flush=True)
    ok2 = bytes(np.asarray(r2[:n]).tobytes()) == data
    print(f"expand2 kernel ok={ok2}", flush=True)


if __name__ == "__main__":
    main()
