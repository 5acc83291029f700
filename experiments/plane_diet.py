"""Same-process TPU A/B of plane-kernel diets for the hybrid encoder.

Variants: score payload depth (w4+8 / w4 only / none = closest-only) and
select-loop width. Reports kernel ms/chunk and the end-to-end ratio each
variant's plane produces through the real chunk-parallel walk.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
import bench
from functools import partial
from lz4_flex_tpu import block
from lz4_flex_tpu.ops import encode as E
from lz4_flex_tpu.ops import packing

data = bench.build_corpus()
n = len(data)
G = np.frombuffer(data, np.uint8)


def best_plane_core_v(u8, pool, score_words, ncand):
    pad = u8.shape[0]
    pos = jnp.arange(pad, dtype=jnp.int32)
    u = u8.astype(jnp.uint32)
    sh = E._shift_read
    w4 = u | (sh(u, 1) << 8) | (sh(u, 2) << 16) | (sh(u, 3) << 24)
    arrs = [w4, pos.astype(jnp.uint32)]
    if score_words >= 1:
        arrs.append(sh(w4, 4))
    if score_words >= 2:
        arrs.append(sh(w4, 8))
    srt = jax.lax.sort(tuple(arrs), num_keys=2)
    sw, sp = srt[0], srt[1]
    s4 = srt[2] if score_words >= 1 else None
    s8 = srt[3] if score_words >= 2 else None
    spi = sp.astype(jnp.int32)
    best = jnp.zeros(pad, jnp.int32)
    for j in range(1, ncand + 1):
        same = jnp.concatenate([jnp.zeros(j, bool), sw[j:] == sw[:-j]])
        prev = jnp.concatenate([jnp.zeros(j, jnp.int32), spi[:-j]])
        delta = spi - prev
        ok = same & (delta <= 65535)
        score = jnp.int32(4)
        if score_words >= 1:
            c4 = jnp.concatenate([jnp.zeros(j, jnp.uint32), s4[:-j]])
            e1 = (c4 == s4).astype(jnp.int32)
            score = score + 4 * e1
            if score_words >= 2:
                c8 = jnp.concatenate([jnp.zeros(j, jnp.uint32), s8[:-j]])
                e2 = ((c8 == s8) & (c4 == s4)).astype(jnp.int32)
                score = score + 4 * e2
        packed = jnp.where(ok, (score << 16) | (65536 - delta), 0)
        best = jnp.maximum(best, packed)
    plane = jnp.zeros(pad, jnp.int32).at[spi].set(best)
    w = jnp.max(plane.reshape(pad // pool, pool), axis=1)
    return jnp.where(w > 0, 65536 - (w & 0xFFFF), 0).astype(jnp.uint16)


def quad_v(score_words, ncand):
    @partial(jax.jit, static_argnums=())
    def f(gpad, starts):
        rows = [
            best_plane_core_v(
                jax.lax.dynamic_slice(gpad, (starts[i],), (E._CHUNK_W,)),
                E._PLANE_POOL, score_words, ncand,
            )
            for i in range(starts.shape[0])
        ]
        return jnp.stack(rows)
    return f


bucket = packing.size_bucket(n + 8)
gpad = jnp.asarray(packing.pad_to(G, bucket))
R = E._PLANE_ROWS
starts4 = jnp.asarray(np.array([i * E._CHUNK_C for i in range(R)], np.int32))
nrows = -(-n // E._CHUNK_C)

def ratio_with(fn):
    # monkeypatch the quad builder, run the real streaming encode
    orig = E._best_plane_quad
    E._best_plane_quad = lambda gpad, starts, pool=None, stride=None: fn(gpad, starts)
    try:
        comp = E.compress_block_hybrid(data)
    finally:
        E._best_plane_quad = orig
    ok = block.decompress(comp, n) == data
    return len(comp) / n, ok

for (swd, nc) in [(2, 16), (1, 8), (0, 8), (1, 16), (2, 8), (1, 4)]:
    f = quad_v(swd, nc)
    f(gpad, starts4)  # compile
    t = bench.device_time(lambda: f(gpad, starts4), sync=lambda r: r[:1, :1], iters=6)
    per_chunk = t / R
    r, ok = ratio_with(f)
    print(f"score_words={swd} ncand={nc}: {per_chunk*1e3:.2f} ms/chunk "
          f"({n/(per_chunk*nrows)/2**20:.0f} MiB/s kernel-rate) ratio={r:.4f} ok={ok}",
          flush=True)
