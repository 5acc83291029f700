#!/usr/bin/env python3
"""Candidate-kernel ablation: what does the 4-key/payload sort cost, and
what do the planned cuts buy?

Variants (per 512 KiB chunk unless noted):
  full      production best_plane_core (sort carries w4p4 + w4p8 payloads)
  drop8     sort carries w4p4 only (cap extension scoring at 8 B)
  drop48    no payload planes (score = closest candidate only)
  256k      drop8 at 256 KiB chunk shape (more chunks, shallower sort)
  sortonly  the bare 2-key sort, no payloads, no extraction
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp

import bench as B
from lz4_flex_tpu.ops.encode import _CHUNK_W, _shift_read


def plane_core(u8, pool, npay):
    pad = u8.shape[0]
    pos = jnp.arange(pad, dtype=jnp.int32)
    u = u8.astype(jnp.uint32)
    w4 = u | (_shift_read(u, 1) << 8) | (_shift_read(u, 2) << 16) | (
        _shift_read(u, 3) << 24
    )
    ops = [w4, pos.astype(jnp.uint32)]
    if npay >= 1:
        ops.append(_shift_read(w4, 4))
    if npay >= 2:
        ops.append(_shift_read(w4, 8))
    res = jax.lax.sort(tuple(ops), num_keys=2)
    sw, sp = res[0], res[1]
    s4 = res[2] if npay >= 1 else None
    s8 = res[3] if npay >= 2 else None
    spi = sp.astype(jnp.int32)
    best_score = jnp.zeros(pad, jnp.int32)
    best_delta = jnp.zeros(pad, jnp.int32)
    for j in range(1, 5):
        same = jnp.concatenate([jnp.zeros(j, bool), sw[j:] == sw[:-j]])
        prev = jnp.concatenate([jnp.zeros(j, jnp.int32), spi[:-j]])
        delta = spi - prev
        ok = same & (delta <= 65535)
        score = jnp.where(ok, 4, 0)
        if npay >= 1:
            c4 = jnp.concatenate([jnp.zeros(j, jnp.uint32), s4[:-j]])
            score = score + 4 * ((c4 == s4) & ok).astype(jnp.int32)
        if npay >= 2:
            c8 = jnp.concatenate([jnp.zeros(j, jnp.uint32), s8[:-j]])
            score = score + 4 * ((c8 == s8) & (c4 == s4) & ok).astype(jnp.int32)
        take = score > best_score
        best_score = jnp.where(take, score, best_score)
        best_delta = jnp.where(take, delta, best_delta)
    dplane = jnp.zeros(pad, jnp.int32).at[spi].set(best_delta)
    splane = jnp.zeros(pad, jnp.int32).at[spi].set(best_score)
    d2 = dplane.reshape(pad // pool, pool)
    s2 = splane.reshape(pad // pool, pool)
    jx = jnp.argmax(s2, axis=1)
    return jnp.take_along_axis(d2, jx[:, None], axis=1)[:, 0].astype(jnp.uint16)


def sort_only(u8):
    pad = u8.shape[0]
    pos = jnp.arange(pad, dtype=jnp.uint32)
    u = u8.astype(jnp.uint32)
    w4 = u | (_shift_read(u, 1) << 8) | (_shift_read(u, 2) << 16) | (
        _shift_read(u, 3) << 24
    )
    sw, sp = jax.lax.sort((w4, pos), num_keys=2)
    return sp[:1]


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    data = B.build_corpus()

    for name, W, fn in [
        ("full  512k", _CHUNK_W, lambda u: plane_core(u, 4, 2)),
        ("drop8 512k", _CHUNK_W, lambda u: plane_core(u, 4, 1)),
        ("drop48 512k", _CHUNK_W, lambda u: plane_core(u, 4, 0)),
        ("drop8 256k", _CHUNK_W // 2, lambda u: plane_core(u, 4, 1)),
        ("sortonly 512k", _CHUNK_W, sort_only),
    ]:
        u = jnp.asarray(np.frombuffer(data[:W], np.uint8))
        f = jax.jit(fn)
        try:
            t = B.device_time(lambda: f(u), sync=lambda r: r[:1], iters=8)
            # effective data bytes per chunk = W - 64K window - 4 slack
            eff = W - 65536 - 4
            total = t * (len(data) / eff)
            print(
                f"{name}: {t*1e3:6.2f} ms/chunk -> {total*1e3:5.0f} ms/10MB "
                f"({len(data)/total/2**20:.0f} MiB/s kernel)",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
