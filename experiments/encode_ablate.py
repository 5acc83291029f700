"""Stage-level ablation of the encode chunk kernel on the TPU.

Times (pipelined, slice-synced): sort, candidate extraction, lifting table
build, per-candidate lifting extension, chain doubling, backward extension,
emission — to find where the 834 ms chunk encode actually goes.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_corpus, device_time
from lz4_flex_tpu.ops import packing
from lz4_flex_tpu.ops.encode import _mix, _shift_read, _CHUNK_W

LEVELS = 12
PAD = _CHUNK_W

data = build_corpus()[: PAD - 65536 - 4]
buf = np.frombuffer(data, np.uint8)
u8 = jnp.asarray(np.pad(buf, (0, PAD - buf.shape[0])))
n = jnp.int32(buf.shape[0])
d = jnp.int32(0)


def stage_words(u8):
    u = u8.astype(jnp.uint32)
    return u | (_shift_read(u, 1) << 8) | (_shift_read(u, 2) << 16) | (
        _shift_read(u, 3) << 24
    )


@jax.jit
def s_sort(u8):
    w4 = stage_words(u8)
    pos = jnp.arange(PAD, dtype=jnp.int32)
    sw, sp = jax.lax.sort((w4, pos.astype(jnp.uint32)), num_keys=2)
    return sw, sp


@jax.jit
def s_cands(u8):
    w4 = stage_words(u8)
    pos = jnp.arange(PAD, dtype=jnp.int32)
    sw, sp = jax.lax.sort((w4, pos.astype(jnp.uint32)), num_keys=2)
    spi = sp.astype(jnp.int32)
    cands = []
    for j in range(1, 5):
        same = jnp.concatenate([jnp.zeros(j, bool), sw[j:] == sw[:-j]])
        prev = jnp.concatenate([jnp.zeros(j, jnp.int32), spi[:-j]])
        cands.append(
            jnp.full(PAD, -1, jnp.int32).at[spi].set(jnp.where(same, prev, -1))
        )
    return cands


@jax.jit
def s_lift_tables(u8):
    u = u8.astype(jnp.uint32)
    H = [u, u | (_shift_read(u, 1) << 8), stage_words(u8)]
    for k in range(3, LEVELS + 1):
        H.append(_mix(H[-1], _shift_read(H[-1], 1 << (k - 1))))
    return H


def make_extend(n_cands):
    @jax.jit
    def s_extend(u8, n):
        pos = jnp.arange(PAD, dtype=jnp.int32)
        H = s_lift_tables(u8)
        cands = s_cands(u8)[:n_cands]
        lim = jnp.clip(n - 5 - pos, 0, None)

        def eq_at(k, a, b):
            hk = H[k]
            return hk[jnp.clip(a, 0, PAD - 1)] == hk[jnp.clip(b, 0, PAD - 1)]

        eligible = (pos >= d) & (pos <= n - 13) & (lim >= 4)
        cand = jnp.full(PAD, -1, jnp.int32)
        mlen = jnp.zeros(PAD, jnp.int32)
        for ck in cands:
            valid = eligible & (ck >= 0) & (pos - ck <= 65535)
            c = jnp.maximum(ck, 0)
            ml_k = jnp.full(PAD, 4, jnp.int32)
            for k in range(LEVELS, -1, -1):
                step = 1 << k
                ok = (ml_k + step <= lim) & eq_at(k, pos + ml_k, c + ml_k)
                ml_k = ml_k + step * ok
            better = valid & (ml_k > mlen)
            cand = jnp.where(better, ck, cand)
            mlen = jnp.where(better, ml_k, mlen)
        return cand, mlen

    return s_extend


@jax.jit
def s_chain(u8, n):
    pos = jnp.arange(PAD, dtype=jnp.int32)
    cand, mlen = make_extend(4)(u8, n)
    has_match = cand >= 0
    jump = jnp.where(has_match, pos + mlen, pos + 1)
    J = jnp.where(pos < n, jnp.clip(jump, 0, PAD), PAD)
    J = jnp.concatenate([J, jnp.array([PAD], jnp.int32)])
    M = jnp.zeros_like(J).at[d].set(1)

    def body(_, carry):
        M, J = carry
        M = M.at[J].max(M)
        return M, J[J]

    M, _ = jax.lax.fori_loop(0, 20, body, (M, J))
    return M


for name, fn, sync in [
    ("sort+perm", lambda: s_sort(u8), lambda r: r[0][:1]),
    ("cands(4) total", lambda: s_cands(u8), lambda r: r[0][:1]),
    ("lift tables", lambda: s_lift_tables(u8), lambda r: r[-1][:1]),
    ("extend k=1", lambda: make_extend(1)(u8, n), lambda r: r[1][:1]),
    ("extend k=4", lambda: make_extend(4)(u8, n), lambda r: r[1][:1]),
    ("chain (incl k=4 extend)", lambda: s_chain(u8, n), lambda r: r[:1]),
]:
    t0 = time.perf_counter()
    r = fn()
    jax.block_until_ready(r)
    t_compile = time.perf_counter() - t0
    t = device_time(fn, sync=sync, iters=6, warmup=1)
    print(f"{name:28s} {t*1e3:8.2f} ms   (first {t_compile:.1f}s)", flush=True)
