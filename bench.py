#!/usr/bin/env python3
"""Benchmark driver: on-device block decode throughput, 10 MB text corpus.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's strongest published number for
the same operation (lz4_flex unsafe+unchecked block decompress on 10 MB
dickens: 3168 MiB/s on a Ryzen 7 5900HX — BASELINE.md).

The headline is the fully-on-device path: compressed bytes resident in HBM
-> speculative parse -> parallel expansion -> decompressed bytes in HBM
(the production shape for feeding device pipelines). Host<->device transfer
on this dev setup goes through a network tunnel at ~20 MB/s — three orders
of magnitude below a real TPU host's PCIe DMA — so transfer-inclusive
timings only measure the tunnel and are reported separately on stderr.

The real dickens.txt is a missing git-LFS blob in the reference snapshot; a
deterministic 10 MB word-soup corpus built from the in-repo corpora's
vocabulary stands in (compressibility ~0.6, like dickens' 0.637).
"""

import json
import os
import pathlib
import random
import sys
import time

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_HERE / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

BASELINE_DECOMPRESS_MIBS = 3168.0  # BASELINE.md: dickens, unsafe+unchecked
TARGET_BYTES = 10 * 1024 * 1024


def build_mixed_corpus() -> bytes:
    """~10 MB of REAL file content (not synthesized): the reference's
    in-repo corpora (1k/34k/65k text + 66k JSON) tiled in a fixed
    interleaving — a stand-in for the missing dickens/hdfs LFS blobs with
    genuine file statistics (cross-corpus generalization check)."""
    bench_dir = pathlib.Path("/root/reference/benches")
    parts = []
    for name in [
        "compression_34k.txt", "compression_66k_JSON.txt",
        "compression_65k.txt", "compression_1k.txt",
    ]:
        p = bench_dir / name
        if p.exists():
            parts.append(p.read_bytes())
    if not parts:
        return build_corpus()
    out = bytearray()
    i = 0
    while len(out) < TARGET_BYTES:
        out += parts[i % len(parts)]
        i += 1
    return bytes(out[:TARGET_BYTES])


def build_corpus() -> bytes:
    """Deterministic ~0.6-ratio text: word soup from the in-repo corpora."""
    bench_dir = pathlib.Path("/root/reference/benches")
    words = []
    for name in ["compression_34k.txt", "compression_65k.txt", "compression_1k.txt"]:
        p = bench_dir / name
        if p.exists():
            words += p.read_text(errors="replace").split()
    if not words:  # fully self-contained fallback
        rng = random.Random(1)
        words = [
            "".join(chr(rng.randrange(97, 123)) for _ in range(rng.randrange(2, 11)))
            for _ in range(20000)
        ]
    words = list(dict.fromkeys(words))  # dedupe, keep order
    rng = random.Random(0xD1C8E25)
    out = []
    size = 0
    while size < TARGET_BYTES:
        w = words[rng.randrange(len(words))]
        out.append(w)
        size += len(w) + 1
    return " ".join(out).encode()[:TARGET_BYTES]


def median_time(fn, iters=12, warmup=2, q=50):
    """Host-side wall-clock timing (for host-engine stages only).

    ``q`` picks the reported percentile (50 = median default)."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, q))


def time_stats(fn, iters=12, warmup=2):
    """(median, q25) wall-clock pair for host-engine stages.

    Steady-state numbers use the MEDIAN (apples-to-apples across rounds,
    per ADVICE r4); the lower quartile is reported alongside as the
    unloaded-host estimate — the 4-core dev host carries transient EXTERNAL
    load that inflates individual runs by up to ~50%."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50)), float(np.percentile(times, 25))


_FETCH_LATENCY = None


def device_time(fn, sync, iters=10, warmup=2):
    """Device timing per the PERF.md methodology.

    `block_until_ready` under-reports on the axon remote platform, so: jit
    dispatches are pipelined `iters` deep, completion is forced by fetching a
    device-side 1-element slice of the LAST result to the host (`sync` maps
    the result pytree to that tiny array), and the tunnel's constant fetch
    latency — measured once on an already-ready array — is subtracted.
    Never fetch big arrays here: the dev tunnel moves ~20 MB/s.
    """
    global _FETCH_LATENCY
    import numpy as _np

    r = None
    for _ in range(max(warmup, 1)):
        r = fn()
    _np.asarray(sync(r))  # drain the pipeline before measuring
    if _FETCH_LATENCY is None:
        lats = []
        for _ in range(5):
            t0 = time.perf_counter()
            _np.asarray(sync(r))
            lats.append(time.perf_counter() - t0)
        _FETCH_LATENCY = float(np.median(lats))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    _np.asarray(sync(r))
    total = time.perf_counter() - t0
    return max((total - _FETCH_LATENCY) / iters, 1e-9)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lz4_flex_tpu import block
    from lz4_flex_tpu.ops import packing
    from lz4_flex_tpu.ops.decode import (
        _expand2_kernel,
        _expand_kernel,
        default_expand_engine,
    )
    from lz4_flex_tpu.ops.sequences import parse_sequences_host

    dev = jax.devices()[0]
    data = build_corpus()
    n = len(data)
    comp = block.compress(data)
    ratio = len(comp) / n
    print(
        f"corpus: {n} bytes, native comp {len(comp)} (ratio {ratio:.4f}), "
        f"device {dev.platform}/{dev.device_kind}",
        file=sys.stderr,
    )

    comp_np = np.frombuffer(comp, np.uint8)
    comp_pad = packing.size_bucket(comp_np.shape[0])
    out_pad = packing.size_bucket(n)
    nseq_pad = packing.size_bucket(max(4, comp_pad // 3 + 2), minimum=256)

    # ---- headline: ring-engine decode steady state -------------------------
    # Production pipeline shape: the host thread pool builds buffer i+1's
    # pull plan while the Pallas ring kernel fires buffer i's plan, so the
    # pipelined steady state is max(host plan build, device kernel). Both
    # are reported; the slower one is the headline. Correctness is asserted
    # via the public end-to-end path first.
    from lz4_flex_tpu.ops.decode import decode_block_device
    from lz4_flex_tpu.ops.ringdecode import (
        build_ring_plan,
        ring_decode_jit,
        ring_plan_device_arrays,
    )

    ok = decode_block_device(comp, n, parse="ring") == data

    plan = build_ring_plan(comp_np, n)
    if plan is None:
        raise SystemExit("ring plan overflow on the bench corpus")
    arrs = ring_plan_device_arrays(plan)
    arrs = [jnp.asarray(a) for a in arrs]
    ntiles = arrs[0].shape[0]
    nf = arrs[3].shape[1]

    # On-device consumer inside the timed region: the kernel itself folds a
    # position-weighted checksum over every decoded byte into each grid
    # step (the tile is VMEM-resident there — one VPU pass per 32 KiB tile),
    # so "decoded" is end-to-end verifiable and the timed quantity cannot
    # stop at VMEM (the reference's analog: content-checksum verify inside
    # read, src/frame/decompress.rs:323-329). The 128-lane partial is what
    # crosses to the host, and its mod-2^32 sum must equal the value
    # computed independently from the expected plaintext.
    from lz4_flex_tpu.ops.ringdecode import ring_checksum_expected

    ntot = jnp.asarray(np.array([n], np.int32))
    lane_sum = lambda a: int(
        np.asarray(a).astype(np.uint32).sum(dtype=np.uint64) & 0xFFFFFFFF
    )
    f_ring = lambda: ring_decode_jit(
        *arrs, ntiles=ntiles, nf=nf, ntot=ntot
    )
    chk_ok = lane_sum(f_ring()[1]) == ring_checksum_expected(data)
    t_kern = device_time(f_ring, sync=lambda r: r[1])
    # median for the headline (apples-to-apples across rounds); q25 shown
    # as the unloaded-host estimate (this 4-core dev host carries external
    # load that swings plan walls ~30% run to run).
    t_plan, t_plan_q25 = time_stats(
        lambda: build_ring_plan(comp_np, n), iters=16
    )
    t_steady = max(t_kern, t_plan)
    mibs = n / t_steady / (1024**2)
    print(
        f"decode ring steady-state: kernel+consume {t_kern*1e3:.2f} ms "
        f"({n/t_kern/2**20:.0f} MiB/s) | host plan {t_plan*1e3:.2f} ms med "
        f"/ {t_plan_q25*1e3:.2f} ms q25 "
        f"({n/t_plan/2**20:.0f} MiB/s, pipelined) -> {mibs:.0f} MiB/s | "
        f"roundtrip ok={ok} device-checksum ok={chk_ok}",
        file=sys.stderr,
    )
    ok = ok and chk_ok

    # Kernel-capability line: the default plan trades kernel headroom for
    # host plan time (RESOLVE_MIN_DEPTH=16, TILE_ROWS=256 keep the pipeline
    # plan-bound on this 4-core host); a 512-row-tile rmd=12 plan halves
    # the per-tile depth-chain fire tax and shows what the ring kernel
    # itself sustains when the host is not the constraint (a production
    # host with more cores per chip runs this config plan-side too —
    # experiments/tr512_ab.py).
    try:
        plan8 = build_ring_plan(
            comp_np, n, tile_rows=512, resolve_min_depth=12
        )
        arrs8 = [jnp.asarray(a) for a in ring_plan_device_arrays(plan8)]
        f_k8 = lambda: ring_decode_jit(
            *arrs8, ntiles=arrs8[0].shape[0], nf=arrs8[3].shape[1],
            ntot=ntot, tile_rows=512,
        )
        ok8 = lane_sum(f_k8()[1]) == ring_checksum_expected(data)
        t_k8 = device_time(f_k8, sync=lambda r: r[1])
        print(
            f"decode ring kernel capability (TR=512 rmd=12 min-fire plan, "
            f"{int(plan8.nf_tot.sum())} fires): {t_k8*1e3:.2f} ms "
            f"({n/t_k8/2**20:.0f} MiB/s) incl. on-device checksum, ok={ok8}",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"kernel-capability bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # Cross-corpus generalization: the same pipeline on ~10 MB of REAL file
    # content (reference in-repo corpora interleaved — text + JSON mix),
    # byte-exactness asserted through the public path. Same bucketed shapes
    # as the headline, so no extra compiles.
    try:
        mdata = build_mixed_corpus()
        mcomp = block.compress(mdata)
        mnp = np.frombuffer(mcomp, np.uint8)
        ok_m = decode_block_device(mcomp, len(mdata), parse="ring") == mdata
        mplan = build_ring_plan(mnp, len(mdata))
        marrs = [jnp.asarray(a) for a in ring_plan_device_arrays(mplan)]
        f_m = lambda: ring_decode_jit(
            *marrs, ntiles=marrs[0].shape[0], nf=marrs[3].shape[1],
        )
        t_mk = device_time(f_m, sync=lambda r: r[:1, :1])
        t_mp, t_mp_q25 = time_stats(
            lambda: build_ring_plan(mnp, len(mdata)), iters=10
        )
        t_ms = max(t_mk, t_mp)
        print(
            f"decode ring, mixed real-file corpus (ratio {len(mcomp)/len(mdata):.3f}): "
            f"kernel {t_mk*1e3:.1f} ms | plan {t_mp*1e3:.1f} ms med / "
            f"{t_mp_q25*1e3:.1f} q25 -> "
            f"{len(mdata)/t_ms/2**20:.0f} MiB/s steady, ok={ok_m}",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"mixed-corpus bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    # Legacy XLA expansion path (pre-ring engine), for comparison.
    comp_dev = jnp.asarray(packing.pad_to(comp_np, comp_pad))
    clen = jnp.int32(comp_np.shape[0])
    seq = parse_sequences_host(comp_np)
    nsp = packing.size_bucket(max(seq.nseq, 4), minimum=256)
    comp_words = jnp.asarray(packing.pad_to(comp_np, comp_pad).view("<u4"))
    oo = jnp.asarray(packing.pad_to(seq.out_off, nsp, fill=out_pad))
    ls = jnp.asarray(packing.pad_to(seq.lit_start, nsp))
    ll = jnp.asarray(packing.pad_to(seq.lit_len, nsp))
    mo = jnp.asarray(packing.pad_to(seq.match_off, nsp, fill=1))
    dw = jnp.zeros(1, jnp.uint32)
    _kern = _expand2_kernel if default_expand_engine() == "v2" else _expand_kernel
    f_expand = lambda: _kern(
        comp_words, dw, oo, ls, ll, mo, jnp.int32(0), jnp.int32(n),
        out_pad=out_pad, has_dict=False,
    )
    try:
        t_exp = device_time(f_expand, sync=lambda r: r[:1])
        print(
            f"decode XLA-expand (legacy engine): {t_exp*1e3:.2f} ms "
            f"({n/t_exp/2**20:.0f} MiB/s)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"XLA-expand bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    # (The "fused-resident" on-device-parse path and the vmap'd
    # "frame-batched" path were retired from the bench in round 3: at 2-5
    # MiB/s with 45 s first compiles they are production-irrelevant — the
    # XLA expansion engine above remains the measured non-TPU fallback.)

    bs = 65536
    payloads = [block.compress(data[i : i + bs]) for i in range(0, n, bs)]

    # Production frame decode: the same 160x64KiB body through the ring
    # engine (one whole-frame plan; linked-window/stored-block semantics
    # ride the kernel's output ring) — what FrameDecoder engine="device"
    # and decompress_frame_device actually run.
    try:
        from lz4_flex_tpu.ops.ringdecode import (
            build_ring_plan_parts,
            decode_parts_ring,
        )

        parts = [(np.frombuffer(p, np.uint8), True) for p in payloads]
        ok_fr = decode_parts_ring(parts, independent=True) == data
        planf, _ = build_ring_plan_parts(parts, n, independent=True)
        arrs_f = [
            jnp.asarray(a) for a in ring_plan_device_arrays(planf)
        ]
        f_fr = lambda: ring_decode_jit(
            *arrs_f, ntiles=arrs_f[0].shape[0], nf=arrs_f[3].shape[1],
        )
        t_frk = device_time(f_fr, sync=lambda r: r[:1, :1])
        t_frp, t_frp_q25 = time_stats(
            lambda: build_ring_plan_parts(parts, n, independent=True),
            iters=10,
        )
        t_frs = max(t_frk, t_frp)
        print(
            f"decode frame ring engine (160x64KiB whole-frame plan): "
            f"kernel {t_frk*1e3:.1f} ms | host plan {t_frp*1e3:.1f} ms med / "
            f"{t_frp_q25*1e3:.1f} q25 -> "
            f"{n/t_frs/2**20:.0f} MiB/s steady state, ok={ok_fr} "
            f"(end-to-end bytes-out is d2h-tunnel-bound on this dev setup)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"frame ring bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    # Aggregate small-block throughput: the reference's HEADLINE shape is a
    # 66 KB JSON block (README.md:17, 5,973 MiB/s one core); lz4's dominant
    # production use is many independent small blocks. 160 copies decode
    # through ONE batched ring dispatch (one whole-batch plan — exactly what
    # FrameDecoder engine="device" and decode_blocks_sharded_ring run per
    # batch); single-block latency is reported separately below.
    try:
        jdata = pathlib.Path(
            "/root/reference/benches/compression_66k_JSON.txt"
        ).read_bytes()
        jcomp = block.compress(jdata)
        njb = 160
        jparts = [(np.frombuffer(jcomp, np.uint8), True)] * njb
        jtotal = len(jdata) * njb
        jout = decode_parts_ring(jparts, independent=True)
        ok_j = jout == jdata * njb
        planj, _ = build_ring_plan_parts(jparts, jtotal, independent=True)
        arrs_j = [jnp.asarray(a) for a in ring_plan_device_arrays(planj)]
        f_j = lambda: ring_decode_jit(
            *arrs_j, ntiles=arrs_j[0].shape[0], nf=arrs_j[3].shape[1],
        )
        t_jk = device_time(f_j, sync=lambda r: r[:1, :1])
        t_jp, t_jp_q25 = time_stats(
            lambda: build_ring_plan_parts(jparts, jtotal, independent=True),
            iters=10,
        )
        t_js = max(t_jk, t_jp)
        print(
            f"decode aggregate small blocks (160x66KB JSON, one batched ring "
            f"dispatch, {jtotal/2**20:.1f} MiB out): kernel {t_jk*1e3:.1f} ms | "
            f"plan {t_jp*1e3:.1f} ms med / {t_jp_q25*1e3:.1f} q25 -> "
            f"{jtotal/t_js/2**20:.0f} MiB/s aggregate, ok={ok_j}",
            file=sys.stderr,
        )
    except Exception as e:
        print(
            f"aggregate small-block bench failed: {type(e).__name__}: {e}",
            file=sys.stderr,
        )

    # Small-block latency tier: the reference's headline corpus is 66 KB
    # JSON at 5,973 MiB/s (README.md:17-19), and the frame default block is
    # 64 KiB. Steady-state single-block decode through the production ring
    # path (pipelined plan + kernel, like the 10 MB headline but per-block).
    try:
        for tag, sdata in [
            ("66KB JSON", pathlib.Path(
                "/root/reference/benches/compression_66k_JSON.txt"
            ).read_bytes()),
            ("64KiB text", data[:65536]),
        ]:
            scomp = block.compress(sdata)
            snp = np.frombuffer(scomp, np.uint8)
            ok_s = decode_block_device(scomp, len(sdata), parse="ring") == sdata
            splan = build_ring_plan(snp, len(sdata))
            sarrs = [jnp.asarray(a) for a in ring_plan_device_arrays(splan)]
            f_s = lambda: ring_decode_jit(
                *sarrs, ntiles=sarrs[0].shape[0], nf=sarrs[3].shape[1]
            )
            t_sk = device_time(f_s, sync=lambda r: r[:1, :1], iters=30)
            t_sp, t_sp_q25 = time_stats(
                lambda: build_ring_plan(snp, len(sdata)), iters=40
            )
            t_ss = max(t_sk, t_sp)
            print(
                f"decode small block ({tag}, {len(sdata)} B, ratio "
                f"{len(scomp)/len(sdata):.3f}): kernel {t_sk*1e3:.2f} ms | "
                f"plan {t_sp*1e3:.2f} ms med / {t_sp_q25*1e3:.2f} q25 -> "
                f"{len(sdata)/t_ss/2**20:.0f} MiB/s "
                f"steady per block (single-block latency, not aggregate), "
                f"ok={ok_s}",
                file=sys.stderr,
            )
    except Exception as e:
        print(f"small-block bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    # ---- device encode (resident, 448 KiB chunk kernel) -------------------
    try:
        from lz4_flex_tpu.ops.encode import (
            _CHUNK_W,
            compress_block_device,
            encode_chunk_core,
        )
        from functools import partial

        enc_data = data[: _CHUNK_W - 65536 - 4]
        buf = np.frombuffer(enc_data, np.uint8)
        pad = packing.size_bucket(buf.shape[0] + 4)
        enc_nseq = packing.size_bucket(pad // 4 + 2, minimum=256)
        from lz4_flex_tpu.spec.constants import get_maximum_output_size

        cp = packing.size_bucket(get_maximum_output_size(buf.shape[0]))
        k = jax.jit(
            partial(
                encode_chunk_core,
                levels=12,
                comp_pad=cp,
                nseq_pad=enc_nseq,
            )
        )
        u8d = jnp.asarray(packing.pad_to(buf, pad))
        wd = jnp.asarray(packing.pad_to(buf, pad).view("<u4"))
        f_enc = lambda: k(u8d, wd, jnp.int32(0), jnp.int32(buf.shape[0]))
        cbytes, ctot = f_enc()
        enc_ok = (
            block.decompress(np.asarray(cbytes[: int(ctot)]).tobytes(), len(enc_data))
            == enc_data
        )
        t_enc = device_time(f_enc, sync=lambda r: r[1], iters=6)
        nat = block.compress(enc_data)
        print(
            f"encode chunk-resident ({len(enc_data)} B): {t_enc*1e3:.2f} ms -> "
            f"{len(enc_data)/t_enc/2**20:.0f} MiB/s, ratio {int(ctot)/len(enc_data):.4f} "
            f"(native {len(nat)/len(enc_data):.4f}), ok={enc_ok}",
            file=sys.stderr,
        )
    except Exception as e:  # encode context must not sink the headline
        print(f"encode bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    # ---- production encode: hybrid (device candidate search + host walk) ---
    try:
        from lz4_flex_tpu.ops import compress_block_hybrid
        from lz4_flex_tpu.ops.encode import (
            _CHUNK_C,
            _CHUNK_W,
            _PLANE_POOL,
            _PLANE_ROWS,
            _PLANE_STRIDE,
            _best_plane_quad,
            _hybrid_lib,
        )
        import ctypes as _ct

        hcomp = compress_block_hybrid(data)
        henc_ok = block.decompress(hcomp, n) == data
        t_hyb = median_time(lambda: compress_block_hybrid(data), iters=5)
        # Pipeline-stage split: the end-to-end number above includes the
        # plane d2h over the dev tunnel (~14 MiB/s — a tunnel artifact;
        # real hosts move the 2.6 MB of planes in ~1 ms over PCIe). The
        # stages that survive on real hardware are the device candidate
        # kernel and the host walk, which pipeline against each other.
        G = np.frombuffer(data, np.uint8)
        bucket = packing.size_bucket(n + 8)
        gpad = jnp.asarray(packing.pad_to(G, bucket))
        R = _PLANE_ROWS
        starts4_h = [i * _CHUNK_C for i in range(R)]
        starts4 = jnp.asarray(np.array(starts4_h, np.int32))
        t_q = device_time(
            lambda: _best_plane_quad(gpad, starts4, _PLANE_POOL, _PLANE_STRIDE),
            sync=lambda r: r[:1, :1], iters=6,
        )
        nrows = -(-n // _CHUNK_C)
        t_kq = t_q / R * nrows  # candidate kernel, whole input
        # walk-only: the chunk-PARALLEL walk over one fetched group's
        # planes (tlz4_hybrid_walk_chunk on the host thread pool — the
        # production shape since round 5)
        from lz4_flex_tpu.parallel.pipeline import _plan_executor

        quad = np.asarray(_best_plane_quad(gpad, starts4, _PLANE_POOL, _PLANE_STRIDE))
        lib = _hybrid_lib()
        ccap = 16 + 4 + (_CHUNK_C * 110) // 100 + 16
        wirebuf = np.empty(R * ccap, np.uint8)
        planes = [np.ascontiguousarray(quad[i]) for i in range(R)]
        wx = _plan_executor()

        def walk_chunk(i):
            tail = np.zeros(1, np.int64)
            lib.tlz4_hybrid_walk_chunk(
                G.ctypes.data_as(_ct.POINTER(_ct.c_uint8)), n,
                planes[i].ctypes.data_as(_ct.POINTER(_ct.c_uint16)),
                starts4_h[i], i * _CHUNK_C,
                min((i + 1) * _CHUNK_C, n),
                _CHUNK_W // _PLANE_POOL, _PLANE_POOL.bit_length() - 1,
                wirebuf[i * ccap :].ctypes.data_as(_ct.POINTER(_ct.c_uint8)),
                ccap, 0, tail.ctypes.data_as(_ct.POINTER(_ct.c_int64)),
            )

        def walk_once():
            futs = [wx.submit(walk_chunk, i) for i in range(R)]
            for f in futs:
                f.result()

        t_w = median_time(walk_once, iters=5) / R * nrows
        t_pipe = max(t_kq, t_w)
        print(
            f"encode hybrid 10MB (pooled-plane device search + native walk): "
            f"{t_hyb*1e3:.0f} ms -> {n/t_hyb/2**20:.1f} MiB/s end-to-end "
            f"(plane d2h tunnel-bound) | candidate kernel {t_kq*1e3:.0f} ms "
            f"({n/t_kq/2**20:.0f} MiB/s) | host walk {t_w*1e3:.0f} ms "
            f"({n/t_w/2**20:.0f} MiB/s) -> pipelined {n/t_pipe/2**20:.0f} "
            f"MiB/s off-tunnel | ratio {len(hcomp)/n:.4f} (native {ratio:.4f}), "
            f"ok={henc_ok}",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"hybrid encode bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    value = mibs if ok else 0.0
    print(
        json.dumps(
            {
                "metric": "block decompress 10MB text, ring engine (pipelined host plan + Pallas kernel)",
                "value": round(value, 1),
                "unit": "MiB/s",
                "vs_baseline": round(value / BASELINE_DECOMPRESS_MIBS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
