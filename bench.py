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


def median_time(fn, iters=12, warmup=2):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lz4_flex_tpu import block
    from lz4_flex_tpu.ops import packing
    from lz4_flex_tpu.ops.decode import _expand_kernel, decode_resident
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

    # ---- headline: fully-on-device decode (input/output resident in HBM) --
    comp_dev = jnp.asarray(packing.pad_to(comp_np, comp_pad))
    clen = jnp.int32(comp_np.shape[0])
    f_resident = lambda: jax.block_until_ready(
        decode_resident(comp_dev, clen, out_pad=out_pad, nseq_pad=nseq_pad)
    )
    t0 = time.perf_counter()
    out, total, errs = decode_resident(comp_dev, clen, out_pad=out_pad, nseq_pad=nseq_pad)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    ok = int(total) == n and not np.asarray(errs).any()
    ok = ok and bytes(np.asarray(out[:n]).tobytes()) == data
    t_res = median_time(f_resident)
    mibs_res = n / t_res / (1024**2)
    print(
        f"decode fused-resident: {t_res*1e3:.2f} ms -> {mibs_res:.0f} MiB/s "
        f"(first call incl. compile {t_compile:.1f}s), roundtrip ok={ok}",
        file=sys.stderr,
    )

    # ---- context numbers (stderr) -----------------------------------------
    seq = parse_sequences_host(comp_np)
    nsp = packing.size_bucket(max(seq.nseq, 4), minimum=256)
    comp_words = jnp.asarray(packing.pad_to(comp_np, comp_pad).view("<u4"))
    oo = jnp.asarray(packing.pad_to(seq.out_off, nsp, fill=out_pad))
    ls = jnp.asarray(packing.pad_to(seq.lit_start, nsp))
    ll = jnp.asarray(packing.pad_to(seq.lit_len, nsp))
    mo = jnp.asarray(packing.pad_to(seq.match_off, nsp, fill=1))
    dw = jnp.zeros(1, jnp.uint32)
    f_expand = lambda: jax.block_until_ready(
        _expand_kernel(
            comp_words, dw, oo, ls, ll, mo, jnp.int32(0), jnp.int32(n),
            out_pad=out_pad, has_dict=False,
        )
    )
    t_exp = median_time(f_expand)
    t_parse = median_time(lambda: parse_sequences_host(comp_np))
    print(
        f"decode stages: device-expand {t_exp*1e3:.2f} ms ({n/t_exp/2**20:.0f} MiB/s) | "
        f"host-parse {t_parse*1e3:.2f} ms ({n/t_parse/2**20:.0f} MiB/s) | "
        f"nseq {seq.nseq}",
        file=sys.stderr,
    )

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
        f_enc = lambda: jax.block_until_ready(k(u8d, wd, jnp.int32(0), jnp.int32(buf.shape[0])))
        cbytes, ctot = k(u8d, wd, jnp.int32(0), jnp.int32(buf.shape[0]))
        enc_ok = (
            block.decompress(np.asarray(cbytes[: int(ctot)]).tobytes(), len(enc_data))
            == enc_data
        )
        t_enc = median_time(f_enc, iters=8)
        nat = block.compress(enc_data)
        print(
            f"encode chunk-resident ({len(enc_data)} B): {t_enc*1e3:.2f} ms -> "
            f"{len(enc_data)/t_enc/2**20:.0f} MiB/s, ratio {int(ctot)/len(enc_data):.4f} "
            f"(native {len(nat)/len(enc_data):.4f}), ok={enc_ok}",
            file=sys.stderr,
        )
    except Exception as e:  # encode context must not sink the headline
        print(f"encode bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    value = mibs_res if ok else 0.0
    print(
        json.dumps(
            {
                "metric": "on-device block decompress, 10MB text (parse+expand in HBM)",
                "value": round(value, 1),
                "unit": "MiB/s",
                "vs_baseline": round(value / BASELINE_DECOMPRESS_MIBS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
