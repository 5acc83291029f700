#!/usr/bin/env python3
"""Quick ring-decode steady-state probe: kernel + plan times on the 10 MB
text corpus (and optionally the JSON corpus), nothing else."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench as B
import jax.numpy as jnp

from lz4_flex_tpu import block
from lz4_flex_tpu.ops.ringdecode import (
    build_ring_plan,
    decode_block_ring,
    ring_decode_jit,
    ring_plan_device_arrays,
)


def main():
    data = B.build_corpus()
    n = len(data)
    corpora = {"text": data}
    if "--json" in sys.argv:
        seed = open("/root/reference/benches/compression_66k_JSON.txt", "rb").read()
        corpora["json"] = (seed * (n // len(seed) + 1))[:n]
    for name, d in corpora.items():
        comp = block.compress(d)
        comp_np = np.frombuffer(comp, np.uint8)
        ok = decode_block_ring(comp_np, n) == d
        plan = build_ring_plan(comp_np, n)
        arrs = [jnp.asarray(a) for a in ring_plan_device_arrays(plan)]
        nt = arrs[0].shape[0]
        nf = arrs[3].shape[1]
        fires = int(plan.nf_tot.sum())
        pfires = int(
            sum(bin(int(w) & 0xFFFFFFFF).count("1") for w in plan.fper.reshape(-1))
        )
        f = lambda: ring_decode_jit(*arrs, ntiles=nt, nf=nf)
        t_k = B.device_time(f, sync=lambda r: r[:1, :1])
        t_p = B.median_time(lambda: build_ring_plan(comp_np, n), iters=6)
        t_s = max(t_k, t_p)
        print(
            f"{name}: ratio {len(comp)/n:.3f} fires {fires} (periodic {pfires}) | "
            f"kernel {t_k*1e3:.2f} ms ({n/t_k/2**20:.0f} MiB/s) | "
            f"plan {t_p*1e3:.2f} ms ({n/t_p/2**20:.0f} MiB/s) -> "
            f"steady {n/t_s/2**20:.0f} MiB/s, ok={ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
