"""Same-process TPU A/B: ring kernel at TILE_ROWS 256 (production) vs 512.

Doubling the tile halves the per-tile depth-chain fire tax (fires/tile is
bound by the depth-group chain, not records/RB), at the cost of a wider
pull table (KR 768->1024) and scatter (TR 256->512) per fire. Run on the
real TPU; kernel timings must be same-process per CLAUDE.md.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
import bench
from lz4_flex_tpu import block
from lz4_flex_tpu.ops import ringdecode as RD

data = bench.build_corpus()
n = len(data)
comp = np.frombuffer(block.compress(data), np.uint8)

def run(tr, rmd, label):
    plan = RD.build_ring_plan(comp, n, tile_rows=tr, resolve_min_depth=rmd)
    if plan is None:
        print(f"{label}: plan overflow"); return
    arrs = [jnp.asarray(a) for a in RD.ring_plan_device_arrays(plan)]
    nt, nf = arrs[0].shape[0], arrs[3].shape[1]
    fires = int(plan.nf_tot.sum())
    key = (nt, nf, plan.rb, False, False)
    fn = RD._KERNEL_CACHE.get(key)
    if fn is None or tr != RD.TILE_ROWS:
        fn = RD._kernel_call(nt, nf, TR=tr, RB_=plan.rb)
    out = fn(*arrs)
    ok = np.asarray(out.astype(jnp.uint8)).reshape(-1)[:n].tobytes() == data
    t = bench.device_time(lambda: fn(*arrs), sync=lambda r: r[:1, :1], iters=10)
    print(f"{label}: tiles={nt} fires={fires} nf={nf} kernel={t*1e3:.2f} ms "
          f"({n/t/2**20:.0f} MiB/s) ok={ok}", flush=True)
    return t

for rep in range(2):
    run(256, 16, f"[rep{rep}] TR=256 rmd=16")
    run(512, 16, f"[rep{rep}] TR=512 rmd=16")
    run(512, 12, f"[rep{rep}] TR=512 rmd=12")
