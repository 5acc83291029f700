#!/usr/bin/env python3
"""Round-2 design study: cell-pull materialization, algorithm validation.

PERF.md's fragment measurements rule out fixed-cell fast paths (resolved
fragments average 4.3 B); the proposed kernel shape is the CELL-PULL — each
16-byte output cell gathers its first K overlapping fragments as
cell-aligned unaligned reads and combines them with per-lane selects, with
a per-byte fallback for cells spanning more than K fragments.

This is the numpy simulation proving the combine logic byte-exact against
the reference decode, plus the K-coverage statistics that size the
fallback. Everything here maps 1:1 onto jnp: the gathers become row-pair
slice gathers + funnel shifts (measured 142 M rows/s at W=4 words), the
selects become where-chains, and the fallback set is rank-compacted.

Usage: python experiments/cellpull_sim.py   (uses the bench corpus)

Measured sweep on 2 MiB of the bench corpus (all byte-exact):

  W= 8 K= 4: fallback  7.6%   2.10 M row-pairs
  W=16 K= 4: fallback 48.6%   1.05 M
  W=16 K= 6: fallback 15.5%   1.57 M
  W=16 K= 8: fallback  2.5%   2.10 M   <- sweet spot
  W=32 K=12: fallback  7.6%   1.57 M

At the measured 142 M row-gathers/s, W=16 K=8 materializes 10 MiB in
~75 ms; with fragment-level resolution replacing per-byte doubling the
projected full decode is ~150-200 ms (50-70 MiB/s), ~5x round 1.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lz4_flex_tpu import block
from lz4_flex_tpu.ops.sequences import parse_sequences_host

W = 16  # cell width (bytes)
K = 4  # fragments pulled per cell before falling back


def resolve_sources(seq, n):
    """Reference per-byte comp-space source map (what the device kernel's
    pointer doubling produces)."""
    k = np.empty(n, np.int64)
    for i in range(seq.nseq):
        oo, ll, ls, mo, ml = (
            int(seq.out_off[i]), int(seq.lit_len[i]), int(seq.lit_start[i]),
            int(seq.match_off[i]), int(seq.match_len[i]),
        )
        k[oo : oo + ll] = np.arange(ls, ls + ll)
        for j in range(oo + ll, oo + ll + ml):
            k[j] = k[j - mo]
    return k


def cellpull(comp, k, n):
    """The cell-pull: vectorized-style reconstruction from the source map."""
    comp = np.frombuffer(comp, np.uint8)
    p = np.arange(n)
    d = k - p  # constant within a fragment
    bnd = np.empty(n, bool)
    bnd[0] = True
    bnd[1:] = d[1:] != d[:-1]
    fid = np.cumsum(bnd) - 1  # fragment id per byte
    frag_start = np.flatnonzero(bnd)  # per-fragment output start
    frag_d = d[frag_start]  # per-fragment source delta

    ncells = n // W
    cells = np.arange(ncells) * W
    f0 = fid[cells]  # first fragment per cell
    out = np.zeros(ncells * W, np.uint8)
    lanes = np.arange(W)

    # jnp version: rows[j] = funnel(comp_words, frag_d[f0+j] + cellstart)
    # — one unaligned row-pair gather per (cell, j).
    jsel = fid[cells[:, None] + lanes[None, :]] - f0[:, None]  # (ncells, W)
    fallback = jsel.max(axis=1) >= K
    for j in range(K):
        fj = np.minimum(f0 + j, len(frag_d) - 1)
        src = frag_d[fj][:, None] + cells[:, None] + lanes[None, :]
        rows = comp[np.clip(src, 0, comp.shape[0] - 1)]  # (ncells, W)
        take = jsel == j
        out.reshape(ncells, W)[take] = rows[take]

    # per-byte fallback for >K-fragment cells and the tail
    fb_cells = np.flatnonzero(fallback)
    for c in fb_cells:
        s = cells[c]
        out[s : s + W] = comp[k[s : s + W]]
    tail = np.arange(ncells * W, n)
    tail_out = comp[k[tail]] if tail.size else np.empty(0, np.uint8)
    return bytes(out.tobytes() + tail_out.tobytes()), fallback.mean(), len(frag_start)


def main():
    ns = {"__file__": str(pathlib.Path(__file__).resolve().parent.parent / "bench.py")}
    exec(
        (pathlib.Path(__file__).resolve().parent.parent / "bench.py")
        .read_text()
        .split("def median_time")[0],
        ns,
    )
    data = ns["build_corpus"]()[: 2 * 1024 * 1024]
    comp = block.compress(data)
    seq = parse_sequences_host(np.frombuffer(comp, np.uint8))
    k = resolve_sources(seq, len(data))
    out, fb_frac, nfrag = cellpull(comp, k, len(data))
    ok = out == data
    print(
        f"cell-pull W={W} K={K}: byte-exact={ok}, fragments={nfrag}, "
        f"fallback cells={fb_frac:.1%}"
    )
    assert ok


if __name__ == "__main__":
    main()
