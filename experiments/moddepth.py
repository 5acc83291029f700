#!/usr/bin/env python3
"""Round-2 design probe: pointer-chain depth with analytic self-overlap
collapse (the "RLE mod trick").

Round 1's per-byte doubling decay (57.8% -> 33.9% -> 14.6% -> 4.4% -> 0.8%
-> 0.05% -> 0) counts SELF-overlapping match chains (offset < length), which
are the deep ones (RLE runs step 1 byte per hop). Those resolve in closed
form: for a match segment starting at m0 with offset mo, a byte p >= m0
whose naive source p - mo lands back inside [m0, p) has true source
m0 - mo + (p - m0) % mo. With that applied at segment-build time every hop
lands in a STRICTLY EARLIER sequence, so depth = cross-sequence hop count.

This probe measures, on the bench corpus:
  - per-byte unresolved fraction by round with one-hop-per-round (depth
    distribution) and with doubling, mod trick ON;
  - the fragment count of the final map (cell-pull input size);
  - (cell, fragment) incidence counts at W=16/32 (materialization gather
    instances).
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lz4_flex_tpu import block
from lz4_flex_tpu.ops.sequences import parse_sequences_host


def build_maps(seq, n):
    """Per-byte arrays from the sequence table, mod trick applied:
    s[p] = source in OUTPUT space for match bytes (always < segment start),
    s[p] = -(comp_pos+1) for literal bytes (resolved)."""
    s = np.empty(n, np.int64)
    for i in range(seq.nseq):
        oo, ll, ls, mo, ml = (
            int(seq.out_off[i]), int(seq.lit_len[i]), int(seq.lit_start[i]),
            int(seq.match_off[i]), int(seq.match_len[i]),
        )
        s[oo : oo + ll] = -(np.arange(ls, ls + ll) + 1)
        if ml:
            m0 = oo + ll
            rel = np.arange(ml)
            src = m0 - mo + (rel % mo if mo < ml else rel)
            s[m0 : m0 + ml] = src
    return s


def decay(s, n, doubling):
    rounds = []
    s = s.copy()
    while (s >= 0).any():
        un = s >= 0
        rounds.append(un.mean())
        if doubling:
            g = s[np.clip(s, 0, n - 1)]
            s = np.where(un, g, s)
        else:
            # one hop per round: hop only bytes whose target is resolved
            g = s[np.clip(s, 0, n - 1)]
            hop = un & (g < 0)
            s = np.where(hop, g, s)
            if not hop.any():
                raise RuntimeError("stuck")
        if len(rounds) > 64:
            raise RuntimeError("too deep")
    return rounds


def main():
    ns = {"__file__": str(pathlib.Path(__file__).resolve().parent.parent / "bench.py")}
    exec(
        (pathlib.Path(__file__).resolve().parent.parent / "bench.py")
        .read_text()
        .split("def median_time")[0],
        ns,
    )
    data = ns["build_corpus"]()[: 4 * 1024 * 1024]
    comp = block.compress(data)
    n = len(data)
    seq = parse_sequences_host(np.frombuffer(comp, np.uint8))
    print(f"n={n} nseq={seq.nseq} ratio={len(comp)/n:.4f}")

    s = build_maps(seq, n)
    un0 = (s >= 0).mean()
    print(f"unresolved after mod trick: {un0:.1%} (match-byte frac "
          f"{(seq.match_len.sum()/n):.1%})")

    d1 = decay(s, n, doubling=False)
    print("one-hop rounds:", " -> ".join(f"{r:.2%}" for r in d1))
    d2 = decay(s, n, doubling=True)
    print("doubling rounds:", " -> ".join(f"{r:.2%}" for r in d2))

    # final fragment structure
    sr = s.copy()
    while (sr >= 0).any():
        g = sr[np.clip(sr, 0, n - 1)]
        sr = np.where(sr >= 0, g, sr)
    k = -sr - 1  # comp-space source
    d = k - np.arange(n)
    bnd = np.empty(n, bool)
    bnd[0] = True
    bnd[1:] = d[1:] != d[:-1]
    nfrag = int(bnd.sum())
    print(f"fragments: {nfrag} (avg {n/nfrag:.2f} B)")
    fid = np.cumsum(bnd) - 1
    for W in (16, 32):
        ncells = n // W
        cf = fid[: ncells * W].reshape(ncells, W)
        kk = cf.max(axis=1) - cf.min(axis=1) + 1
        inc = int(kk.sum())
        print(
            f"W={W}: incidences {inc} ({inc/ncells:.2f}/cell), "
            f"K-dist: " + " ".join(
                f"<={K}:{(kk <= K).mean():.1%}" for K in (2, 4, 6, 8, 12, 16)
            )
        )

    # how far back do resolved sources reach? (materialization gather span)
    # and hop-target distance (always <= 64K by construction)
    print(f"max source distance (p - k): {int((np.arange(n) - k).max())}")


if __name__ == "__main__":
    main()
