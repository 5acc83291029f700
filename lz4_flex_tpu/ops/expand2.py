"""Device block decode v2: fragment-structured expansion.

Round 1's expansion (`ops/decode.py:expand_core`) resolved the per-byte
source map with dense pointer-doubling (scalar gathers at ~110 M elem/s on
XLA:TPU) and materialized with one more per-byte gather — ~765 ms for 10 MB.
This kernel exploits the map's *fragment* structure instead: the resolved
source map is piecewise-affine with ~4-byte fragments (measured,
experiments/moddepth.py), so consecutive output bytes share a source delta
and every per-byte gather pass can become a per-(cell, fragment) *row*
gather — the measured row/slice-gather economics (PERF.md: 142 M rows/s at
16-byte rows vs 110 M single elements/s) amortize the per-instance cost
~10x.

Three stages, mirroring the reference decoder's responsibilities
(lz4_flex src/block/decompress.rs:244-444) as data-parallel array passes:

  1. map build (elementwise): the piecewise-affine source map from the
     sequence table via two sparse scatter-adds + tiled cumsums, with
     self-overlapping matches (offset < length, the RLE case that makes
     chains deep: src/block/decompress_safe.rs:301-318) collapsed
     analytically at build time: src(p) = mstart - off + (p - mstart) % off
     always lands strictly before the match segment.
  2. resolution: cell-structured pointer doubling. Each W-byte output cell
     extracts the <=K distinct source deltas among its unresolved bytes
     (cheap per-row ops: equal deltas are contiguous because fragments are
     intervals) and performs s <- s[s] for all covered bytes with K row
     gathers per cell. Lanes beyond rank K simply wait a round (still
     correct: every hop strictly decreases s, so progress is monotone).
     A compacted per-byte tail loop finishes the stragglers.
  3. materialization: the cell-pull (validated byte-exact in
     experiments/cellpull_sim.py). Each 16-byte output cell pulls its first
     K2 fragments as unaligned 5-word row gathers + funnel shifts and
     combines with per-lane selects; cells with more fragments are compacted
     and finished in a second tier (a W2-byte cell can hold at most W2
     fragments, so two tiers of W2/2 ranks are exhaustive).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import packing

_INT_MIN = jnp.iinfo(jnp.int32).min
_MAX_TAIL_ROUNDS = 40  # chains deeper than 2^40 bytes cannot exist


def _row_gather(operand: jnp.ndarray, starts: jnp.ndarray, width: int) -> jnp.ndarray:
    """Gather fixed-width contiguous rows at dynamic starts: (N,) starts ->
    (N, width).

    Form matters enormously on XLA:TPU (measured, experiments/
    rowgather_forms.py): vmap(dynamic_slice) lowers scalar (0.6-30 M rows/s),
    whereas an ALIGNED whole-row 2-D gather runs ~92 M rows/s at any width.
    So: reshape the operand to (R, width) rows, fetch the two aligned rows
    covering the span (2 gathers), and extract the unaligned window with a
    static-roll select ladder (elementwise; the take_along_axis form is 13x
    slower). Net ~127 M rows/s at width 8 — 10-200x over the naive form.
    """
    n = operand.shape[0]
    rem = (-n) % width
    if rem:
        operand = jnp.concatenate([operand, jnp.zeros(rem, operand.dtype)])
    tbl = operand.reshape(-1, width)
    R = tbl.shape[0]
    q = jnp.clip(starts, 0, n - 1) // width
    sh = jnp.clip(starts, 0, n - 1) % width
    a = tbl[q]
    b = tbl[jnp.clip(q + 1, 0, R - 1)]
    rows2 = jnp.concatenate([a, b], axis=1)
    # Static-slice select ladder: every rows2[:, t:t+width] window is a free
    # view, and XLA fuses the whole ladder into one elementwise pass. (A
    # log-depth barrel shifter built from concat-rolls measured 2x SLOWER —
    # each conditional roll is a real cross-lane relayout.)
    out = rows2[:, :width]
    for t in range(1, width):
        out = jnp.where((sh == t)[:, None], rows2[:, t : t + width], out)
    return out


def _cell_ranks(d: jnp.ndarray, active: jnp.ndarray):
    """Per-cell distinct-run ranking of source deltas.

    d, active: (ncells, W). Equal deltas within a cell are contiguous runs
    (fragments are intervals), so run starts mark distinct fragments. Returns
    (rank, bnd): rank[c, l] = index of lane l's fragment among the cell's
    active fragments (valid where active), bnd = run-start flags.
    """
    prev_same = jnp.concatenate(
        [
            jnp.zeros((d.shape[0], 1), dtype=bool),
            (d[:, 1:] == d[:, :-1]) & active[:, :-1],
        ],
        axis=1,
    )
    bnd = active & ~prev_same
    rank = jnp.cumsum(bnd.astype(jnp.int32), axis=1) - 1
    return rank, bnd


def _rank_value(d, bnd, rank, j):
    """The shared delta of fragment-rank j per cell: (ncells,) int32."""
    return jnp.max(jnp.where(bnd & (rank == j), d, _INT_MIN), axis=1)


def build_source_map(
    seq_oo,
    seq_ls,
    seq_ll,
    seq_mo,
    dict_len,
    total_out,
    *,
    out_pad,
    comp_pad,
    dict_bytes,
    prev_off=None,
):
    """Stage 1: per-byte source map, self-overlap collapsed analytically.

    Encoding: s[p] >= 0 -> unresolved, source is *output* position s[p]
    (always < p); s[p] < 0 -> resolved, source byte index -(s[p]+1) into the
    concatenated [compressed | dictionary] byte space.

    ``prev_off``: the previous *real* sequence's match offset per sequence
    (same shape as seq_mo). Defaults to the flat shift, which is correct for
    order-packed tables; lane-major (strided-parse) tables must supply it.
    """
    zvar = seq_mo[0] * 0  # thread input variance onto constant-built arrays
    pout = jnp.arange(out_pad, dtype=jnp.int32) + zvar
    off_i = jnp.maximum(seq_mo, 1)
    c_i = seq_ls - seq_oo
    if prev_off is None:
        prev_off = jnp.concatenate([jnp.zeros(1, jnp.int32) + zvar, off_i[:-1]])
    lit_starts = seq_oo  # padding seqs carry out_off == out_pad -> dropped
    match_starts = jnp.clip(seq_oo + seq_ll, 0, out_pad)

    V = jnp.zeros(out_pad, dtype=jnp.int32) + zvar
    V = V.at[lit_starts].add(c_i - prev_off, mode="drop")
    V = V.at[match_starts].add(off_i - c_i, mode="drop")
    V = packing.tiled_cumsum(V)

    F = jnp.zeros(out_pad, dtype=jnp.int32) + zvar
    F = F.at[lit_starts].add(1, mode="drop")
    F = F.at[match_starts].add(-1, mode="drop")
    F = packing.tiled_cumsum(F)

    # Latest match-segment start at/before p (literal positions don't care).
    M = jnp.zeros(out_pad, dtype=jnp.int32) + zvar
    M = M.at[match_starts].max(match_starts, mode="drop")
    M = packing.tiled_cummax(M)

    is_lit = F > 0
    lit_k = pout + V
    off = jnp.maximum(V, 1)  # V == match offset on match segments
    rel = pout - M
    # Self-overlap collapse: for rel < off this is just p - off; for
    # rel >= off it lands the RLE chain's true source, strictly before M.
    src = M - off + rel % off
    dict_k = comp_pad + jnp.clip(dict_len + src, 0, max(dict_bytes - 1, 0))
    s = jnp.where(
        is_lit,
        -(lit_k + 1),
        jnp.where(src >= 0, src, -(dict_k + 1)),
    )
    # Padding bytes: resolved with k = p so the padding region of every cell
    # shares one delta (d = 0) and cannot inflate fragment ranks.
    s = jnp.where(pout < total_out, s, -(pout + 1))
    return s


def resolve_cells(s: jnp.ndarray, *, out_pad, W=16, K=4, dense_rounds=3, tail_k=8):
    """Stage 2: collapse match chains.

    Doubling at cell granularity throughout: a couple of dense rounds over
    every cell, then the surviving cells (a shrinking fraction — the measured
    per-byte doubling decay is 34% -> 15% -> 4% -> 0.8% -> 0.04%) are
    COMPACTED into a cell-index workset and chased there with the same
    row-gather pull, writing whole cells back with a row-granular scatter
    (both sides run at ~100 M rows/s vs ~86 M single updates/s — and each
    instance moves a whole cell). A dense scalar loop remains as the
    correctness fallback for workset overflow (pathological inputs).
    """
    ncells = out_pad // W
    # `+ s[0]*0` threads the input's device-variance onto constant-built
    # arrays — shard_map's vma check rejects ops mixing invariant constants
    # with sharded data inside cond/scatter.
    zvar = s[0] * 0
    lane = jnp.arange(W, dtype=jnp.int32) + zvar
    cellstart = jnp.arange(ncells, dtype=jnp.int32) * W + zvar

    def cell_round(sv, cs, sflat, k):
        """One doubling hop for the cells starting at byte offsets ``cs``:
        sv (n, W) current values, sflat the full map. Lanes whose fragment
        rank exceeds ``k`` wait a round (still correct: hops strictly
        decrease s, so progress is monotone)."""
        un = sv >= 0
        d = sv - (cs[:, None] + lane[None, :])
        rank, bnd = _cell_ranks(d, un)
        sg = jnp.concatenate([jnp.zeros(W, jnp.int32) + zvar, sflat])
        new = sv
        for j in range(k):
            vj = _rank_value(d, bnd, rank, j)
            base = jnp.clip(cs + vj + W, 0, out_pad)
            rows = _row_gather(sg, base, W)
            new = jnp.where(un & (rank == j), rows, new)
        return new

    for _ in range(dense_rounds):
        sv = cell_round(s.reshape(ncells, W), cellstart, s, K)
        s = sv.reshape(-1)

    # Compact surviving cells into a workset of cell indices.
    ws = max(1024, ncells // 4)
    active = jnp.any(s.reshape(ncells, W) >= 0, axis=1)
    cnt = jnp.sum(active.astype(jnp.int32))
    crank = packing.tiled_cumsum(active.astype(jnp.int32)) - 1
    cells_i = jnp.arange(ncells, dtype=jnp.int32) + zvar
    # Sentinel entries point at cell 0 (resolved in any valid stream —
    # the first output byte is a literal); their write-back is a no-op.
    cidx = (jnp.zeros(ws, dtype=jnp.int32) + zvar).at[
        jnp.where(active, crank, ws)
    ].set(cells_i, mode="drop")

    def cond(carry):
        _, act, i = carry
        return jnp.logical_and(act, i < _MAX_TAIL_ROUNDS)

    def compact_body(carry):
        s, _, i = carry
        sv = s.reshape(ncells, W)[cidx]
        new = cell_round(sv, cidx * W, s, tail_k)
        s = s.reshape(ncells, W).at[cidx].set(new).reshape(-1)
        return s, jnp.any(new >= 0), i + 1

    def dense_body(carry):
        s, _, i = carry
        g = s[jnp.clip(s, 0, out_pad - 1)]
        s = jnp.where(s >= 0, g, s)
        return s, jnp.any(s >= 0), i + 1

    def run(body):
        return lambda s: jax.lax.while_loop(cond, body, (s, cnt > 0, jnp.int32(0)))[0]

    s = jax.lax.cond(cnt <= ws, run(compact_body), lambda x: x, s)
    # Fallback finishes anything left (workset overflow, or lanes that kept
    # waiting behind rank > tail_k in a pathological cell).
    return jax.lax.cond(
        jnp.any(s >= 0), run(dense_body), lambda x: x, s
    )


def materialize_cells(
    s: jnp.ndarray, words_g: jnp.ndarray, *, out_pad, guard_words, W=16, K=8
):
    """Stage 3: cell-pull. ``words_g`` is the guarded concatenated
    [zeros(guard) | compressed | dict | zeros(guard+2)] uint32 word buffer;
    ``s`` must be fully resolved (all negative)."""
    ncells = out_pad // W
    wslice = W // 4 + 1
    zvar = s[0] * 0  # thread input variance onto constant-built arrays
    lane = jnp.arange(W, dtype=jnp.int32) + zvar
    cellstart = jnp.arange(ncells, dtype=jnp.int32) * W + zvar
    pos = cellstart[:, None] + lane[None, :]
    nwords = words_g.shape[0]

    k = (-s - 1).reshape(ncells, W)
    d = k - pos
    all_on = jnp.ones((ncells, W), dtype=bool)
    rank, bnd = _cell_ranks(d, all_on)

    def pull(j, d, bnd, rank, cs):
        vj = _rank_value(d, bnd, rank, j)
        b = cs + vj  # byte base of the source row (>= -(W-1))
        wb = jnp.clip((b >> 2) + guard_words, 0, nwords - wslice - 1)
        sh = (b & 3).astype(jnp.uint32)
        rows = _row_gather(words_g, wb, wslice + 1)  # (n, wslice+1) uint32
        cols = []
        for l in range(W):
            lo = rows[:, l // 4]
            hi = rows[:, l // 4 + 1]
            t = sh + l
            w = jnp.where((t >> 2) == (l // 4), lo, hi)
            cols.append((w >> ((t & 3) * 8)) & 0xFF)
        return jnp.stack(cols, axis=1), rank == j  # (n, W) bytes, take mask

    out = jnp.zeros((ncells, W), dtype=jnp.uint32) + zvar.astype(jnp.uint32)
    for j in range(K):
        bytes_j, take = pull(j, d, bnd, rank, cellstart)
        out = jnp.where(take, bytes_j, out)

    # Tier 2: cells whose fragment count exceeds K. A W-byte cell has at most
    # W fragments, so ranks K..W-1 are exhaustive. Compact those cells (a few
    # percent, measured) and finish them with the same pull.
    over = jnp.max(rank, axis=1) >= K
    ws = max(256, ncells // 8)
    cnt = jnp.sum(over.astype(jnp.int32))
    crank = packing.tiled_cumsum(over.astype(jnp.int32)) - 1
    cidx = (jnp.zeros(ws, dtype=jnp.int32) + zvar).at[
        jnp.where(over, crank, ws)
    ].set(jnp.arange(ncells, dtype=jnp.int32) + zvar, mode="drop")

    def tier2(out):
        cs2 = cidx * W
        d2 = _row_gather(d.reshape(-1), cs2, W)
        r2 = _row_gather(rank.reshape(-1), cs2, W)
        b2 = _row_gather(bnd.reshape(-1).astype(jnp.int32), cs2, W) > 0
        vals = out.reshape(-1)
        for j in range(K, W):
            bytes_j, take = pull(j, d2, b2, r2, cs2)
            flat = jnp.where(take, cs2[:, None] + lane[None, :], out_pad)
            vals = vals.at[flat.reshape(-1)].set(
                bytes_j.reshape(-1), mode="drop"
            )
        return vals.reshape(ncells, W)

    out = jax.lax.cond(cnt > 0, tier2, lambda o: o, out)
    # cnt > ws would drop cells; guard by a scalar-gather fallback for the
    # (never-seen-in-practice) overflow: every byte individually.
    def fallback(out):
        kk = (-s - 1) + guard_words * 4
        w = words_g[jnp.clip(kk >> 2, 0, nwords - 1)]
        return (
            ((w >> ((kk & 3).astype(jnp.uint32) * 8)) & 0xFF).reshape(ncells, W)
        )

    out = jax.lax.cond(cnt > ws, fallback, lambda o: o, out)
    return out.reshape(-1).astype(jnp.uint8)


def expand2_core(
    comp_words: jnp.ndarray,  # (COMP_PAD/4,) uint32 — packed compressed bytes
    dict_words: jnp.ndarray,  # (DICT_PAD/4,) uint32 — packed dictionary bytes
    seq_oo: jnp.ndarray,  # (NSEQ_PAD,) int32 — output offset per sequence
    seq_ls: jnp.ndarray,  # (NSEQ_PAD,) int32 — literal start (compressed pos)
    seq_ll: jnp.ndarray,  # (NSEQ_PAD,) int32 — literal length
    seq_mo: jnp.ndarray,  # (NSEQ_PAD,) int32 — match offset
    dict_len: jnp.ndarray,  # () int32
    total_out: jnp.ndarray,  # () int32
    *,
    out_pad: int,
    has_dict: bool,
    res_w: int = 16,
    res_k: int = 4,
    dense_rounds: int = 3,
    mat_w: int = 16,
    mat_k: int = 8,
) -> jnp.ndarray:
    """Drop-in replacement for ops.decode.expand_core (same signature and
    output contract) using the fragment-structured three-stage pipeline."""
    comp_pad = comp_words.shape[0] * 4
    dict_bytes = dict_words.shape[0] * 4 if has_dict else 0

    s = build_source_map(
        seq_oo,
        seq_ls,
        seq_ll,
        seq_mo,
        dict_len,
        total_out,
        out_pad=out_pad,
        comp_pad=comp_pad,
        dict_bytes=dict_bytes,
    )
    s = resolve_cells(s, out_pad=out_pad, W=res_w, K=res_k, dense_rounds=dense_rounds)

    guard_words = mat_w // 4
    zw = comp_words[0] * 0
    parts = [jnp.zeros(guard_words, jnp.uint32) + zw, comp_words]
    if has_dict:
        parts.append(dict_words)
    # Tail pad >= the pow2 gather width so clipping never shifts a valid read.
    parts.append(jnp.zeros(guard_words + 8, jnp.uint32) + zw)
    words_g = jnp.concatenate(parts)
    return materialize_cells(
        s, words_g, out_pad=out_pad, guard_words=guard_words, W=mat_w, K=mat_k
    )
