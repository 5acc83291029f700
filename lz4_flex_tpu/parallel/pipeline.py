"""Sharded block pipelines: frame blocks data-parallel over the mesh.

Encode: frame blocks are independent compression problems even in linked
mode (each block's 64 KiB dictionary is a slice of the *input*, known
upfront — the reference's sequential window rotation at
src/frame/compress.rs:327-356 is a streaming artifact, not a data
dependency), so both modes shard data-parallel: stage (B, S) blocks, run the
batched encode kernel under shard_map, gather (lengths, payloads) in frame
order on the host.

Decode: independent-mode blocks shard the same way with a fused
parse+expand kernel per block. Linked-mode decode has cross-block *output*
dependencies; ops.decode.decode_parts_fused resolves them globally instead
(one merged sequence table over the whole frame).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..spec.constants import WINDOW_SIZE, get_maximum_output_size
from ..ops import packing
from ..ops.decode import decode_resident_core as _decode_one
from ..ops.encode import encode_chunk_core
from .mesh import BLOCK_AXIS, codec_mesh

try:  # jax >= 0.4.35 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

P = jax.sharding.PartitionSpec


# ---------------------------------------------------------------------------
# Multi-process-safe fetches
# ---------------------------------------------------------------------------


def fetch_global(x, *, force_replicate: bool = False) -> np.ndarray:
    """Fetch a (possibly cross-host-sharded) jax.Array's global value.

    Single-process meshes read the array directly. On a multi-process mesh
    the shards on other hosts are NOT addressable (``np.asarray`` raises), so
    the array is first replicated with an on-device all-gather over its own
    mesh — lengths and payloads ride ICI/DCN, the frame assembly then runs
    identically on every host — and only addressable data is read back.
    ``force_replicate`` takes the multi-process path even when everything is
    addressable (the dryrun uses it to validate the N-host assembly path on a
    virtual mesh).
    """
    if getattr(x, "is_fully_addressable", True) and not force_replicate:
        return np.asarray(x)
    sharding = x.sharding
    mesh = getattr(sharding, "mesh", None)
    if mesh is None:  # pragma: no cover - single-device arrays are addressable
        return np.asarray(x)
    replicated = jax.jit(
        lambda a: a,
        out_shardings=jax.sharding.NamedSharding(mesh, P()),
    )(x)
    return np.asarray(replicated.addressable_data(0))


# ---------------------------------------------------------------------------
# Host staging
# ---------------------------------------------------------------------------


def stage_blocks(
    data,
    block_size: int,
    *,
    linked: bool = False,
    pad_rows_to: int = 1,
    start: int = 0,
):
    """Split ``data[start:]`` into frame blocks staged as a dense (B, D+S)
    uint8 array plus per-block (dict_len, total_len) vectors.

    In linked mode each row is prefixed with the previous 64 KiB of input
    (its dictionary); ``data[:start]`` is window context only (the carry from
    blocks already written by a streaming encoder) — block 0's dictionary is
    its tail. ``pad_rows_to`` pads the batch with empty rows so B divides the
    mesh size.
    """
    buf = np.frombuffer(data, np.uint8) if not isinstance(data, np.ndarray) else data
    n = buf.shape[0] - start
    nblocks = max(1, -(-n // block_size))
    b_pad = -(-nblocks // pad_rows_to) * pad_rows_to
    w = WINDOW_SIZE if linked else 0
    width = packing.size_bucket(w + block_size + 4)
    rows = np.zeros((b_pad, width), dtype=np.uint8)
    dlen = np.zeros(b_pad, dtype=np.int32)
    tlen = np.zeros(b_pad, dtype=np.int32)
    for i in range(nblocks):
        s = start + i * block_size
        blk = buf[s : s + block_size]
        d = min(w, s)
        rows[i, : d + blk.shape[0]] = buf[s - d : s + blk.shape[0]]
        dlen[i] = d
        tlen[i] = d + blk.shape[0]
    return rows, dlen, tlen, nblocks


# ---------------------------------------------------------------------------
# Batched kernels
# ---------------------------------------------------------------------------


def _encode_batch(rows, words, dlen, tlen, *, levels, comp_pad, nseq_pad):
    f = partial(
        encode_chunk_core, levels=levels, comp_pad=comp_pad, nseq_pad=nseq_pad
    )
    out, total = jax.vmap(f)(rows, words, dlen, tlen)
    return out, total


def _decode_batch(rows, clen, *, out_pad, nseq_pad, capacity=None):
    from ..ops.parse import default_parse_engine

    f = partial(
        _decode_one,
        out_pad=out_pad,
        nseq_pad=nseq_pad,
        parse_engine=default_parse_engine(),
        capacity=capacity,
    )
    return jax.vmap(f)(rows, clen)


# ---------------------------------------------------------------------------
# Sharded entry points
# ---------------------------------------------------------------------------


def encode_blocks_sharded(
    data,
    block_size: int,
    *,
    linked: bool = False,
    mesh=None,
    verify: bool = True,
    carry: bytes = b"",
):
    """Compress ``data`` as frame blocks, data-parallel over the mesh.

    Returns (payloads: list[bytes], block_lens: list[int]) in frame order;
    the frame layer wraps them in BlockInfo words and checksums.

    ``carry`` is the linked-mode window context preceding ``data`` (the tail
    of blocks a streaming encoder already wrote) — at most 64 KiB is used.

    ``verify`` roundtrips every payload through the independent host decoder
    and re-encodes mismatching blocks with the host encoder — the guard
    against LCP fingerprint collisions (~2^-32/compare, ops/encode.py), which
    can otherwise emit a corrupt block. Payloads are already on the host for
    frame assembly, so the check costs one host decode pass, no extra
    transfers.
    """
    from ..ops.encode import _CHUNK_C

    carry = bytes(carry)[-WINDOW_SIZE:] if linked else b""

    if mesh is None:
        mesh = codec_mesh()
    if mesh.devices.size == 1 and block_size >= _CHUNK_C:
        # One device: the mesh adds nothing, so chunk-scale blocks route
        # through the hybrid encoder (device exact-candidate search + native
        # walk) — ~2x the ratio and ~18x the throughput of the all-device
        # kernel on one chip. Output is spec-valid by construction (every
        # candidate is re-extended with exact byte compares), so the
        # fingerprint-collision verify pass is unnecessary.
        from ..ops.encode import compress_block_hybrid

        buf = bytes(data)
        payloads, lens = [], []
        window = carry
        for pos in range(0, max(len(buf), 1), block_size):
            blk = buf[pos : pos + block_size]
            payloads.append(
                compress_block_hybrid(blk, ext_dict=window if linked else b"")
            )
            lens.append(len(blk))
            if linked:
                window = ((window + blk) if len(blk) < WINDOW_SIZE else blk)[
                    -WINDOW_SIZE:
                ]
        return payloads, lens

    if block_size > _CHUNK_C:
        # Blocks above the fixed chunk width use the host-orchestrated
        # chunked device encoder per block (keeps kernel shapes fixed).
        from ..ops.encode import compress_block_device

        buf = bytes(data)
        payloads, lens = [], []
        window = carry
        for pos in range(0, max(len(buf), 1), block_size):
            blk = buf[pos : pos + block_size]
            payloads.append(
                compress_block_device(
                    blk, ext_dict=window if linked else b"", verify=verify
                )
            )
            lens.append(len(blk))
            if linked:
                window = ((window + blk) if len(blk) < WINDOW_SIZE else blk)[
                    -WINDOW_SIZE:
                ]
        return payloads, lens

    ndev = mesh.devices.size
    if carry:
        data = carry + bytes(data)
    rows, dlen, tlen, nblocks = stage_blocks(
        data, block_size, linked=linked, pad_rows_to=ndev, start=len(carry)
    )
    width = rows.shape[1]
    levels = min(12, max(2, (width - 1).bit_length()))
    comp_pad = packing.size_bucket(get_maximum_output_size(block_size))
    nseq_pad = packing.size_bucket(max(8, width // 4 + 2), minimum=256)
    words = rows.view("<u4")

    spec = P(BLOCK_AXIS)
    f = partial(_encode_batch, levels=levels, comp_pad=comp_pad, nseq_pad=nseq_pad)
    sharded = jax.jit(
        shard_map(
            f,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(spec, spec),
        )
    )
    out, total = sharded(
        jnp.asarray(rows), jnp.asarray(words), jnp.asarray(dlen), jnp.asarray(tlen)
    )
    out_h = fetch_global(out)
    total_h = fetch_global(total)
    payloads = [out_h[i, : total_h[i]].tobytes() for i in range(nblocks)]
    lens = [int(tlen[i] - dlen[i]) for i in range(nblocks)]
    if verify:
        # Zero-write native verify walk per payload (the fingerprint-
        # collision guard; see ops/encode.py:_finish_device_block) —
        # replaces the old decode-then-compare pass at ~1/10 the cost.
        from .. import native as _native
        from ..block import compress_with_dict

        buf = rows  # staged rows hold dict ++ data per block
        for i in range(nblocks):
            d, t = int(dlen[i]), int(tlen[i])
            try:
                ok = _native.verify_block(payloads[i], buf[i, d:t], buf[i, :d])
            except Exception:
                ok = False
            if not ok:  # pragma: no cover - fingerprint collision path
                payloads[i] = compress_with_dict(
                    buf[i, d:t].tobytes(), buf[i, :d].tobytes()
                )
    return payloads, lens


def roundtrip_step_sharded(data, block_size: int, *, mesh=None):
    """One full sharded codec step under a single jit: batched encode on each
    shard, an all-gather of compressed lengths over the mesh (the frame
    assembly plan — the ordered-gather collective of SURVEY.md §2.3), then
    batched decode and an on-device roundtrip check.

    This is the "training step" analog the multi-chip dry run compiles: it
    exercises the real data-parallel shardings plus the ICI collective.
    Returns (comp_payload_rows, comp_lens, assembly_offsets, ok_flag).
    """
    if mesh is None:
        mesh = codec_mesh()
    ndev = mesh.devices.size
    rows, dlen, tlen, nblocks = stage_blocks(data, block_size, pad_rows_to=ndev)
    width = rows.shape[1]
    levels = min(12, max(2, (width - 1).bit_length()))
    comp_pad = packing.size_bucket(get_maximum_output_size(block_size))
    out_pad = packing.size_bucket(block_size)
    enc_nseq_pad = packing.size_bucket(max(8, width // 4 + 2), minimum=256)
    dec_nseq_pad = packing.size_bucket(max(8, comp_pad // 3 + 2), minimum=256)

    def step(rows, words, dlen, tlen):
        comp, total = _encode_batch(
            rows, words, dlen, tlen,
            levels=levels, comp_pad=comp_pad, nseq_pad=enc_nseq_pad,
        )
        all_lens = jax.lax.all_gather(total, BLOCK_AXIS, tiled=True)
        offsets = jnp.cumsum(all_lens) - all_lens
        out, out_total, _errs = _decode_batch(
            comp, total, out_pad=out_pad, nseq_pad=dec_nseq_pad
        )
        blen = tlen - dlen
        pos = jnp.arange(out_pad, dtype=jnp.int32)[None, :]
        mask = pos < blen[:, None]
        w = min(out_pad, rows.shape[1])
        ok = jnp.all(
            jnp.where(mask[:, :w], out[:, :w] == rows[:, :w], True)
        ) & jnp.all(out_total == blen)
        ok = jax.lax.pmin(ok.astype(jnp.int32), BLOCK_AXIS)
        return comp, total, offsets, ok

    spec = P(BLOCK_AXIS)
    # offsets and the ok flag are all-gathered/reduced inside the step —
    # replicated outputs, not per-shard ones; the static replication checker
    # cannot infer that through the gather+cumsum, hence check_vma=False.
    try:
        smap = shard_map(
            step,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(spec, spec, P(), P()),
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax spells it check_rep
        smap = shard_map(
            step,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(spec, spec, P(), P()),
            check_rep=False,
        )
    sharded = jax.jit(smap)
    return sharded(
        jnp.asarray(rows),
        jnp.asarray(rows.view("<u4")),
        jnp.asarray(dlen),
        jnp.asarray(tlen),
    )


import os as _os
import threading as _threading
from concurrent.futures import ThreadPoolExecutor as _TPE

_plan_pool_lock = _threading.Lock()
_plan_pool: list = [None]


def _plan_executor() -> _TPE:
    """Persistent thread pool for concurrent per-device plan builds.

    Persistent (not per-call) because each worker thread owns a rotating
    ~50 MB record-array pool (ops/ringdecode.py:_record_arrays is
    thread-local); a fresh pool per call would re-pay the page-fault storm
    the pooling exists to avoid."""
    with _plan_pool_lock:
        if _plan_pool[0] is None:
            _plan_pool[0] = _TPE(
                max_workers=max(2, _os.cpu_count() or 2),
                thread_name_prefix="tlz4-plan",
            )
        return _plan_pool[0]


def _stage_ring_group(g, block_size: int, nthreads: int):
    """Parse + plan-build + copy-out for one device's block span.

    Returns (arrs, sizes) with pool-independent arrays, ([], sizes) for an
    all-empty span, or None when the span does not fit the static plan
    shape. Runs on the plan executor — the native parse/build calls release
    the GIL, so G groups build concurrently (SCALING.md §3's one-host-feeds-
    N-chips premise) with the builder's internal lanes split G ways.
    """
    from .. import native as _native
    from ..ops import ringdecode as RD

    parts = [(np.frombuffer(p, np.uint8), True) for p in g]
    sizes = []
    for q, _ in parts:
        n_out = _native.measure_block(q)
        if n_out > block_size:
            from ..block import errors as block_errors

            raise block_errors.OutputTooSmall(n_out, block_size)
        sizes.append(n_out)
    total = int(sum(sizes))
    if total == 0:
        return [], sizes
    plan, _ = RD.build_ring_plan_parts(
        parts, total, independent=True, nthreads=nthreads
    )
    if plan is None:
        return None
    arrs = list(RD.ring_plan_device_arrays(plan))
    # Copy the record fields out (they may be pool-backed views this
    # thread's next build would reuse), sliced to the fire rows this group
    # can actually execute — typical plans use about half the static NFMAX
    # allocation, so this halves staging memory and upload bytes.
    nf_used = max(8, -(-int(plan.nf_tot.max() or 1) // 8) * 8)
    nf_used = min(nf_used, arrs[3].shape[1])
    dnt_b = arrs[0].shape[0]
    nfw_full = arrs[1].shape[0] // dnt_b
    nfw_used = -(-nf_used // 32)
    # .copy(), NOT ascontiguousarray: a sliced view with a size-1
    # leading dim counts as contiguous, and ascontiguousarray would
    # return the pool-backed view itself — which the 2-generation plan
    # pool then overwrites two builds later (observed corruption).
    arrs[1] = (
        arrs[1].reshape(dnt_b, nfw_full)[:, :nfw_used].copy().reshape(-1)
    )
    arrs[2] = arrs[2].copy()  # literal image (pool-backed too)
    for k in range(3, 6):
        arrs[k] = arrs[k][:, :nf_used].copy()
    return arrs, sizes


def stage_ring_groups(groups, block_size: int):
    """Build every group's ring plan CONCURRENTLY on the plan executor.

    Returns the staged list (None entries for empty groups), or None when
    any group overflows the static plan shape. Concurrent builds run at ONE
    internal lane each (``nthreads=1`` skips the native WorkPool entirely —
    its job mutex would convoy concurrent multi-lane builds); the executor
    provides the parallelism across groups instead. On a host with >= G
    cores the per-chip builds overlap end to end (plan wall ≈ slowest
    single group, not the sum — benchmarks/scaling.py reports the wall as
    devices grow)."""
    live = sum(1 for g in groups if g)
    if live == 0:
        return [None if not g else ([], []) for g in groups]
    if live == 1:
        staged = []
        for g in groups:
            staged.append(_stage_ring_group(g, block_size, 0) if g else None)
        return None if any(s is None and g for s, g in zip(staged, groups)) else staged
    ex = _plan_executor()
    futs = [
        ex.submit(_stage_ring_group, g, block_size, 1) if g else None
        for g in groups
    ]
    staged = [f.result() if f is not None else None for f in futs]
    if any(f is not None and s is None for f, s in zip(futs, staged)):
        return None
    return staged


def decode_blocks_sharded_ring(payloads, block_size: int, *, mesh=None,
                               interpret: bool | None = None):
    """Ring-engine mesh decode: each device runs the production Pallas ring
    kernel on its contiguous span of independent blocks.

    Per-device plan build (each host plans its addressable blocks — SURVEY
    §2.3's inter-block parallelism; reference analog: independent blocks,
    /root/reference/src/frame/header.rs:85-87) runs CONCURRENTLY per group
    on a host thread pool, plans padded to one static shape and sharded
    over the mesh, ONE shard_map dispatch fires every chip's kernel.
    Returns list[bytes], or None when any span does not fit the static plan
    shape (caller falls back to the XLA expansion path). ``interpret``
    defaults to True off-TPU so the virtual CPU mesh (tests, dryrun)
    executes the same code path.
    """
    from ..ops import ringdecode as RD

    if mesh is None:
        mesh = codec_mesh()
    devs = mesh.devices.reshape(-1)
    ndev = int(devs.size)
    if interpret is None:
        interpret = devs[0].platform != "tpu"
    nblocks = len(payloads)
    per = -(-nblocks // ndev) if nblocks else 1
    groups = [payloads[i * per : (i + 1) * per] for i in range(ndev)]

    staged = stage_ring_groups(groups, block_size)
    if staged is None:
        return None

    live = [s for s in staged if s and s[0]]
    if not live:
        return [b"" for _ in payloads]
    nt = max(s[0][0].shape[0] for s in live)
    nf = max(s[0][3].shape[1] for s in live)
    rb = live[0][0][3].shape[2]
    nfw = -(-nf // 32)
    tr = RD.TILE_ROWS

    nft = np.zeros((ndev, nt), np.int32)
    fp = np.zeros((ndev, nt * nfw), np.int32)
    init = np.zeros((ndev, nt * tr, 128), np.uint8)
    f0 = np.zeros((ndev, nt, nf, rb), np.int32)
    f1 = np.zeros((ndev, nt, nf, rb), np.int32)
    f2 = np.zeros((ndev, nt, nf, rb), np.int32)
    for d, s in enumerate(staged):
        if not s or not s[0]:
            continue
        a = s[0]
        dnt, dnf = a[0].shape[0], a[3].shape[1]
        dnfw = -(-dnf // 32)
        nft[d, :dnt] = a[0]
        fp[d].reshape(nt, nfw)[:dnt, :dnfw] = a[1].reshape(dnt, dnfw)
        init[d, : a[2].shape[0]] = a[2]
        f0[d, :dnt, :dnf] = a[3]
        f1[d, :dnt, :dnf] = a[4]
        f2[d, :dnt, :dnf] = a[5]

    kc = RD._kernel_call(nt, nf, RB_=rb, interpret=interpret)
    spec = P(BLOCK_AXIS)

    def one(nft_, fp_, init_, f0_, f1_, f2_):
        out = kc(nft_[0], fp_[0], init_[0], f0_[0], f1_[0], f2_[0])
        # cast to bytes on device: fetching the kernel's int32 lanes raw
        # would move 4x the decoded bytes per chip over PCIe
        return out.astype(jnp.uint8)[None]

    # pallas_call's out_shape carries no vma annotation, so the static
    # replication checker cannot see through it — disable it (same story as
    # roundtrip_step_sharded's gather).
    try:
        smap = shard_map(
            one, mesh=mesh, in_specs=(spec,) * 6, out_specs=spec,
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax spells it check_rep
        smap = shard_map(
            one, mesh=mesh, in_specs=(spec,) * 6, out_specs=spec,
            check_rep=False,
        )
    sharded = jax.jit(smap)
    sh = jax.sharding.NamedSharding(mesh, spec)
    out = sharded(*(
        jax.device_put(x, sh)
        for x in (nft, fp, init, f0, f1, f2)
    ))
    out_h = fetch_global(out)

    blocks: list[bytes] = []
    for d, s in enumerate(staged):
        if s is None:
            continue
        arrs_d, sizes = s
        if not arrs_d:  # all-empty group: every block decodes to b""
            blocks.extend(b"" for _ in sizes)
            continue
        flat = out_h[d].reshape(-1)
        pos = 0
        for sz in sizes:
            blocks.append(flat[pos : pos + sz].tobytes())
            pos += sz
    return blocks


def decode_blocks_sharded(payloads, block_size: int, *, mesh=None):
    """Decompress independent-mode compressed block payloads data-parallel
    over the mesh: the production ring engine per chip when the plan fits
    its static shape, the XLA expansion engine otherwise."""
    if mesh is None:
        mesh = codec_mesh()
    ring = decode_blocks_sharded_ring(payloads, block_size, mesh=mesh)
    if ring is not None:
        return ring
    return _decode_blocks_sharded_xla(payloads, block_size, mesh=mesh)


def _decode_blocks_sharded_xla(payloads, block_size: int, *, mesh=None):
    """XLA expansion-engine mesh decode (fallback when the ring plan
    overflows its static shape)."""
    if mesh is None:
        mesh = codec_mesh()
    ndev = mesh.devices.size
    nblocks = len(payloads)
    b_pad = max(ndev, -(-nblocks // ndev) * ndev)
    # +1: the device parser needs >= 1 zero pad byte after each payload to
    # detect blocks truncated mid-LSIC run (packing.lsic_tables contract).
    width = packing.size_bucket(max(max((len(p) for p in payloads), default=4), 4) + 1)
    rows = np.zeros((b_pad, width), dtype=np.uint8)
    clen = np.zeros(b_pad, dtype=np.int32)
    for i, p in enumerate(payloads):
        rows[i, : len(p)] = np.frombuffer(p, np.uint8)
        clen[i] = len(p)
    # Empty rows would be parse errors; give them a valid empty block token.
    for i in range(nblocks, b_pad):
        clen[i] = 1
    out_pad = packing.size_bucket(block_size)
    nseq_pad = packing.size_bucket(max(8, width // 3 + 2), minimum=256)

    spec = P(BLOCK_AXIS)
    f = partial(_decode_batch, out_pad=out_pad, nseq_pad=nseq_pad, capacity=block_size)
    sharded = jax.jit(
        shard_map(f, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec, spec))
    )
    out, total, errs = sharded(jnp.asarray(rows), jnp.asarray(clen))
    errs_h = fetch_global(errs)[:nblocks]
    total_h = fetch_global(total)
    if errs_h.any():
        from ..block import errors as block_errors

        bad = int(np.argwhere(errs_h.any(axis=1))[0][0])
        flags = errs_h[bad]
        if flags[1]:
            raise block_errors.ExpectedAnotherByte()
        if flags[0]:
            raise block_errors.LiteralOutOfBounds()
        if flags[2]:
            raise block_errors.OffsetZero()
        if flags[3]:
            raise block_errors.OffsetOutOfBounds()
        if flags[4]:
            raise block_errors.OutputTooSmall(int(total_h[bad]), block_size)
        raise block_errors.ExpectedAnotherByte()
    out_h = fetch_global(out)
    return [out_h[i, : total_h[i]].tobytes() for i in range(nblocks)]
