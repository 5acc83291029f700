"""Ring-decoder tier: host plan builder + numpy simulator + interpret-mode
Pallas kernel.

The numpy simulator (ops/ringdecode.py:simulate_ring_plan) is the executable
spec of the TPU kernel; these tests pin the plan builder against the golden
decoder byte-for-byte, drive the kernel itself in Pallas interpret mode on
small blocks, and enforce the error taxonomy on the plan-building parse
(the same walk as the reference's token loop,
/root/reference/src/block/decompress.rs:201-444).
"""

import numpy as np
import pytest

from lz4_flex_tpu import block
from lz4_flex_tpu.block import errors as block_errors
from lz4_flex_tpu.ops.ringdecode import (
    build_ring_plan,
    build_ring_plan_parts,
    decode_block_ring,
    simulate_ring_plan,
)


def _u8(b: bytes) -> np.ndarray:
    return np.frombuffer(b, np.uint8)


def _plan_roundtrip(data: bytes) -> None:
    comp = block.compress(data)
    plan = build_ring_plan(_u8(comp), len(data))
    assert plan is not None
    assert simulate_ring_plan(plan, _u8(comp)) == data


def test_plan_sim_corpora(corpus_set):
    for data in corpus_set.values():
        if data:
            _plan_roundtrip(data)


def test_plan_sim_edge_patterns():
    rng = np.random.default_rng(7)
    cases = [
        b"a" * 70000,  # offset-1 RLE across row and tile boundaries
        b"ab" * 35000,  # offset 2
        b"abcdefg" * 11000,  # offset 7
        bytes(rng.integers(0, 256, 150000, dtype=np.uint8)),  # incompressible
        (b"x" * 200 + bytes(rng.integers(0, 256, 64, dtype=np.uint8))) * 400,
    ]
    for data in cases:
        _plan_roundtrip(data)


def test_plan_sim_deep_chains():
    # Repeated doubling produces deep match chains (the depth machinery and
    # the host-side partial resolution both get exercised).
    data = b"01"
    while len(data) < 300000:
        data = data + data[-1024:] * 3
    _plan_roundtrip(data[:300000])


def test_plan_sim_materialization_off_matches(monkeypatch, corpus_34k):
    # TLZ4_NO_MAT disables the known-source materialization fast paths; the
    # decoded bytes must be identical either way (materialization moves
    # bytes from kernel records into the literal image, never changes them)
    # and the no-mat plan must carry at least as many fires.
    rng = np.random.default_rng(11)
    cases = [
        corpus_34k * 4,
        b"ab" * 40000 + corpus_34k[:20000] + b"a" * 40000,
        (corpus_34k[:333] + b"z" * 77) * 300,
        bytes(rng.integers(97, 123, 90000, dtype=np.uint8)),
    ]
    for data in cases:
        comp = _u8(block.compress(data))
        plan = build_ring_plan(comp, len(data))
        out_mat = simulate_ring_plan(plan)
        fires_mat = int(plan.nf_tot.sum())
        monkeypatch.setenv("TLZ4_NO_MAT", "1")
        plan2 = build_ring_plan(comp, len(data))
        out_nomat = simulate_ring_plan(plan2)
        monkeypatch.delenv("TLZ4_NO_MAT")
        assert out_mat == data
        assert out_nomat == data
        assert fires_mat <= int(plan2.nf_tot.sum())


def test_plan_sim_periodic_ring_boundary():
    # Periodic (off <= 128) matches whose period window lands BEFORE the
    # tile start must stay kernel records (the window is ring data the host
    # cannot materialize); windows rooted in literals materialize. Exercise
    # both around the 32 KiB tile boundary with several periods.
    chunks = []
    rng = np.random.default_rng(13)
    for period in (1, 2, 3, 5, 31, 64, 127, 128):
        pat = bytes(rng.integers(97, 123, period, dtype=np.uint8))
        chunks.append(pat * (40000 // period))
        chunks.append(bytes(rng.integers(0, 256, 700, dtype=np.uint8)))
    data = b"".join(chunks)
    _plan_roundtrip(data)


def test_parts_independent_with_stored(corpus_65k):
    blocks = [corpus_65k[i : i + 16384] for i in range(0, len(corpus_65k), 16384)]
    parts = []
    for i, b in enumerate(blocks):
        if i % 3 == 1:
            parts.append((_u8(b), False))  # stored block passthrough
        else:
            parts.append((_u8(block.compress(b)), True))
    total = sum(len(b) for b in blocks)
    plan, comp = build_ring_plan_parts(parts, total, independent=True)
    assert plan is not None
    assert simulate_ring_plan(plan, comp) == corpus_65k


def test_parts_linked_window(corpus_65k):
    # Linked-mode frame: each block compressed against the previous 64 KiB,
    # decoded through the kernel's output ring with no dictionary plumbing.
    data = corpus_65k * 3
    bs = 32768
    parts = []
    tail = b""
    for i in range(0, len(data), bs):
        b = data[i : i + bs]
        c = block.compress_with_dict(b, tail) if tail else block.compress(b)
        parts.append((_u8(c), True))
        tail = (tail + b)[-65536:]
    plan, comp = build_ring_plan_parts(parts, len(data), independent=False)
    assert plan is not None
    assert simulate_ring_plan(plan, comp) == data


def test_dict_decode_as_stored_prefix(corpus_34k):
    # decode_block_device's dict route: the dictionary rides as a stored
    # pseudo-block ahead of the payload, linked mode resolves the cross
    # references, the prefix is sliced off.
    dic = corpus_34k[:30000]
    tail = corpus_34k[30000:]
    comp = block.compress_with_dict(tail, dic)
    plan, buf = build_ring_plan_parts(
        [(_u8(dic), False), (_u8(comp), True)],
        len(dic) + len(tail),
        independent=False,
    )
    assert plan is not None
    assert simulate_ring_plan(plan, buf)[len(dic):] == tail


def test_parts_independent_rejects_cross_block_refs(corpus_34k):
    # A linked stream decoded as independent must raise OffsetOutOfBounds
    # (reference: 'offset not contained in the decompressed buffer').
    bs = 8192
    parts = []
    tail = b""
    for i in range(0, len(corpus_34k), bs):
        b = corpus_34k[i : i + bs]
        c = block.compress_with_dict(b, tail) if tail else block.compress(b)
        parts.append((_u8(c), True))
        tail = (tail + b)[-65536:]
    with pytest.raises(block_errors.OffsetOutOfBounds):
        build_ring_plan_parts(parts, len(corpus_34k), independent=True)


def test_plan_error_taxonomy():
    with pytest.raises(block_errors.OffsetZero):
        build_ring_plan(np.array([0x10, 65, 0, 0], np.uint8), 5)
    with pytest.raises(block_errors.OffsetOutOfBounds):
        build_ring_plan(np.array([0x10, 65, 100, 0], np.uint8), 5)
    with pytest.raises(block_errors.ExpectedAnotherByte):
        build_ring_plan(np.array([0xF0, 0xFF], np.uint8), 2000)
    with pytest.raises(block_errors.LiteralOutOfBounds):
        build_ring_plan(np.array([0x45], np.uint8), 20)
    with pytest.raises(block_errors.LiteralOutOfBounds):
        build_ring_plan(np.array([0xF0, 10, 65], np.uint8), 200)


def test_plan_wrong_expected_size_raises(corpus_1k):
    comp = block.compress(corpus_1k)
    with pytest.raises(block_errors.OutputTooSmall):
        build_ring_plan(_u8(comp), len(corpus_1k) - 1)


def test_plan_deterministic_across_threads(corpus_34k, monkeypatch):
    # TLZ4_DETERMINISTIC restores the zero fill of match spans in the
    # literal image; without it those bytes stay uninitialized by design
    # (every one is overwritten by a fire — decoded output is exact either
    # way, which test_ring_roundtrip* cover).
    monkeypatch.setenv("TLZ4_DETERMINISTIC", "1")
    comp = _u8(block.compress(corpus_34k))
    a = build_ring_plan(comp, len(corpus_34k), nthreads=1)
    lit_a = a.lit_init.copy()
    b = build_ring_plan(comp, len(corpus_34k), nthreads=4)
    np.testing.assert_array_equal(a.nf_tot, b.nf_tot)
    np.testing.assert_array_equal(a.fper, b.fper)
    np.testing.assert_array_equal(lit_a, b.lit_init)
    # record slots beyond nf_tot are never read by the kernel and stay
    # uninitialized by design — compare only live fires
    live = np.arange(a.rec_f0.shape[1])[None, :, None] < a.nf_tot[:, None, None]
    for fa, fb in ((a.rec_f0, b.rec_f0), (a.rec_f1, b.rec_f1),
                   (a.rec_f2, b.rec_f2)):
        np.testing.assert_array_equal(np.where(live, fa, 0),
                                      np.where(live, fb, 0))


def test_nfmax_ladder_and_hint():
    # Chain-dense content overflows the 48-fire first rung; the builder must
    # climb the ladder to the smallest rung that fits (not jump to the hard
    # cap) and remember it as the starting hint for the next default build.
    from lz4_flex_tpu.ops import ringdecode as R

    data = b"01"
    while len(data) < 400_000:
        data = data + data[-512:] * 9  # deep, record-dense chains
    data = data[:400_000]
    comp = _u8(block.compress(data))
    R._nfmax_hint[0] = R.NFMAX_ALLOC  # reset whatever earlier tests left
    plan = build_ring_plan(comp, len(data))
    assert plan is not None
    nfmax = plan.rec_f0.shape[1]
    assert nfmax in (R.NFMAX_ALLOC,) + R.NFMAX_STEPS
    # the hint equals the smallest ladder rung holding this plan's fires
    used = int(plan.nf_tot.max())
    expect = next(s for s in (R.NFMAX_ALLOC,) + R.NFMAX_STEPS if s >= used)
    assert R._nfmax_hint[0] == expect
    assert simulate_ring_plan(plan, comp) == data
    # a light input afterwards decays the hint back down
    light = b"abcdefgh" * 4000
    lcomp = _u8(block.compress(light))
    plan2 = build_ring_plan(lcomp, len(light))
    assert plan2 is not None
    assert R._nfmax_hint[0] <= expect


def test_kernel_interpret_matches_sim(corpus_34k):
    # The Pallas kernel in interpret mode (CPU) against the golden bytes on
    # a block spanning two tiles.
    data = corpus_34k + corpus_34k[:32768]
    comp = block.compress(data)
    got = decode_block_ring(_u8(comp), len(data), interpret=True)
    assert got == data


def test_kernel_interpret_rle_overlap():
    data = b"z" * 40000 + b"yx" * 3000 + b"abcdefg" * 2000
    comp = block.compress(data)
    got = decode_block_ring(_u8(comp), len(data), interpret=True)
    assert got == data


def test_kernel_interpret_inline_checksum(corpus_34k):
    # The in-kernel consumer: the checksum output must equal the host-side
    # expected value, the decoded bytes must be byte-exact, and the plain
    # (no-checksum) kernel variant must keep working from the same plan.
    import jax.numpy as jnp

    from lz4_flex_tpu.ops.ringdecode import (
        _bucket,
        ring_checksum_expected,
        ring_decode_jit,
        ring_plan_device_arrays,
    )

    data = corpus_34k + corpus_34k[:32768]
    comp = _u8(block.compress(data))
    plan = build_ring_plan(comp, len(data))
    assert plan is not None
    arrs = [jnp.asarray(a) for a in ring_plan_device_arrays(plan)]
    kw = dict(ntiles=_bucket(plan.ntiles), nf=arrs[3].shape[1],
              interpret=True)
    ntot = jnp.asarray(np.array([len(data)], np.int32))
    out, acc = ring_decode_jit(*arrs, ntot=ntot, **kw)
    got = np.asarray(out, np.uint8).reshape(-1)[: len(data)].tobytes()
    assert got == data
    lanes = np.asarray(acc).astype(np.uint32)
    assert lanes.shape == (1, 128)
    chk = int(lanes.sum(dtype=np.uint64) & 0xFFFFFFFF)
    assert chk == ring_checksum_expected(data)
    # a corrupted plan record must change the checksum (consumer really
    # depends on the decoded bytes)
    out2 = ring_decode_jit(*arrs, **kw)
    assert np.asarray(out2, np.uint8).reshape(-1)[: len(data)].tobytes() == data


def test_plan_sim_tr512_dense_packer(corpus_set):
    """512-row tiles route through the dense reserved-fire packer and the
    widened row mask (2*TR-1 keeps the pad sentinel distinct from row 0);
    plans must stay byte-exact under the numpy simulator and produce fewer
    fires than the 256-row default on chain-heavy content."""
    from lz4_flex_tpu.ops.ringdecode import simulate_ring_plan

    for data in corpus_set.values():
        data = data[: 3 * 65536]
        if not data:
            continue
        comp = _u8(block.compress(data))
        p512 = build_ring_plan(comp, len(data), tile_rows=512)
        assert p512 is not None and p512.tile_rows == 512
        assert simulate_ring_plan(p512) == data


def test_kernel_interpret_tr512(corpus_34k):
    """The Pallas kernel at TILE_ROWS=512 (interpret mode) must decode the
    dense-packed plan byte-exactly, including the periodic/RLE paths."""
    import jax.numpy as jnp

    from lz4_flex_tpu.ops.ringdecode import (
        _bucket,
        ring_decode_jit,
        ring_plan_device_arrays,
    )

    for data in (
        corpus_34k + corpus_34k[:32768],
        b"ab" * 40000 + corpus_34k[:9999] + b"\x00" * 7777,
    ):
        comp = _u8(block.compress(data))
        plan = build_ring_plan(comp, len(data), tile_rows=512)
        assert plan is not None
        arrs = [jnp.asarray(a) for a in ring_plan_device_arrays(plan)]
        out = ring_decode_jit(
            *arrs, ntiles=_bucket(plan.ntiles), nf=arrs[3].shape[1],
            interpret=True, tile_rows=512,
        )
        got = np.asarray(out, np.uint8).reshape(-1)[: len(data)].tobytes()
        assert got == data
