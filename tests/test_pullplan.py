"""Pull-plan builder validation (host-side prep for the Pallas ring decoder).

The plan is validated against its executable spec (`simulate_plan`, a numpy
model of the kernel semantics) and against the host decoder. Reference role:
the sequential token walk of /root/reference/src/block/decompress.rs:201-444,
re-expressed as a data-parallel pull schedule.
"""

import numpy as np
import pytest

from lz4_flex_tpu import block
from lz4_flex_tpu.ops import pullplan

CORPORA = [
    "compression_1k.txt",
    "compression_34k.txt",
    "compression_65k.txt",
    "compression_66k_JSON.txt",
]


def _roundtrip(data: bytes):
    comp = block.compress(data)
    plan = pullplan.build_pull_plan(comp, len(data))
    assert plan is not None, "static plan overflow on representative input"
    out = pullplan.simulate_plan(plan, comp)
    assert out == data


@pytest.mark.parametrize("name", CORPORA)
def test_plan_corpora(name):
    _roundtrip(open(f"/root/reference/benches/{name}", "rb").read())


def test_plan_rle_and_periodic():
    _roundtrip(b"A" * 100_000)
    _roundtrip(b"abc" * 40_000)
    _roundtrip(b"0123456789abcdef" * 9_000)  # period 16 > 1, < 128


def test_plan_long_offsets_cross_tile():
    # matches reaching back near the full 64 KiB window, crossing tiles
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, 70_000, dtype=np.uint8).tobytes()
    data = base + base[:65_000] + base[100:64_000]
    _roundtrip(data)


def test_plan_word_soup():
    rng = np.random.default_rng(3)
    words = [rng.bytes(int(rng.integers(2, 12))) for _ in range(400)]
    soup = b" ".join(words[int(rng.integers(0, 400))] for _ in range(30_000))
    _roundtrip(soup)


def test_plan_malformed_raises():
    with pytest.raises(block.errors.DecompressError):
        pullplan.build_pull_plan(b"\xf0\x00", 64)


def test_plan_random_small_fuzz():
    rng = np.random.default_rng(11)
    for _ in range(60):
        n = int(rng.integers(0, 4096))
        if rng.random() < 0.5:
            data = rng.integers(0, 4, n, dtype=np.uint8).tobytes()
        else:
            data = rng.integers(0, 255, n, dtype=np.uint8).tobytes()
        if not data:
            continue
        _roundtrip(data)
