"""xxHash32 bit-exactness: pure-Python and native vs the xxhash package."""

import random

import pytest
import xxhash

from lz4_flex_tpu.spec.xxhash32 import XxHash32, xxh32


@pytest.mark.parametrize("n", [0, 1, 3, 4, 15, 16, 17, 31, 32, 100, 1000, 65536])
@pytest.mark.parametrize("seed", [0, 1, 0xDEADBEEF])
def test_pure_python_oneshot(n, seed):
    rng = random.Random(n * 31 + seed)
    data = bytes(rng.randrange(256) for _ in range(n))
    assert xxh32(data, seed) == xxhash.xxh32(data, seed=seed).intdigest()


def test_pure_python_streaming():
    rng = random.Random(42)
    data = bytes(rng.randrange(256) for _ in range(10_000))
    h = XxHash32(0)
    i = 0
    while i < len(data):
        step = min(rng.randrange(1, 97), len(data) - i)
        h.write(data[i : i + step])
        i += step
        # digest() must be readable mid-stream without disturbing state
        assert h.digest() == xxhash.xxh32(data[:i]).intdigest()


def test_native_matches():
    native = pytest.importorskip("lz4_flex_tpu.native")
    if not native.available():
        pytest.skip("no native toolchain")
    rng = random.Random(7)
    for n in [0, 1, 15, 16, 17, 100, 100_000]:
        data = bytes(rng.randrange(256) for _ in range(n))
        assert native.xxh32(data) == xxhash.xxh32(data).intdigest()
        h = native.NativeXxHash32()
        i = 0
        while i < n:
            step = min(rng.randrange(1, 1000), n - i)
            h.write(data[i : i + step])
            i += step
        assert h.digest() == xxhash.xxh32(data).intdigest()
