"""Test configuration.

Device-path tests run on a virtual 8-device CPU mesh so the full sharding
story is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path and benches on a real chip).
"""

import os

# Must be set before jax is imported anywhere in the test process. NOTE: a
# pre-registered accelerator plugin (e.g. the axon TPU tunnel) overrides the
# JAX_PLATFORMS env var, so the jax.config update below is the one that
# actually pins tests to the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import random

import pytest

_BENCHES = pathlib.Path("/root/reference/benches")
_REPO = pathlib.Path(__file__).resolve().parent.parent


def _load(name: str) -> bytes:
    return (_BENCHES / name).read_bytes()


@pytest.fixture(scope="session")
def corpus_1k() -> bytes:
    return _load("compression_1k.txt")


@pytest.fixture(scope="session")
def corpus_34k() -> bytes:
    return _load("compression_34k.txt")


@pytest.fixture(scope="session")
def corpus_65k() -> bytes:
    return _load("compression_65k.txt")


@pytest.fixture(scope="session")
def corpus_66k_json() -> bytes:
    return _load("compression_66k_JSON.txt")


@pytest.fixture(scope="session")
def corpus_set(corpus_1k, corpus_34k, corpus_65k, corpus_66k_json):
    """The reference's roundtrip input set (tests/tests.rs:353-566 analog)."""
    rng = random.Random(0xC0FFEE)
    return {
        "empty": b"",
        "one": b"a",
        "short": b"Hello people, what's up?",
        "aaas": b"aaaaaaaaaaaaaaa",
        "nulls": bytes(30_000),
        "random_5k": bytes(rng.randrange(256) for _ in range(5_000)),
        "cycle": bytes((i % 256) for i in range(70_000)),
        "words": b" ".join(
            bytes(rng.randrange(97, 123) for _ in range(rng.randrange(2, 10)))
            for _ in range(20_000)
        ),
        "1k": corpus_1k,
        "34k": corpus_34k,
        "65k": corpus_65k,
        "66kJSON": corpus_66k_json,
    }
