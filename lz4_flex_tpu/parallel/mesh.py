"""Device mesh construction for the codec.

One logical axis, "blocks", shards frame blocks data-parallel. On multi-host
topologies the axis spans hosts × chips so block shards ride ICI within a
slice and DCN across slices, which is the right layout for a bandwidth-bound
codec (all communication is the ordered gather of compressed lengths +
payloads; there is no all-to-all)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

BLOCK_AXIS = "blocks"


def codec_mesh(devices=None) -> Mesh:
    """A 1-D mesh over ``devices`` (default: all devices, process-global)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (BLOCK_AXIS,))


def local_codec_mesh() -> Mesh:
    """A mesh over this host's local devices only."""
    return Mesh(np.asarray(jax.local_devices()), (BLOCK_AXIS,))


_distributed_initialized = False


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Bootstrap multi-process JAX for N-host codec meshes.

    Thin wrapper over ``jax.distributed.initialize`` (the SURVEY §2.3 item 4
    communication backend): call it before any other JAX API on every host of
    the cluster; with no arguments the coordinator/process topology is taken
    from the environment (TPU pods auto-detect). Safe to call when already
    initialized or single-process (returns False and does nothing). After a
    successful call, ``codec_mesh()`` spans every chip of every host and the
    pipeline's payload gathers run as on-device all-gathers (see
    pipeline.fetch_global) instead of host-local reads.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return False
    explicit = coordinator_address is not None or num_processes is not None
    try:
        from jax._src import xla_bridge

        backend_up = bool(xla_bridge._backends)
    except Exception:  # pragma: no cover - private-API drift
        backend_up = False
    if backend_up:
        # Too late to bootstrap (jax.distributed.initialize must run before
        # the first backend use). Single-process callers just get False; an
        # explicit bootstrap request is a real ordering bug — surface it.
        if explicit and jax.process_count() == 1:
            raise RuntimeError(
                "distributed_init must be called before any other JAX API "
                "(the XLA backend is already initialized)"
            )
        _distributed_initialized = True
        return False
    if not explicit:
        import os

        if not any(
            v in os.environ
            for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
        ):
            return False  # single-process run: nothing to bootstrap
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _distributed_initialized = True
    return True
