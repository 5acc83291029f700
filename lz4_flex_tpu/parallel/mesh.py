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
