"""Device-mesh helpers for multi-chip proving.

The reference's entire "distributed backend" is rayon shared-memory threads
(SURVEY §5.8/N15); the TPU-native replacement is SPMD over a jax.sharding
Mesh — NTT row shards exchange butterfly stages over ICI (one all-to-all in
the Bailey four-step decomposition), MSM shards points and tree-combines
per-device partial sums.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, f"need {n_devices} devices, have {len(devs)}"
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_leading(mesh: Mesh, axis: str = "shard") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
