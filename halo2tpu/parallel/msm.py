"""Multi-chip MSM: points sharded over the mesh, per-device bit partials,
log(D) cross-device tree combine (SURVEY N5 scale-out).

Each device runs the single-chip masked-tree MSM (ops/msm.py) on its point
shard; the (B, 254, 3, 16) partial-sum tensors are all-gathered (tiny:
~390KB) and folded with Jacobian adds, yielding replicated totals.  The
Horner bit-combine stays on the host (254 doublings).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves.jpoint import padd
from ..ops.msm import _bit_partials_traced, _partials_to_affine


def make_sharded_msm(mesh: Mesh, axis: str = "shard"):
    ndev = mesh.devices.size
    logd = max(1, ndev.bit_length() - 1) if ndev > 1 else 0

    def local(pts_local, limbs_local):
        parts = _bit_partials_traced(pts_local, limbs_local)   # (B, 254, 3, 16)
        allp = jax.lax.all_gather(parts, axis)          # (D, B, 254, 3, 16)
        acc = allp
        width = ndev
        while width > 1:
            half = width // 2
            acc = padd(acc[:half], acc[half:2 * half])
            width = half
        return acc[0]

    sharded = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None, None), P(None, axis, None)),
        out_specs=P(None, None, None, None),
        check_vma=False))

    pts_sharding = NamedSharding(mesh, P(axis, None, None))
    sc_sharding = NamedSharding(mesh, P(None, axis, None))

    def run(points_device, scalar_limbs) -> list:
        """points: (n, 3, 16); scalar_limbs: (B, n, 16) plain limbs.
        Returns B host affine points."""
        pts = jax.device_put(points_device, pts_sharding)
        sc = jax.device_put(scalar_limbs, sc_sharding)
        partials = sharded(pts, sc)
        return _partials_to_affine(partials)

    return run
