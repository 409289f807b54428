"""Multi-chip MSM: the fold-lane (C) axis of the two-kernel bit-serial MSM
sharded over the mesh (SURVEY N5 scale-out).

Design: the single-chip MSM (ops/msm.py) is already a Python-driven loop
over TWO small compiled kernels (row fold, strided tail fold).  Multi-chip
is the SAME two kernels with the accumulator's lane axis sharded: every row
fold is purely elementwise across lanes (zero communication), GSPMD inserts
collective permutes only for the log2(C) tail folds whose stride crosses the
shard boundary, and the final bit-plane partials land replicated.  The
Horner bit-combine runs on device (ops/msm.py) or host.

This replaces the earlier monolithic `shard_map`-traced MSM, whose single
fused program took >5 min of XLA:CPU compile (the round-1 dryrun timeout):
the stepped formulation compiles two ~1-padd graphs regardless of mesh size.
Replaces halo2's rayon `best_multiexp` (SURVEY N15) with ICI-scale SPMD.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.msm import _bit_partials, _partials_to_affine


def make_sharded_msm(mesh: Mesh, axis: str = "shard"):
    """Returns run(points_device, scalar_limbs) -> B host affine points.

    points: (n, 3, 16); scalar_limbs: (B, n, 16) plain limbs.  The fold
    width is n // n_devices-aligned so each device owns a contiguous lane
    block."""
    ndev = mesh.devices.size
    acc_sh = NamedSharding(mesh, P(None, None, axis, None, None))
    pts_sh = NamedSharding(mesh, P(None, axis, None, None))
    sc_sh = NamedSharding(mesh, P(None, None, axis, None))

    def run(points_device, scalar_limbs, fold_width=None) -> list:
        n = points_device.shape[0]
        C = min(n, fold_width or max(ndev, 128))
        assert C % ndev == 0, "fold width must split across the mesh"
        partials = _bit_partials(points_device, scalar_limbs, fold_width=C,
                                 shardings=(acc_sh, pts_sh, sc_sh))
        return _partials_to_affine(partials)

    return run


def sharded_bit_partials(mesh: Mesh, points_device, scalar_limbs,
                         fold_width=None, axis: str = "shard"):
    """Device-resident variant: returns (B, 254, 3, 16) partials."""
    ndev = mesh.devices.size
    acc_sh = NamedSharding(mesh, P(None, None, axis, None, None))
    pts_sh = NamedSharding(mesh, P(None, axis, None, None))
    sc_sh = NamedSharding(mesh, P(None, None, axis, None))
    n = points_device.shape[0]
    C = min(n, fold_width or max(ndev, 128))
    assert C % ndev == 0
    return _bit_partials(points_device, scalar_limbs, fold_width=C,
                         shardings=(acc_sh, pts_sh, sc_sh))
