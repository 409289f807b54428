"""Multi-host (DCN) scale-out: 2D ("dcn", "ici") mesh layouts.

The reference has no distributed story at all (rayon threads only, SURVEY
§5.8); this module defines how the prover spans pod slices.  The design
rule is the standard TPU recipe: *collectives ride ICI, DCN only carries
embarrassingly-parallel axes*.

  * The row dimension of a polynomial (NTT butterflies, MSM fold lanes)
    needs all-to-all / collective-permute bandwidth -> shard over "ici"
    (the intra-slice axis).
  * The BATCH dimension — independent polynomials (a proof commits ~100
    columns), independent proofs, independent MSMs — needs zero
    communication -> shard over "dcn" (the cross-slice axis).

So a 2-host x 4-chip mesh transforms 2 polynomial batches concurrently,
each four-step NTT exchanging only within its host's ICI domain.  The
final per-batch results are gathered host-side (proof assembly is a byte
stream; there is nothing to all-reduce across hosts).

Tested on a virtual 8-device CPU mesh reshaped (2, 4) in
tests/test_sharded_proof.py; on real hardware the same code spans
multi-slice topologies via jax's standard multi-host runtime
(jax.distributed.initialize + device order).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.bn254 import R
from ..fields.jfield import FR, NLIMB, mont_mul
from ..ops import ntt as jntt
from .ntt import twiddle_matrix


def make_mesh2d(n_dcn: int, n_ici: int) -> Mesh:
    """(n_dcn, n_ici) mesh over the first n_dcn*n_ici devices.  Device
    order: consecutive devices land on the ICI axis (matching physical
    slices, where jax.devices() enumerates within a slice first)."""
    devs = jax.devices()
    need = n_dcn * n_ici
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    return Mesh(np.array(devs[:need]).reshape(n_dcn, n_ici), ("dcn", "ici"))


def make_batched_ntt(mesh: Mesh, n1: int, n2: int, omega: int):
    """Batched four-step NTT on a 2D mesh: input (B, n1, n2, 16) with the
    batch axis sharded over "dcn" and columns over "ici".  Each batch
    element is one polynomial; the all-to-all stays inside each host's ICI
    domain (axis_name="ici" only).  Returns run(x) -> (B, n1/ici, n2, 16)
    row-sharded output, layout as parallel/ntt.py (out[b,k1,k2] =
    X_b[k2*n1+k1])."""
    plan1 = jntt.get_plan(n1, pow(omega, n2, R))
    plan2 = jntt.get_plan(n2, pow(omega, n1, R))
    tw = jnp.asarray(twiddle_matrix(n1, n2, omega))
    in_sh = NamedSharding(mesh, P("dcn", None, "ici", None))
    tw_sh = NamedSharding(mesh, P(None, "ici", None))
    out_sh = NamedSharding(mesh, P("dcn", "ici", None, None))

    @jax.jit
    def run(tw_, x):
        x = jax.lax.with_sharding_constraint(x, in_sh)
        # column NTTs over n1: batch (B) and lane (j2) axes are sharded,
        # the transform axis is axis 1 -> move it to the front
        a1 = jntt.ntt(plan1, jnp.moveaxis(x, 1, 0))     # (n1, B, n2, 16)
        a2 = mont_mul(FR, a1, tw_[:, None])
        a2 = jnp.moveaxis(a2, 0, 1)                     # (B, n1, n2, 16)
        a2 = jax.lax.with_sharding_constraint(a2, out_sh)  # ICI all-to-all
        a5 = jntt.ntt(plan2, jnp.moveaxis(a2, 2, 0))    # (n2, B, n1, 16)
        out = jnp.moveaxis(a5, 0, 2)                    # (B, n1, n2, 16)
        # natural order per batch: X[k2*n1+k1] = out[:, k1, k2]
        return jax.lax.with_sharding_constraint(out, out_sh)

    tw_dev = jax.device_put(tw, tw_sh)
    return lambda x: run(tw_dev, x)


def batched_msm_partials(mesh: Mesh, points_device, scalar_limbs,
                         fold_width: int | None = None):
    """MSM with the scalar-batch (B) axis sharded over "dcn" and the fold
    lanes over "ici": each host reduces its own commitments; the only
    cross-host traffic is the final (B, 254, 3, 16) partials gather."""
    from ..ops.msm import _bit_partials

    n_ici = mesh.shape["ici"]
    acc_sh = NamedSharding(mesh, P(None, "dcn", "ici", None, None))
    pts_sh = NamedSharding(mesh, P(None, "ici", None, None))
    sc_sh = NamedSharding(mesh, P(None, "dcn", "ici", None))
    n = points_device.shape[0]
    C = min(n, fold_width or max(n_ici, 128))
    assert C % n_ici == 0
    return _bit_partials(points_device, scalar_limbs, fold_width=C,
                         shardings=(acc_sh, pts_sh, sc_sh))
