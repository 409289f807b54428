"""Sharded proving-core step: the multi-chip composition validated by
__graft_entry__.dryrun_multichip and scaled on real pods.

One jitted SPMD step over a Mesh: column-sharded coefficient->evaluation
NTT (Bailey four-step, one all-to-all), a gate-style elementwise fold on the
evaluations, and a point-sharded MSM partial accumulation (all_gather +
Jacobian tree combine).  These are exactly the prover's hot phases
(SURVEY §3.5): quotient evaluation and polynomial commitment.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.bn254 import R
from ..fields.jfield import FR, mont_mul
from ..ops.ntt import get_plan, ntt as ntt1
from ..ops.msm import _bit_partials_traced
from ..curves.jpoint import padd
from .ntt import twiddle_matrix


def make_sharded_prove_core(mesh: Mesh, n1: int, n2: int, omega: int,
                            axis: str = "shard"):
    """Returns (fn, example_args_builder).  fn(tw, x_matrix, points, scalars)
    -> (evals_matrix, msm_partials), fully sharded."""
    n = n1 * n2
    plan1 = get_plan(n1, pow(omega, n2, R))
    plan2 = get_plan(n2, pow(omega, n1, R))
    ndev = mesh.devices.size

    def local(tw_local, x_local, pts_local, sc_local):
        # --- sharded NTT (columns local, one all-to-all, rows local) ---
        a1 = ntt1(plan1, x_local)
        a2 = mont_mul(FR, a1, tw_local)
        a3 = jax.lax.all_to_all(a2, axis, split_axis=0, concat_axis=1, tiled=True)
        a4 = jnp.swapaxes(a3, 0, 1)
        evals = jnp.swapaxes(ntt1(plan2, a4), 0, 1)   # (n1/D, n2, 16)
        # --- gate-style fold on evaluations (square gate, signal.rs:41) ---
        gate = mont_mul(FR, evals, evals)
        # --- sharded MSM partials over the point shard ---
        parts = _bit_partials_traced(pts_local, sc_local)     # (B, 254, 3, 16)
        allp = jax.lax.all_gather(parts, axis)         # (D, B, 254, 3, 16)
        width = ndev
        acc = allp
        while width > 1:
            half = width // 2
            acc = padd(acc[:half], acc[half:2 * half])
            width = half
        return gate, acc[0]

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None),
                  P(axis, None, None), P(None, axis, None)),
        out_specs=(P(axis, None, None), P(None, None, None, None)),
        check_vma=False))

    shardings = (
        NamedSharding(mesh, P(None, axis, None)),
        NamedSharding(mesh, P(None, axis, None)),
        NamedSharding(mesh, P(axis, None, None)),
        NamedSharding(mesh, P(None, axis, None)),
    )
    tw = jnp.asarray(twiddle_matrix(n1, n2, omega))
    return fn, shardings, tw
