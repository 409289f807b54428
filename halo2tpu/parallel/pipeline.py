"""Sharded proving-core step: the multi-chip composition validated by
__graft_entry__.dryrun_multichip and scaled on real pods.

One SPMD step over a Mesh covering the prover's hot phases (SURVEY §3.5):
column-sharded coefficient->evaluation NTT (Bailey four-step, one
all-to-all over ICI), a gate-style elementwise fold on the evaluations, and
the lane-sharded stepped MSM partial accumulation (parallel/msm.py — GSPMD
partitions the same two kernels the single-chip path dispatches).

The step is a small pipeline of compiled programs rather than one
monolithic jit: the stepped structure is how the real prover dispatches
(ops/msm.py), and it keeps XLA compile time bounded — the round-1
single-program formulation took >5 min of XLA:CPU compile in the driver's
8-virtual-device dryrun.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.bn254 import R
from ..fields.jfield import FR, mont_mul
from ..ops.ntt import get_plan, ntt as ntt1
from .msm import sharded_bit_partials
from .ntt import twiddle_matrix


def make_sharded_prove_core(mesh: Mesh, n1: int, n2: int, omega: int,
                            axis: str = "shard"):
    """Returns (fn, shardings, tw).  fn(tw, x_matrix, points, scalars)
    -> (gate_evals_matrix, msm_partials): the sharded NTT + gate fold (one
    jitted shard_map program) followed by the lane-sharded stepped MSM."""
    n = n1 * n2
    plan1 = get_plan(n1, pow(omega, n2, R))
    plan2 = get_plan(n2, pow(omega, n1, R))

    def ntt_gate(tw_local, x_local):
        # --- sharded NTT (columns local, one all-to-all, rows local) ---
        a1 = ntt1(plan1, x_local)
        a2 = mont_mul(FR, a1, tw_local)
        a3 = jax.lax.all_to_all(a2, axis, split_axis=0, concat_axis=1, tiled=True)
        a4 = jnp.swapaxes(a3, 0, 1)
        evals = jnp.swapaxes(ntt1(plan2, a4), 0, 1)   # (n1/D, n2, 16)
        # --- gate-style fold on evaluations (square gate, signal.rs:41) ---
        return mont_mul(FR, evals, evals)

    ntt_fn = jax.jit(jax.shard_map(
        ntt_gate, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=P(axis, None, None), check_vma=False))

    def fn(tw_arr, x_matrix, points, scalars):
        gate = ntt_fn(tw_arr, x_matrix)
        parts = sharded_bit_partials(mesh, points, scalars,
                                     fold_width=points.shape[0], axis=axis)
        return gate, parts

    shardings = (
        NamedSharding(mesh, P(None, axis, None)),
        NamedSharding(mesh, P(None, axis, None)),
        NamedSharding(mesh, P(axis, None, None)),
        NamedSharding(mesh, P(None, axis, None)),
    )
    tw = jnp.asarray(twiddle_matrix(n1, n2, omega))
    return fn, shardings, tw
