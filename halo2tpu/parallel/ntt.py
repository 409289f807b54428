"""Multi-chip NTT: Bailey four-step decomposition over a device mesh.

n = n1 * n2, data as an (n1, n2) matrix of field elements, columns sharded
over the mesh axis.  Column NTTs and row NTTs are chip-local (the batched
single-chip kernel, ops/ntt.py); the single reshard between them is one
all-to-all over ICI — the TPU-native replacement for halo2's shared-memory
rayon FFT (SURVEY §5.7/§5.8).

Layout convention: input x[j1, j2] holds coefficient a[j1 * n2 + j2];
output out[k1, k2] holds NTT value X[k2 * n1 + k1] (row-sharded).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.bn254 import R
from ..fields.jfield import FR, ints_to_limbs, mont_mul
from ..ops.ntt import NTTPlan, get_plan


def twiddle_matrix(n1: int, n2: int, omega: int):
    """(n1, n2, 16) Montgomery twiddles w^(k1*j2) for the middle step."""
    rows = []
    for k1 in range(n1):
        w = pow(omega, k1, R)
        cur = 1
        row = [1] * n2
        for j2 in range(1, n2):
            cur = cur * w % R
            row[j2] = cur
        rows.extend(row)
    return ints_to_limbs([v * FR.r % R for v in rows]).reshape(n1, n2, 16)


def make_sharded_ntt(mesh: Mesh, n1: int, n2: int, omega: int, axis: str = "shard"):
    """Build a jitted sharded NTT closure for size n = n1*n2."""
    n = n1 * n2
    plan1 = get_plan(n1, pow(omega, n2, R))  # omega_{n1}
    plan2 = get_plan(n2, pow(omega, n1, R))  # omega_{n2}
    tw = jnp.asarray(twiddle_matrix(n1, n2, omega))
    ndev = mesh.devices.size

    def local(tw_local, x_local):
        from ..ops.ntt import ntt as ntt1
        a1 = ntt1(plan1, x_local)                       # (n1, n2/D, 16)
        a2 = mont_mul(FR, a1, tw_local)
        a3 = jax.lax.all_to_all(a2, axis, split_axis=0, concat_axis=1,
                                tiled=True)             # (n1/D, n2, 16)
        a4 = jnp.swapaxes(a3, 0, 1)                     # (n2, n1/D, 16)
        a5 = ntt1(plan2, a4)
        return jnp.swapaxes(a5, 0, 1)                   # (n1/D, n2, 16)

    sharded = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=P(axis, None, None)))

    col_sharding = NamedSharding(mesh, P(None, axis, None))

    def run(x_matrix):
        """x_matrix: (n1, n2, 16) (device or host array)."""
        x = jax.device_put(jnp.asarray(x_matrix), col_sharding)
        return sharded(jax.device_put(tw, col_sharding), x)

    run.plan1, run.plan2, run.n1, run.n2 = plan1, plan2, n1, n2
    return run
