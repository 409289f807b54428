"""Radix-2 NTT over Fr for JAX/TPU (SURVEY N4).

TPU-first design: iterative Cooley-Tukey over (n, 16) limb arrays.  Every
stage is normalized to the same flat shape — gather even/odd halves, one
full-width Montgomery butterfly, gather back — so the whole transform is a
single fori_loop whose body is traced once (compile time is independent of
n), driven by precomputed (logn, n/2) index tables and (logn, n/2, 16)
twiddle tables baked in as constants.

Replaces halo2's rayon-parallel best_fft; the multi-chip variant shards the
leading axis and exchanges butterfly halves over ICI (parallel/ntt.py).
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.bn254 import R, inv_mod
from ..fields.jfield import FR, add, ints_to_limbs, mont_mul, sub


class NTTPlan:
    """Precomputed tables for size-n NTT with root omega.
    Hashable by (n, omega) for use as a static jit argument."""

    def __init__(self, n: int, omega: int):
        assert n & (n - 1) == 0 and n >= 2
        self.n = n
        self.omega = omega
        self.logn = n.bit_length() - 1
        assert pow(omega, n, R) == 1 and pow(omega, n // 2, R) != 1
        perm = np.zeros(n, dtype=np.int32)
        for i in range(n):
            perm[i] = int(format(i, f"0{self.logn}b")[::-1], 2)
        self.perm = jnp.asarray(perm)

        idx_even = np.zeros((self.logn, n // 2), dtype=np.int32)
        idx_odd = np.zeros((self.logn, n // 2), dtype=np.int32)
        unperm = np.zeros((self.logn, n), dtype=np.int32)
        tw = np.zeros((self.logn, n // 2, 16), dtype=np.uint32)
        m = 1
        for s in range(self.logn):
            w_m = pow(omega, n // (2 * m), R)
            tws = [1] * m
            for j in range(1, m):
                tws[j] = tws[j - 1] * w_m % R
            tw_stage = ints_to_limbs([t * FR.r % R for t in tws])  # Montgomery
            pos = 0
            for blk in range(n // (2 * m)):
                base = blk * 2 * m
                for j in range(m):
                    idx_even[s, pos] = base + j
                    idx_odd[s, pos] = base + j + m
                    tw[s, pos] = tw_stage[j]
                    # lo (concat position pos) -> base+j; hi (pos + n/2) -> base+j+m
                    unperm[s, base + j] = pos
                    unperm[s, base + j + m] = pos + n // 2
                    pos += 1
            m *= 2
        self.idx_even = jnp.asarray(idx_even)
        self.idx_odd = jnp.asarray(idx_odd)
        self.unperm = jnp.asarray(unperm)
        self.tw = jnp.asarray(tw)

    def __hash__(self):
        return hash((self.n, self.omega))

    def __eq__(self, other):
        return (isinstance(other, NTTPlan)
                and (self.n, self.omega) == (other.n, other.omega))


@lru_cache(maxsize=None)
def get_plan(n: int, omega: int) -> NTTPlan:
    return NTTPlan(n, omega)


@partial(jax.jit, static_argnums=0)
def ntt(plan: NTTPlan, a):
    """Forward in-order NTT over axis 0 of (n, ..., 16) Montgomery-form
    limbs: out[i] = sum_j a[j] omega^(ij).  Interior axes are batch dims
    (the four-step sharded NTT transforms matrix columns in place)."""
    x0 = a[plan.perm]
    tw_shape = (plan.n // 2,) + (1,) * (a.ndim - 2) + (16,)

    def stage(s, x):
        e = x[plan.idx_even[s]]
        o = mont_mul(FR, x[plan.idx_odd[s]], plan.tw[s].reshape(tw_shape))
        lo = add(FR, e, o)
        hi = sub(FR, e, o)
        return jnp.concatenate([lo, hi], axis=0)[plan.unperm[s]]

    return jax.lax.fori_loop(0, plan.logn, stage, x0)


def intt(plan_fwd: NTTPlan, a):
    """Inverse NTT using the inverse-omega plan + 1/n scaling."""
    n = plan_fwd.n
    inv_plan = get_plan(n, inv_mod(plan_fwd.omega, R))
    return _intt_scaled(inv_plan, a)


@partial(jax.jit, static_argnums=0)
def _intt_scaled(inv_plan: NTTPlan, a):
    out = ntt(inv_plan, a)
    n_inv_mont = jnp.asarray(
        ints_to_limbs([inv_mod(inv_plan.n, R) * FR.r % R])[0])
    return mont_mul(FR, out, jnp.broadcast_to(n_inv_mont, out.shape))
