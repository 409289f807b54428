"""Radix-2 NTT over Fr for JAX/TPU (SURVEY N4).

TPU-first design: iterative Cooley-Tukey over (n, 16) limb arrays.  Every
stage is normalized to the same flat shape — gather even/odd halves, one
full-width Montgomery butterfly, scatter back — so the whole transform is a
single fori_loop whose body is traced once (compile time is independent of
n).  Butterfly indices are *computed in-kernel* from the stage counter with
shifts/masks (no per-stage index tables: a k=20 table set costs ~700 MB of
HBM and minutes of host build time; the arithmetic costs a few VPU ops).
The only tables are the bit-reversal permutation (n int32, built vectorized
in numpy) and a flat half-size twiddle array omega^t, t < n/2.

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


def _bit_reverse_perm(logn: int) -> np.ndarray:
    """Vectorized bit-reversal permutation of 0..2^logn-1."""
    perm = np.zeros(1 << logn, dtype=np.int64)
    for b in range(logn):
        perm = (perm << 1) | ((np.arange(1 << logn) >> b) & 1)
    return perm.astype(np.int32)


class NTTPlan:
    """Precomputed tables for size-n NTT with root omega.
    Hashable by (n, omega) for use as a static jit argument."""

    def __init__(self, n: int, omega: int):
        assert n & (n - 1) == 0 and n >= 2
        self.n = n
        self.omega = omega
        self.logn = n.bit_length() - 1
        assert pow(omega, n, R) == 1 and pow(omega, n // 2, R) != 1
        self.perm = jnp.asarray(_bit_reverse_perm(self.logn))
        # flat twiddles omega^t (Montgomery form), t in [0, n/2)
        tws = [FR.r % R] * (n // 2)
        for t in range(1, n // 2):
            tws[t] = tws[t - 1] * omega % R
        self.tw_flat = jnp.asarray(ints_to_limbs(tws))

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
    n, logn = plan.n, plan.logn
    x0 = a[plan.perm]
    half = n // 2
    pos = jnp.arange(half, dtype=jnp.int32)
    out_idx = jnp.arange(n, dtype=jnp.int32)
    tw_shape = (half,) + (1,) * (a.ndim - 2) + (16,)

    def stage(s, x):
        # stage s: blocks of m = 2^s butterflies; for flat butterfly pos p:
        #   j = p & (m-1), even index = ((p >> s) << (s+1)) + j, odd = even+m
        #   twiddle = omega^(j << (logn-1-s))
        j = pos & ((1 << s) - 1)
        even = ((pos >> s) << (s + 1)) + j
        odd = even + (1 << s)
        twi = j << (logn - 1 - s)
        e = x[even]
        xo = x[odd]
        tw = plan.tw_flat[twi].reshape(tw_shape)
        if tw.shape != xo.shape and jax.default_backend() in ("tpu", "axon"):
            # materialize the twiddle broadcast so the same-shape pallas
            # mont_mul fast path applies (jfield._pallas_flat_ok); the
            # gathered twiddles are data-dependent, so no const-folding risk
            tw = jnp.broadcast_to(tw, xo.shape)
        o = mont_mul(FR, xo, tw)
        lo = add(FR, e, o)
        hi = sub(FR, e, o)
        # inverse placement: output q comes from butterfly
        #   p = ((q >> (s+1)) << s) + (q & (m-1)), hi half if bit s of q set
        src = ((out_idx >> (s + 1)) << s) + (out_idx & ((1 << s) - 1))
        is_hi = (out_idx >> s) & 1
        return jnp.concatenate([lo, hi], axis=0)[src + is_hi * half]

    return jax.lax.fori_loop(0, logn, stage, x0)


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
