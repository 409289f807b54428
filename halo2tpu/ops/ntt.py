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

CRITICAL dispatch rule (round-3 finding): the plan tables are passed to the
jitted transform as ARGUMENTS, never closed over / reached through a static
argument.  A jitted program that embeds a multi-megabyte device constant
runs ~30 ms/call on the axon TPU runtime AND permanently degrades every
subsequent dispatch in the process to ~30 ms (a >300x tax that silently
dominated the round-2 prover profile).

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
    """Precomputed tables for size-n NTT with root omega (device arrays,
    handed to the jitted transform as runtime arguments)."""

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
        # 1/n (Montgomery), for the inverse transform
        self.n_inv = jnp.asarray(ints_to_limbs([inv_mod(n, R) * FR.r % R])[0])


@lru_cache(maxsize=None)
def get_plan(n: int, omega: int) -> NTTPlan:
    return NTTPlan(n, omega)


@partial(jax.jit, static_argnums=0)
def _ntt_run(logn: int, perm, tw_flat, a):
    """Stockham autosort DIF: logn unrolled stages of slice + butterfly +
    concat/reshape.  No bit-reversal pass, no index-computed gathers — the
    axon TPU runtime degrades EVERY subsequent dispatch ~300x after running
    a program with multi-gather/concat-gather patterns (round-3 finding),
    so the transform is built exclusively from clean ops: static slices,
    strided twiddle subsampling, broadcasts, concatenation.

    Invariant: x flat-indexed as [(j, c)] = flat[j*m + c] holds the j-th
    input of a size-2l sub-DFT for output group c.  A stage computes
    E = x0+x1 (even outputs) and O = (x0-x1)*w_{2l}^j (odd outputs) and
    appends the branch bit as the next output-index bit: (l, 2m) layout
    [E | O] along the group axis."""
    n = 1 << logn
    batch = a.shape[1:-1]
    x = a
    l, m = n // 2, 1
    for _ in range(logn):
        x0 = x[:l * m]
        x1 = x[l * m:]
        # w_{2l}^j, j = i // m: subsample tw_flat by the stage stride, then
        # repeat each entry m times via broadcast (both clean ops)
        stride = n // (2 * l)
        w = tw_flat[::stride][:l]                       # (l, 16)
        w = jnp.broadcast_to(w[:, None, :], (l, m, 16)).reshape(
            (l * m,) + (1,) * len(batch) + (16,))
        w = jnp.broadcast_to(w, x1.shape)
        e = add(FR, x0, x1)
        o = mont_mul(FR, sub(FR, x0, x1), w)
        eg = e.reshape((l, m) + batch + (16,))
        og = o.reshape((l, m) + batch + (16,))
        x = jnp.concatenate([eg, og], axis=1).reshape((n,) + batch + (16,))
        l //= 2
        m *= 2
    return x


def ntt(plan: NTTPlan, a):
    """Forward in-order NTT over axis 0 of (n, ..., 16) Montgomery-form
    limbs: out[i] = sum_j a[j] omega^(ij).  Interior axes are batch dims
    (the four-step sharded NTT transforms matrix columns in place)."""
    return _ntt_run(plan.logn, plan.perm, plan.tw_flat, a)


@partial(jax.jit, static_argnums=0)
def _intt_run(logn: int, perm, tw_flat, n_inv, a):
    out = _ntt_run(logn, perm, tw_flat, a)
    return mont_mul(FR, out, jnp.broadcast_to(n_inv, out.shape))


def intt(plan_fwd: NTTPlan, a):
    """Inverse NTT using the inverse-omega plan + 1/n scaling."""
    inv_plan = get_plan(plan_fwd.n, inv_mod(plan_fwd.omega, R))
    return _intt_run(inv_plan.logn, inv_plan.perm, inv_plan.tw_flat,
                     inv_plan.n_inv, a)
