"""Batched BN254 G1 arithmetic for JAX/TPU: Jacobian coords over 16-bit-limb
Montgomery Fq (SURVEY N3).

Points are (..., 3, 16) uint32 arrays: coords X, Y, Z along axis -2, each a
Montgomery-form Fq element.  Identity = Z == 0 (X=1, Y=1 by convention).
Exceptional cases (identity operands, doubling, inverses) are handled with
lane masks so the same fused kernel covers every input — the TPU-idiomatic
replacement for halo2curves' branchy host code.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.bn254 import Q, fq_inv
from ..fields.jfield import (
    FQ, NLIMB, add as fadd, eq as feq, ints_to_limbs, is_zero as fzero,
    mont_mul, neg as fneg, select as fselect, sub as fsub,
)


def affine_to_device(points) -> jax.Array:
    """list of host affine points (x, y) or None -> (n, 3, 16) device array."""
    xs, ys, zs = [], [], []
    for p in points:
        if p is None:
            xs.append(1)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(p[0])
            ys.append(p[1])
            zs.append(1)
    ax = FQ.encode(xs)
    ay = FQ.encode(ys)
    az = FQ.encode(zs)
    return jnp.stack([ax, ay, az], axis=-2)


def device_to_affine(arr) -> list:
    """(n, 3, 16) -> list of host affine points."""
    arr = arr.reshape(-1, 3, NLIMB)
    xs = FQ.decode(arr[:, 0])
    ys = FQ.decode(arr[:, 1])
    zs = FQ.decode(arr[:, 2])
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = fq_inv(z)
            zi2 = zi * zi % Q
            out.append((x * zi2 % Q, y * zi2 % Q * zi % Q))
    return out


def _mul(a, b):
    return mont_mul(FQ, a, b)


def pdbl(p):
    """Jacobian doubling, identity-safe (z=0 -> z3=0)."""
    x, y, z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    a = _mul(x, x)
    b = _mul(y, y)
    c = _mul(b, b)
    xb = fadd(FQ, x, b)
    d = fsub(FQ, _mul(xb, xb), fadd(FQ, a, c))
    d = fadd(FQ, d, d)
    e = fadd(FQ, fadd(FQ, a, a), a)
    f = _mul(e, e)
    x3 = fsub(FQ, f, fadd(FQ, d, d))
    c8 = fadd(FQ, c, c)
    c8 = fadd(FQ, c8, c8)
    c8 = fadd(FQ, c8, c8)
    y3 = fsub(FQ, _mul(e, fsub(FQ, d, x3)), c8)
    z3 = _mul(fadd(FQ, y, y), z)
    return jnp.stack([x3, y3, z3], axis=-2)


def padd(p, q):
    """Full Jacobian addition with identity/double/inverse handling."""
    x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    x2, y2, z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    z1z1 = _mul(z1, z1)
    z2z2 = _mul(z2, z2)
    u1 = _mul(x1, z2z2)
    u2 = _mul(x2, z1z1)
    s1 = _mul(_mul(y1, z2), z2z2)
    s2 = _mul(_mul(y2, z1), z1z1)
    h = fsub(FQ, u2, u1)
    i = fadd(FQ, h, h)
    i = _mul(i, i)
    j = _mul(h, i)
    rr = fsub(FQ, s2, s1)
    rr = fadd(FQ, rr, rr)
    v = _mul(u1, i)
    x3 = fsub(FQ, fsub(FQ, _mul(rr, rr), j), fadd(FQ, v, v))
    s1j = _mul(s1, j)
    y3 = fsub(FQ, _mul(rr, fsub(FQ, v, x3)), fadd(FQ, s1j, s1j))
    zz = fadd(FQ, z1, z2)
    z3 = _mul(fsub(FQ, fsub(FQ, _mul(zz, zz), z1z1), z2z2), h)
    gen = jnp.stack([x3, y3, z3], axis=-2)

    p_inf = fzero(z1)
    q_inf = fzero(z2)
    same_x = feq(u1, u2)
    same_y = feq(s1, s2)
    dbl = pdbl(p)
    inf = _identity_like(gen)

    out = gen
    out = _psel(same_x & same_y, dbl, out)        # doubling case
    out = _psel(same_x & ~same_y, inf, out)       # p + (-p) = O
    out = _psel(q_inf, p, out)
    out = _psel(p_inf, q, out)
    return out


def _psel(mask, a, b):
    return jnp.where(mask[..., None, None], a, b)


# identity point (1, 1, 0) with coords in Montgomery form (1 -> R mod q),
# precomputed host-side so it is a trace-safe constant
_ID_NP = np.stack([
    ints_to_limbs([FQ.r])[0],
    ints_to_limbs([FQ.r])[0],
    np.zeros(NLIMB, dtype=np.uint32),
])


def _identity_like(arr):
    return jnp.broadcast_to(jnp.asarray(_ID_NP), arr.shape)


def identity_points(shape_prefix) -> jax.Array:
    return _identity_like(jnp.zeros(tuple(shape_prefix) + (3, NLIMB), jnp.uint32))
