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
    """(n, 3, 16) -> list of host affine points.  ONE device read: after
    the first device->host transfer the axon runtime charges a ~30 ms
    round-trip per sync, so the three coordinates ride a single decode."""
    arr = arr.reshape(-1, 3, NLIMB)
    flat = FQ.decode(arr.reshape(-1, NLIMB))
    xs = flat[0::3]
    ys = flat[1::3]
    zs = flat[2::3]
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


def _mulk(xs, ys):
    """Batch k independent field muls in ONE mont_mul call (stacked along a
    new leading axis).  Halves the traced-graph size of point formulas —
    XLA compile time grows super-linearly in mul count — and fills vector
    lanes better at small batch."""
    out = mont_mul(FQ, jnp.stack(xs, axis=0), jnp.stack(ys, axis=0))
    return [out[i] for i in range(len(xs))]


def pdbl(p):
    """Jacobian doubling, identity-safe (z=0 -> z3=0)."""
    x, y, z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    a, b, z3 = _mulk([x, y, fadd(FQ, y, y)], [x, y, z])
    xb = fadd(FQ, x, b)
    c, xb2 = _mulk([b, xb], [b, xb])
    d = fsub(FQ, xb2, fadd(FQ, a, c))
    d = fadd(FQ, d, d)
    e = fadd(FQ, fadd(FQ, a, a), a)
    f, = _mulk([e], [e])
    x3 = fsub(FQ, f, fadd(FQ, d, d))
    c8 = fadd(FQ, c, c)
    c8 = fadd(FQ, c8, c8)
    c8 = fadd(FQ, c8, c8)
    edx, = _mulk([e], [fsub(FQ, d, x3)])
    y3 = fsub(FQ, edx, c8)
    return jnp.stack([x3, y3, z3], axis=-2)


def padd(p, q):
    """Full Jacobian addition with identity/double/inverse handling."""
    x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    x2, y2, z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    z1z1, z2z2 = _mulk([z1, z2], [z1, z2])
    u1, u2, t1, t2 = _mulk([x1, x2, y1, y2], [z2z2, z1z1, z2, z1])
    s1, s2 = _mulk([t1, t2], [z2z2, z1z1])
    h = fsub(FQ, u2, u1)
    hh = fadd(FQ, h, h)
    zz = fadd(FQ, z1, z2)
    rr = fsub(FQ, s2, s1)
    rr = fadd(FQ, rr, rr)
    i, zzsq, r2 = _mulk([hh, zz, rr], [hh, zz, rr])
    j, v = _mulk([h, u1], [i, i])
    x3 = fsub(FQ, fsub(FQ, r2, j), fadd(FQ, v, v))
    rvx, s1j, z3 = _mulk(
        [rr, s1, fsub(FQ, fsub(FQ, zzsq, z1z1), z2z2)],
        [fsub(FQ, v, x3), j, h])
    y3 = fsub(FQ, rvx, fadd(FQ, s1j, s1j))
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


def padd_mixed(p, q):
    """Jacobian p += affine q (madd-2007-bl): 11 field muls vs padd's 17 —
    the MSM row-fold hot path always adds SRS base points, which are affine
    (q given as (..., 3, 16) with Z = 1, or Z = 0 for padding/infinity).

    Handles identity operands; does NOT handle p == q (doubling): summing
    distinct random SRS bases hits that case with probability ~2^-254 per
    add, and a hit would only make the proof fail verification, not forge
    one (completeness-only risk)."""
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    x2, y2, z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    Z1Z1, t0 = _mulk([Z1, y2], [Z1, Z1])
    U2, S2 = _mulk([x2, t0], [Z1Z1, Z1Z1])
    H = fsub(FQ, U2, X1)
    r = fsub(FQ, S2, Y1)
    r = fadd(FQ, r, r)
    ZH = fadd(FQ, Z1, H)
    HH, rr, zh2 = _mulk([H, r, ZH], [H, r, ZH])
    i = fadd(FQ, HH, HH)
    i = fadd(FQ, i, i)
    J, V = _mulk([H, X1], [i, i])
    X3 = fsub(FQ, fsub(FQ, rr, J), fadd(FQ, V, V))
    y3a, y3b = _mulk([r, Y1], [fsub(FQ, V, X3), J])
    Y3 = fsub(FQ, y3a, fadd(FQ, y3b, y3b))
    Z3 = fsub(FQ, fsub(FQ, zh2, Z1Z1), HH)
    gen = jnp.stack([X3, Y3, Z3], axis=-2)
    out = _psel(fzero(Z1), q, gen)   # p at infinity -> q (z=1 Jacobian)
    return _psel(fzero(z2), p, out)  # q at infinity -> p


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
