"""Fused Pallas TPU kernels for the MSM hot loop (SURVEY N5): batched
Jacobian point addition in limb-major layout.

Replaces the XLA composition in curves/jpoint.py for the MSM fold steps:
XLA materializes every (lanes, 16, 33) convolution intermediate in HBM
(~20 KB/lane/padd of traffic -> ~100 ms per fold step); these kernels keep
the whole field pipeline in VMEM so a fold step touches only the 192 B/lane
of actual point data.

Layout: a point batch is (3, 16, L) uint32 — coordinate (X, Y, Z) major,
16-bit limbs on the sublane axis, L lanes.  Formulas mirror
curves/jpoint.py (madd-2007-bl mixed add; full add with identity/double/
inverse lane masks) — parity-tested against it in tests/test_pallas_ec.py.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.bn254 import Q
from .pallas_field import (
    LimbConstants,
    add_lm,
    const_vec,
    dbl_lm,
    eq_lm,
    is_zero_lm,
    mont_mul_lm,
    mont_sqr_lm,
    mx_args,
    mx_ctx,
    mx_specs,
    select_lm,
    sub_lm,
)

KQ = LimbConstants(Q)
TILE = 512

# identity (1, 1, 0), coords Montgomery
_ID3 = np.stack([
    KQ.one_mont.astype(np.uint32),
    KQ.one_mont.astype(np.uint32),
    np.zeros(16, np.uint32),
])


def _mm(a, b):
    return mont_mul_lm(KQ, a, b)


def _sq(a):
    return mont_sqr_lm(KQ, a)


def _padd_mixed_core(acc3, pts3, valid):
    """Mixed add acc += (x2, y2) where valid (T,) masks real vs identity
    contributions.  acc3/pts3: (3, 16, T).  madd-2007-bl, as jpoint.py:128.
    Returns (out, need_dbl): `out` handles the generic/inverse/identity
    lanes; `need_dbl` (T,) flags acc == point lanes whose doubling the
    CALLER must patch in.  The doubling path is hoisted out so kernels can
    gate its ~7 extra field muls behind a tile-level pl.when — equal-point
    collisions never occur in real MSM folds over distinct SRS bases, but
    silently emitting Z3 = 0 there would corrupt the whole fold."""
    X1, Y1, Z1 = acc3[0], acc3[1], acc3[2]
    x2, y2 = pts3[0], pts3[1]
    Z1Z1 = _sq(Z1)
    t0 = _mm(y2, Z1)
    U2 = _mm(x2, Z1Z1)
    S2 = _mm(t0, Z1Z1)
    H = sub_lm(KQ, U2, X1)
    r = dbl_lm(KQ, sub_lm(KQ, S2, Y1))
    ZH = add_lm(KQ, Z1, H)
    HH = _sq(H)
    rr = _sq(r)
    zh2 = _sq(ZH)
    i = dbl_lm(KQ, dbl_lm(KQ, HH))
    J = _mm(H, i)
    V = _mm(X1, i)
    X3 = sub_lm(KQ, sub_lm(KQ, rr, J), dbl_lm(KQ, V))
    y3a = _mm(r, sub_lm(KQ, V, X3))
    y3b = _mm(Y1, J)
    Y3 = sub_lm(KQ, y3a, dbl_lm(KQ, y3b))
    Z3 = sub_lm(KQ, sub_lm(KQ, zh2, Z1Z1), HH)
    gen = jnp.stack([X3, Y3, Z3])

    t = Z1.shape[-1]
    same_x = is_zero_lm(H)
    same_y = is_zero_lm(sub_lm(KQ, S2, Y1))
    inf = jnp.stack([const_vec(KQ.one_mont, t), const_vec(KQ.one_mont, t),
                     jnp.zeros((16, t), jnp.uint32)])
    out = gen
    out = jnp.where((same_x & ~same_y)[None, None, :], inf, out)
    p_inf = is_zero_lm(Z1)
    q_jac = jnp.stack([x2, y2, const_vec(KQ.one_mont, t)])
    out = jnp.where(p_inf[None, None, :], q_jac, out)
    out = jnp.where(valid[None, None, :], out, acc3)
    need_dbl = same_x & same_y & ~p_inf & valid
    return out, need_dbl


def _padd_mixed_lm(acc3, pts3, valid):
    """Mixed add with the doubling lanes resolved inline (jit/parity path;
    kernels use _padd_mixed_core + pl.when instead)."""
    out, need_dbl = _padd_mixed_core(acc3, pts3, valid)
    return jnp.where(need_dbl[None, None, :], _pdbl_lm(acc3), out)


def _pdbl_lm(p3):
    """Jacobian doubling, identity-safe (jpoint.py:73)."""
    x, y, z = p3[0], p3[1], p3[2]
    a = _sq(x)
    b = _sq(y)
    z3 = _mm(dbl_lm(KQ, y), z)
    xb = add_lm(KQ, x, b)
    c = _sq(b)
    xb2 = _sq(xb)
    d = dbl_lm(KQ, sub_lm(KQ, xb2, add_lm(KQ, a, c)))
    e = add_lm(KQ, dbl_lm(KQ, a), a)
    f = _sq(e)
    x3 = sub_lm(KQ, f, dbl_lm(KQ, d))
    c8 = dbl_lm(KQ, dbl_lm(KQ, dbl_lm(KQ, c)))
    edx = _mm(e, sub_lm(KQ, d, x3))
    y3 = sub_lm(KQ, edx, c8)
    return jnp.stack([x3, y3, z3])


def _padd_core(p3, q3):
    """Full Jacobian add (jpoint.py:92) with identity/inverse masks.
    Returns (out, need_dbl); doubling lanes patched by the caller (see
    _padd_mixed_core)."""
    x1, y1, z1 = p3[0], p3[1], p3[2]
    x2, y2, z2 = q3[0], q3[1], q3[2]
    z1z1 = _sq(z1)
    z2z2 = _sq(z2)
    u1 = _mm(x1, z2z2)
    u2 = _mm(x2, z1z1)
    t1 = _mm(y1, z2)
    t2 = _mm(y2, z1)
    s1 = _mm(t1, z2z2)
    s2 = _mm(t2, z1z1)
    h = sub_lm(KQ, u2, u1)
    hh = dbl_lm(KQ, h)
    zz = add_lm(KQ, z1, z2)
    rr = dbl_lm(KQ, sub_lm(KQ, s2, s1))
    i = _sq(hh)
    zzsq = _sq(zz)
    r2 = _sq(rr)
    j = _mm(h, i)
    v = _mm(u1, i)
    x3 = sub_lm(KQ, sub_lm(KQ, r2, j), dbl_lm(KQ, v))
    rvx = _mm(rr, sub_lm(KQ, v, x3))
    s1j = _mm(s1, j)
    z3 = _mm(sub_lm(KQ, sub_lm(KQ, zzsq, z1z1), z2z2), h)
    y3 = sub_lm(KQ, rvx, dbl_lm(KQ, s1j))
    gen = jnp.stack([x3, y3, z3])

    p_inf = is_zero_lm(z1)
    q_inf = is_zero_lm(z2)
    same_x = eq_lm(u1, u2)
    same_y = eq_lm(s1, s2)
    t = gen.shape[-1]
    inf = jnp.stack([const_vec(_ID3[0], t), const_vec(_ID3[1], t),
                     jnp.zeros((16, t), jnp.uint32)])

    out = gen
    out = jnp.where((same_x & ~same_y)[None, None, :], inf, out)
    out = jnp.where(q_inf[None, None, :], p3, out)
    out = jnp.where(p_inf[None, None, :], q3, out)
    need_dbl = same_x & same_y & ~p_inf & ~q_inf
    return out, need_dbl


def _padd_lm(p3, q3):
    """Full Jacobian add with doubling lanes resolved inline."""
    out, need_dbl = _padd_core(p3, q3)
    return jnp.where(need_dbl[None, None, :], _pdbl_lm(p3), out)


# ---------------------------------------------------------------------------
# pallas_call wrappers

def _mixed_kernel(acc_ref, pts_ref, bits_ref, mpinv_ref, mp_ref, out_ref):
    with mx_ctx(KQ, mpinv_ref[...], mp_ref[...]):
        acc = acc_ref[:]
        valid = (bits_ref[0] != 0) & ~is_zero_lm(pts_ref[2])
        out, need_dbl = _padd_mixed_core(acc, pts_ref[:], valid)
        out_ref[:] = out

        @pl.when(jnp.any(need_dbl))
        def _patch_doubling():   # never taken for distinct-base MSM folds
            out_ref[:] = jnp.where(need_dbl[None, None, :], _pdbl_lm(acc),
                                   out_ref[:])


def _add_kernel(p_ref, q_ref, mpinv_ref, mp_ref, out_ref):
    with mx_ctx(KQ, mpinv_ref[...], mp_ref[...]):
        p = p_ref[:]
        out, need_dbl = _padd_core(p, q_ref[:])
        out_ref[:] = out

        @pl.when(jnp.any(need_dbl))
        def _patch_doubling():   # taken only in table-build / degenerate
            out_ref[:] = jnp.where(need_dbl[None, None, :], _pdbl_lm(p),
                                   out_ref[:])


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


@partial(jax.jit, donate_argnums=0)
def fold_mixed(acc, pts, bits):
    """acc (3, 16, L) += mask(bits) * pts, lanewise.  pts (3, 16, L) affine
    points (Z = Montgomery 1, or all-zero Z for identity padding); bits
    (1, L) uint32 0/1."""
    L = acc.shape[-1]
    assert L % TILE == 0, L
    grid = (L // TILE,)
    spec3 = pl.BlockSpec((3, 16, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mixed_kernel,
        grid=grid,
        in_specs=[spec3, spec3, bspec] + mx_specs(),
        out_specs=spec3,
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.uint32),
        interpret=_use_interpret(),
    )(acc, pts, bits, *mx_args(KQ))


@partial(jax.jit, donate_argnums=0)
def fold_add(p, q):
    """Full Jacobian add over (3, 16, L) batches (tail tree-folds)."""
    L = p.shape[-1]
    assert L % TILE == 0, L
    grid = (L // TILE,)
    spec3 = pl.BlockSpec((3, 16, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _add_kernel,
        grid=grid,
        in_specs=[spec3, spec3] + mx_specs(),
        out_specs=spec3,
        out_shape=jax.ShapeDtypeStruct(p.shape, jnp.uint32),
        interpret=_use_interpret(),
    )(p, q, *mx_args(KQ))


def _mixed_tiled_kernel(rep: int, acc_ref, pts_ref, bits_ref, mpinv_ref,
                        mp_ref, out_ref):
    """Like _mixed_kernel but pts_ref holds only C points shared by every
    (bit-plane, batch) lane group: the MSM row fold adds the same C base
    points into 254*B accumulator groups, so the block is replicated
    in-kernel instead of materializing a (3, 16, L) broadcast in HBM."""
    with mx_ctx(KQ, mpinv_ref[...], mp_ref[...]):
        pts = pts_ref[:]
        if rep > 1:
            pts = jnp.concatenate([pts] * rep, axis=-1)
        acc = acc_ref[:]
        valid = (bits_ref[0] != 0) & ~is_zero_lm(pts[2])
        out, need_dbl = _padd_mixed_core(acc, pts, valid)
        out_ref[:] = out

        @pl.when(jnp.any(need_dbl))
        def _patch_doubling():
            out_ref[:] = jnp.where(need_dbl[None, None, :], _pdbl_lm(acc),
                                   out_ref[:])


def _pick_tile(L: int, c: int | None = None) -> int:
    """Pick a lane-tile size: Mosaic requires the last block dim to be a
    multiple of 128 or the whole array.  Prefers 512-lane tiles; falls back
    to a single whole-array block (small tail-fold arrays)."""
    for t in (512, 256, 128):
        if L % t == 0 and (c is None or (c <= t and t % c == 0)):
            return t
    # no aligned divisor: callers (fold_add_any) pad the lane axis to a
    # 128-multiple; whole-array blocks OOM the VMEM stack for large L
    return 128


@partial(jax.jit, donate_argnums=0, static_argnums=3)
def _fold_mixed_tiled(acc, pts_c, bits, tile):
    L = acc.shape[-1]
    c = pts_c.shape[-1]
    assert L % tile == 0 and tile % c == 0, (L, tile, c)
    rep = tile // c
    grid = (L // tile,)
    spec_acc = pl.BlockSpec((3, 16, tile), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    spec_pts = pl.BlockSpec((3, 16, c), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_mixed_tiled_kernel, rep),
        grid=grid,
        in_specs=[spec_acc, spec_pts, bspec] + mx_specs(),
        out_specs=spec_acc,
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.uint32),
        interpret=_use_interpret(),
    )(acc, pts_c, bits, *mx_args(KQ))


def fold_mixed_tiled(acc, pts_c, bits):
    """acc (3, 16, L) += mask(bits) * tile(pts_c): one MSM row-fold step.
    pts_c (3, 16, C) with C | L; bits (1, L)."""
    return _fold_mixed_tiled(acc, pts_c, bits, _pick_tile(acc.shape[-1],
                                                          pts_c.shape[-1]))


# (The in-kernel windowed table select that lived here cost ~27 ms/step in
# Mosaic relayouts; the select now happens in XLA as an exact one-hot f32
# einsum — ops/msm.py:_row_step_onehot — and the fold reuses fold_mixed.)


@partial(jax.jit, donate_argnums=0, static_argnums=2)
def _fold_add_tile(p, q, tile):
    L = p.shape[-1]
    grid = (L // tile,)
    spec3 = pl.BlockSpec((3, 16, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _add_kernel,
        grid=grid,
        in_specs=[spec3, spec3] + mx_specs(),
        out_specs=spec3,
        out_shape=jax.ShapeDtypeStruct(p.shape, jnp.uint32),
        interpret=_use_interpret(),
    )(p, q, *mx_args(KQ))


def fold_add_any(p, q):
    """fold_add for any lane count (pads to a tile multiple with z=0
    identity lanes, which _padd_lm passes through)."""
    L = p.shape[-1]
    tile = _pick_tile(L)
    if L % tile:
        pad = tile - L % tile
        p = jnp.pad(p, ((0, 0), (0, 0), (0, pad)))
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad)))
    out = _fold_add_tile(p, q, tile)
    return out[:, :, :L]


def _dbl_kernel(p_ref, mpinv_ref, mp_ref, out_ref):
    with mx_ctx(KQ, mpinv_ref[...], mp_ref[...]):
        out_ref[:] = _pdbl_lm(p_ref[:])


@partial(jax.jit, static_argnums=1)
def _fold_dbl_tile(p, tile):
    L = p.shape[-1]
    grid = (L // tile,)
    spec3 = pl.BlockSpec((3, 16, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _dbl_kernel,
        grid=grid,
        in_specs=[spec3] + mx_specs(),
        out_specs=spec3,
        out_shape=jax.ShapeDtypeStruct(p.shape, jnp.uint32),
        interpret=_use_interpret(),
    )(p, *mx_args(KQ))


def fold_dbl_any(p):
    """Batched Jacobian doubling over (3, 16, L), any lane count."""
    L = p.shape[-1]
    tile = _pick_tile(L)
    if L % tile:
        p = jnp.pad(p, ((0, 0), (0, 0), (0, tile - L % tile)))
    return _fold_dbl_tile(p, tile)[:, :, :L]


def identity_lm(L: int):
    """(3, 16, L) identity points (1, 1, 0), coords Montgomery (device)."""
    one = jnp.broadcast_to(jnp.asarray(KQ.one_mont)[:, None], (16, L))
    z = jnp.zeros((16, L), jnp.uint32)
    return jnp.stack([one, one, z])


# layout converters (lane-major (..., 3, 16) <-> limb-major (3, 16, L))

def to_limb_major(pts):
    """(..., 3, 16) -> (3, 16, L)."""
    flat = pts.reshape(-1, 3, 16)
    return jnp.transpose(flat, (1, 2, 0))


def from_limb_major(arr, shape_prefix):
    """(3, 16, L) -> (*shape_prefix, 3, 16)."""
    return jnp.transpose(arr, (2, 0, 1)).reshape(tuple(shape_prefix) + (3, 16))
