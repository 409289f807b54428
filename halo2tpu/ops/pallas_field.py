"""Limb-major field arithmetic helpers for Pallas TPU kernels (SURVEY N1).

Layout: a field element batch is a (16, T) uint32 array — 16-bit limbs on
the SUBLANE axis (little-endian), T independent lanes on the LANE axis.
This is the transpose of jfield's (n, 16) layout: elementwise limb ops run
at full (8, 128) VPU width, and the 16x16 product convolution becomes 16
full-width multiply/accumulate steps on (16, T) slabs instead of a gathered
(n, 16, 33) HBM-materialized tensor.  Everything here is pure jnp on values,
usable both inside pl.pallas_call kernels (where intermediates live in
VMEM/registers) and under plain jit for parity testing.

All functions assume 16x16-bit products (exact in uint32) and lazy-carry
column sums < 2^21, like jfield (same CIOS/SOS scheme, different layout).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

NLIMB = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1


class LimbConstants:
    """Host-side per-modulus constants as (16,) numpy arrays (baked into
    kernels as literals)."""

    def __init__(self, p: int):
        self.p = p
        self.p_limbs = self._limbs(p)
        p_inv = (-pow(p, -1, 1 << 256)) % (1 << 256)
        self.p_inv_full = self._limbs(p_inv)
        r = (1 << 256) % p
        self.one_mont = self._limbs(r)
        # MXU constant-convolution matrices (see _conv_const_mx): output
        # rows ordered [all lo8 cols | all hi8 cols] so the 16-bit
        # recombine slices contiguously.
        self.mx_pinv = self._conv8_matrix(p_inv, 16)     # (32, 32) f32
        self.mx_p = self._conv8_matrix(p, 32)            # (64, 32) f32

    @staticmethod
    def _limbs(v: int) -> np.ndarray:
        return np.array([(v >> (LIMB_BITS * i)) & MASK for i in range(NLIMB)],
                        dtype=np.uint32)

    @staticmethod
    def _conv8_matrix(v: int, out16: int) -> np.ndarray:
        """Matrix M with M @ x8cat = 8-bit column sums of x * v, where
        x8cat = [x & 0xFF ; x >> 8] stacks the lo/hi 8-bit halves of x's 16
        16-bit limbs.  Row r < out16 is the lo8 of 16-bit output column r;
        row out16 + r is its hi8 (so out16 columns = M[:out16] + 256 *
        M[out16:] after the matmul).  Entries are v's 8-bit limbs (<= 255,
        exact in bf16); per-row sums of 32 products of 8-bit values stay
        < 2^21, so a bf16 x bf16 -> f32 MXU matmul computes them exactly."""
        v8 = [(v >> (8 * c)) & 0xFF for c in range(2 * NLIMB)]
        M = np.zeros((2 * out16, 2 * NLIMB), np.float32)
        for ic in range(2 * NLIMB):
            # input row ic: lo8 of limb ic (8-bit pos 2*ic) for ic < 16,
            # hi8 of limb ic-16 (8-bit pos 2*(ic-16)+1) otherwise
            c1 = 2 * ic if ic < NLIMB else 2 * (ic - NLIMB) + 1
            for oc in range(2 * out16):
                # output row oc: 8-bit pos 2*oc (lo half) for oc < out16,
                # 2*(oc-out16)+1 (hi half) otherwise
                pos = 2 * oc if oc < out16 else 2 * (oc - out16) + 1
                d = pos - c1
                if 0 <= d < 2 * NLIMB:
                    M[oc, ic] = v8[d]
        return M


def _conv(a, b, out_cols: int):
    """Lazy-carry column sums of a*b.  a, b: (16, T) -> (out_cols, T).
    out_cols=33 for the full product, 16 for a mod-2^256 triangular product."""
    t = a.shape[-1]
    acc = jnp.zeros((out_cols, t), jnp.uint32)
    for i in range(NLIMB):
        hi_cols = min(out_cols - i - 1, NLIMB)
        lo_cols = min(out_cols - i, NLIMB)
        if lo_cols <= 0:
            break
        prod = a[i][None, :] * b[:lo_cols]           # (lo_cols, T), exact u32
        lo = prod & MASK
        acc = acc + jnp.pad(lo, ((i, out_cols - i - lo_cols), (0, 0)))
        if hi_cols > 0:
            hi = (prod >> LIMB_BITS)[:hi_cols]
            acc = acc + jnp.pad(hi, ((i + 1, out_cols - i - 1 - hi_cols),
                                     (0, 0)))
    return acc


def _conv_const(a, const_limbs, out_cols: int):
    """Lazy-carry column sums of a * constant.  The constant is supplied as
    16 python-int limbs and enters the kernel as scalar literals (pallas
    kernels may not capture array constants)."""
    t = a.shape[-1]
    acc = jnp.zeros((out_cols, t), jnp.uint32)
    for j in range(NLIMB):
        c = int(const_limbs[j])
        if c == 0 or j >= out_cols:
            continue
        lo_cols = min(out_cols - j, NLIMB)
        hi_cols = min(out_cols - j - 1, NLIMB)
        prod = a[:lo_cols] * np.uint32(c)            # (lo_cols, T), exact u32
        lo = prod & MASK
        acc = acc + jnp.pad(lo, ((j, out_cols - j - lo_cols), (0, 0)))
        if hi_cols > 0:
            hi = (prod >> LIMB_BITS)[:hi_cols]
            acc = acc + jnp.pad(hi, ((j + 1, out_cols - j - 1 - hi_cols),
                                     (0, 0)))
    return acc


def const_vec(limbs, t: int):
    """16 python-int limbs -> (16, t) broadcast, built from scalar literals."""
    return jnp.stack([jnp.full((t,), int(l), jnp.uint32) for l in limbs])


import os as _os
from contextlib import contextmanager


def _use_mxu() -> bool:
    """Constant-convolutions ride the MXU by default (exact: see
    _conv8_matrix); HALO2TPU_NO_MXU=1 falls back to the VPU formulation."""
    return _os.environ.get("HALO2TPU_NO_MXU") != "1"


# Pallas kernels may not capture array constants, so the MXU matrices enter
# each kernel as inputs; mx_ctx hands the traced refs' values down to
# _mont_reduce without threading them through every field-formula signature.
# Outside a ctx the VPU scalar-literal path is used (always kernel-safe).
_MX_STACK: dict[int, list] = {}


@contextmanager
def mx_ctx(kc: "LimbConstants", mpinv, mp):
    """Make (mpinv, mp) — in-kernel values of kc.mx_pinv / kc.mx_p — the
    active MXU operands for kc's modulus within the managed trace."""
    _MX_STACK.setdefault(kc.p, []).append((mpinv, mp))
    try:
        yield
    finally:
        _MX_STACK[kc.p].pop()


def mx_args(kc: "LimbConstants"):
    """The two f32 operands a pallas_call must pass for mx_ctx(kc, ...)."""
    return (jnp.asarray(kc.mx_pinv, jnp.float32),
            jnp.asarray(kc.mx_p, jnp.float32))


def _mx_operands(kc: "LimbConstants"):
    lst = _MX_STACK.get(kc.p)
    return lst[-1] if (lst and _use_mxu()) else None


def _conv_const_mx(x16, M, out16: int):
    """x16 (16, T) EXACT 16-bit limbs times a constant, via one MXU matmul:
    returns (out16, T) uint32 lazy 16-bit column sums (< 2^30).  M is a
    (2*out16, 32) f32 _conv8_matrix for the constant.  Operands are 8-bit
    values held in f32 (bf16-exact), so the f32 HIGHEST matmul — a bf16
    multi-pass on the MXU — has zero low-part terms and every f32 partial
    sum is an integer < 2^24: bit-exact.  (u32 -> bf16 casts are not
    lowerable in Mosaic, hence f32 carriers via int32.)"""
    xcat = jnp.concatenate([x16 & jnp.uint32(0xFF), x16 >> 8], axis=0)
    xf = xcat.astype(jnp.int32).astype(jnp.float32)
    mm = jax.lax.dot_general(
        M, xf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    mm = mm.astype(jnp.int32).astype(jnp.uint32)
    return mm[:out16] + (mm[out16:] << 8)


def _carry(cols, n_out: int):
    """Sequential carry propagation over the first n_out columns.
    Returns ((n_out, T) exact limbs, carry-out (T,))."""
    carry = jnp.zeros_like(cols[0])
    rows = []
    for k in range(n_out):
        cur = cols[k] + carry
        rows.append(cur & MASK)
        carry = cur >> LIMB_BITS
    return jnp.stack(rows), carry


def _cond_sub_p(kc: LimbConstants, limbs16, top):
    """Value limbs16 + top*2^256 in [0, 2p): subtract p if >= p.
    limbs16: (16, T), top: (T,).  Returns canonical (16, T)."""
    p = kc.p_limbs
    c = jnp.ones_like(limbs16[0])
    rows = []
    for i in range(NLIMB):
        d = c + limbs16[i] + np.uint32(MASK - int(p[i]))
        rows.append(d & MASK)
        c = d >> LIMB_BITS
    d16 = c + top + np.uint32(MASK)
    ge_p = (d16 >> LIMB_BITS) > 0
    sub = jnp.stack(rows)
    return jnp.where(ge_p[None, :], sub, limbs16)


def _mont_reduce(kc: LimbConstants, T33):
    """SOS Montgomery reduction of lazy column sums T33 (33, T) -> canonical
    (16, T).  The two constant convolutions (x p^-1 mod 2^256, x p) run as
    exact bf16 MXU matmuls (_conv8_matrix invariant) — they are ~60% of the
    VPU row-ops of the scalar-literal formulation."""
    tl, _ = _carry(T33, NLIMB)
    ops = _mx_operands(kc)
    if ops is not None:
        mx_pinv, mx_p = ops
        m_lazy = _conv_const_mx(tl, mx_pinv, NLIMB)
        m, _ = _carry(m_lazy, NLIMB)
        mp = _conv_const_mx(m, mx_p, 2 * NLIMB)            # (32, T) < 2^30
        Z = T33 + jnp.concatenate(
            [mp, jnp.zeros((1,) + mp.shape[1:], jnp.uint32)], axis=0)
    else:
        m_lazy = _conv_const(tl, kc.p_inv_full, NLIMB)
        m, _ = _carry(m_lazy, NLIMB)
        Z = T33 + _conv_const(m, kc.p_limbs, 33)
    _, z_carry = _carry(Z, NLIMB)          # low half vanishes; keep carry
    carry = z_carry
    rows = []
    for k in range(NLIMB, 33):
        cur = Z[k] + carry
        rows.append(cur & MASK)
        carry = cur >> LIMB_BITS
    # 17 limbs total; value < 2p < 2^257 so rows[16] is the 0/1 top limb
    return _cond_sub_p(kc, jnp.stack(rows[:NLIMB]), rows[NLIMB])


def mont_mul_lm(kc: LimbConstants, a, b):
    """Montgomery product a*b*R^-1 mod p.  a, b: (16, T) -> (16, T)."""
    return _mont_reduce(kc, _conv(a, b, 33))


def mont_sqr_lm(kc: LimbConstants, a):
    """Montgomery square: the 16x16 product triangle is symmetric, so only
    the 136 upper products are computed (diag + doubled cross terms) —
    ~45% fewer VPU multiplies than mont_mul_lm's full convolution."""
    t = a.shape[-1]
    acc = jnp.zeros((33, t), jnp.uint32)
    for i in range(NLIMB):
        # cross terms j > i (doubled) plus the diagonal j == i
        cols = NLIMB - i
        prod = a[i][None, :] * a[i:]                 # (cols, T), exact u32
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        if cols > 1:
            # double the cross part (rows 1..), keep diagonal (row 0) single
            dbl_mask = jnp.concatenate(
                [jnp.zeros((1, t), jnp.uint32),
                 jnp.ones((cols - 1, t), jnp.uint32)])
            lo = lo << dbl_mask
            hi = hi << dbl_mask
        acc = acc + jnp.pad(lo, ((2 * i, 33 - 2 * i - cols), (0, 0)))
        acc = acc + jnp.pad(hi, ((2 * i + 1, 32 - 2 * i - cols), (0, 0)))
    return _mont_reduce(kc, acc)


def add_lm(kc: LimbConstants, a, b):
    s = a + b
    limbs, carry = _carry(s, NLIMB)
    return _cond_sub_p(kc, limbs, carry)


def sub_lm(kc: LimbConstants, a, b):
    """a - b mod p, inputs canonical."""
    p = kc.p_limbs
    c = jnp.ones_like(a[0])
    rows = []
    for i in range(NLIMB):
        d = c + a[i] + np.uint32(int(p[i]) + MASK) - b[i]
        rows.append(d & MASK)
        c = d >> LIMB_BITS
    return _cond_sub_p(kc, jnp.stack(rows), jnp.zeros_like(c))


def dbl_lm(kc: LimbConstants, a):
    return add_lm(kc, a, a)


def is_zero_lm(a):
    """(16, T) -> (T,) bool.  int32 reduction: Mosaic has no unsigned-int
    reductions, and limb sums (< 16 * 2^16) fit int32 exactly."""
    return jnp.sum(a.astype(jnp.int32), axis=0) == 0


def eq_lm(a, b):
    return jnp.sum((a ^ b).astype(jnp.int32), axis=0) == 0


def select_lm(mask, a, b):
    """mask (T,): where(mask, a, b) over (..., 16, T)."""
    return jnp.where(mask[None, :], a, b)


# ---------------------------------------------------------------------------
# Flat (n, 16) pallas entry point: drop-in fast path for jfield.mont_mul.
#
# The XLA formulation (jfield._conv_cols) materializes (n, 16, 33) gather
# products in HBM — ~30x traffic amplification that caps mont_mul at <1% of
# the HBM speed-of-light.  Here the whole SOS reduction runs per-tile in
# VMEM: traffic is exactly read-a + read-b + write-out.  The (n,16)<->(16,T)
# layout flip happens in XLA outside the kernel (same convention as
# pallas_ec.to_limb_major).

import jax
from functools import partial as _partial
from jax.experimental import pallas as pl


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


_KC_CACHE: dict[int, LimbConstants] = {}


def kc_for(p: int) -> LimbConstants:
    """Singleton LimbConstants per modulus (kernels are cached per static
    kc, so object identity must be stable)."""
    if p not in _KC_CACHE:
        _KC_CACHE[p] = LimbConstants(p)
    return _KC_CACHE[p]


_FLAT_TILE = 2048


def _mm_kernel_for(kc: LimbConstants):
    def kern(a_ref, b_ref, mpinv_ref, mp_ref, o_ref):
        with mx_ctx(kc, mpinv_ref[...], mp_ref[...]):
            o_ref[...] = mont_mul_lm(kc, a_ref[...], b_ref[...])
    return kern


def mx_specs():
    """BlockSpecs for the two mx_args operands (whole-matrix blocks)."""
    return [pl.BlockSpec((2 * NLIMB, 2 * NLIMB), lambda *_: (0, 0)),
            pl.BlockSpec((4 * NLIMB, 2 * NLIMB), lambda *_: (0, 0))]


@_partial(jax.jit, static_argnums=0)
def _mont_mul_lane_tiled(kc: LimbConstants, at, bt):
    """at, bt: (16, L) with L a multiple of the tile."""
    L = at.shape[-1]
    tile = min(L, _FLAT_TILE)
    spec = pl.BlockSpec((NLIMB, tile), lambda i: (0, i))
    return pl.pallas_call(
        _mm_kernel_for(kc),
        grid=(L // tile,),
        in_specs=[spec, spec] + mx_specs(),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NLIMB, L), jnp.uint32),
        interpret=_use_interpret(),
    )(at, bt, *mx_args(kc))


def mont_mul_flat(kc: LimbConstants, a, b):
    """a, b: (..., 16) same shape, canonical Montgomery operands -> (..., 16).
    Pads the flattened lane count to a power-of-two bucket (>= tile) so the
    compiled-kernel set stays small."""
    shape = a.shape
    n = 1
    for s in shape[:-1]:
        n *= s
    a2 = a.reshape(n, NLIMB)
    b2 = b.reshape(n, NLIMB)
    npad = max(_FLAT_TILE, 1 << (n - 1).bit_length())
    if npad != n:
        pad = ((0, npad - n), (0, 0))
        a2 = jnp.pad(a2, pad)
        b2 = jnp.pad(b2, pad)
    out = _mont_mul_lane_tiled(kc, a2.T, b2.T)
    return out.T[:n].reshape(shape)
