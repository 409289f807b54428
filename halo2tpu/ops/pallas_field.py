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
        self.p_inv_full = self._limbs((-pow(p, -1, 1 << 256)) % (1 << 256))
        r = (1 << 256) % p
        self.one_mont = self._limbs(r)

    @staticmethod
    def _limbs(v: int) -> np.ndarray:
        return np.array([(v >> (LIMB_BITS * i)) & MASK for i in range(NLIMB)],
                        dtype=np.uint32)


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


def mont_mul_lm(kc: LimbConstants, a, b):
    """Montgomery product a*b*R^-1 mod p.  a, b: (16, T) -> (16, T)."""
    T33 = _conv(a, b, 33)
    tl, _ = _carry(T33, NLIMB)
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
    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = mont_mul_lm(kc, a_ref[...], b_ref[...])
    return kern


@_partial(jax.jit, static_argnums=0)
def _mont_mul_lane_tiled(kc: LimbConstants, at, bt):
    """at, bt: (16, L) with L a multiple of the tile."""
    L = at.shape[-1]
    tile = min(L, _FLAT_TILE)
    spec = pl.BlockSpec((NLIMB, tile), lambda i: (0, i))
    return pl.pallas_call(
        _mm_kernel_for(kc),
        grid=(L // tile,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NLIMB, L), jnp.uint32),
        interpret=_use_interpret(),
    )(at, bt)


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
