"""Multi-scalar multiplication on TPU (SURVEY N5) — the prover's dominant
cost (one MSM per polynomial commitment).

TPU-first algorithm choice: *bit-serial masked tree reduction* rather than a
translation of CPU Pippenger.  Pippenger's bucket accumulation is an
irregular scatter — hostile to vector lanes — while for each scalar bit b,
  partial_b = sum_{i : bit_b(s_i)=1} P_i
is a dense masked tree-reduce: log2(n) rounds of full-width Jacobian adds,
total ~n lane-adds per bit, no sort, no scatter.  254 bits x n adds beats
the sorted-scan Pippenger variant (~windows * n log n) on lane work, and the
final combine sum_b 2^b partial_b is 254 host doublings.

Scalars batch: commitments share the same SRS bases, so the tree reduce is
vmapped over the scalar-vector axis — one compiled kernel commits many
polynomials (amortizes weight loads; the batch axis fills the VPU).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..curves import g1 as G1
from ..curves.jpoint import (
    affine_to_device, device_to_affine, identity_points, padd, _psel,
)
from ..fields.bn254 import R
from ..fields.jfield import NLIMB, ints_to_limbs

SCALAR_BITS = 254


_FOLD_WIDTH = 1024  # lanes kept live through the tail fold


@jax.jit
def _bit_partials(points, scalar_limbs):
    """points: (n, 3, 16); scalar_limbs: (B, n, 16) plain (non-Montgomery)
    16-bit limbs.  Returns (B, 254, 3, 16): per-bit masked sums.

    Structured for compile time: the reduction is two fori_loops whose bodies
    each trace ONE padd — (1) fold n/C rows of width C into an accumulator,
    (2) tree-fold the C survivors at fixed width with masked strided adds —
    so the graph size is independent of n and of the 254-bit loop.
    """
    n = points.shape[0]
    bsz = scalar_limbs.shape[0]
    C = min(n, _FOLD_WIDTH)
    rows = n // C
    logc = C.bit_length() - 1
    idx = jnp.arange(C)
    pts_b = jnp.broadcast_to(points, (bsz, n, 3, NLIMB)).reshape(
        bsz, rows, C, 3, NLIMB)
    ident_row = identity_points((bsz, C))

    def one_bit(b):
        limb = b // 16
        shift = b % 16
        bits = ((scalar_limbs[:, :, limb] >> shift) & 1).reshape(bsz, rows, C)

        def fold_row(i, acc):
            sel = _psel(bits[:, i] == 1, pts_b[:, i], ident_row)
            return padd(acc, sel)

        acc = jax.lax.fori_loop(0, rows, fold_row, ident_row)

        def fold_tail(l, acc):
            stride = C >> (l + 1)
            other = jnp.roll(acc, -stride, axis=1)
            folded = padd(acc, other)
            return _psel(idx < stride, folded, acc)

        acc = jax.lax.fori_loop(0, logc, fold_tail, acc)
        return acc[:, 0]

    partials = jax.lax.map(one_bit, jnp.arange(SCALAR_BITS))
    # (254, B, 3, 16) -> (B, 254, 3, 16)
    return jnp.transpose(partials, (1, 0, 2, 3))


def msm(points_device, scalars_batch: list[list[int]]) -> list:
    """MSM of the same base points against a batch of scalar vectors.

    points_device: (n, 3, 16) from jpoint.affine_to_device (n power of 2;
    pad with identity).  scalars_batch: B lists of python ints.
    Returns B host affine points.
    """
    n = points_device.shape[0]
    arrs = []
    for scalars in scalars_batch:
        s = [v % R for v in scalars] + [0] * (n - len(scalars))
        arrs.append(ints_to_limbs(s))
    limbs = jnp.asarray(np.stack(arrs))
    partials = _bit_partials(points_device, limbs)
    out = []
    for bi, aff in enumerate(_partials_to_affine(partials)):
        out.append(aff)
    return out


def _partials_to_affine(partials) -> list:
    """(B, 254, 3, 16) device partial sums -> B host points via Horner
    doubling from the top bit."""
    host = device_to_affine(partials.reshape(-1, 3, NLIMB))
    bsz = partials.shape[0]
    out = []
    for b in range(bsz):
        rows = host[b * SCALAR_BITS:(b + 1) * SCALAR_BITS]
        acc = (1, 1, 0)
        for p in reversed(rows):
            acc = G1.jac_double(acc)
            if p is not None:
                acc = G1.jac_add(acc, G1.to_jacobian(p))
        out.append(G1.from_jacobian(acc))
    return out


class MSMContext:
    """Caches device-resident SRS bases (padded to a power of two)."""

    def __init__(self, points: list):
        n = len(points)
        npad = 1 << (n - 1).bit_length() if n > 1 else 1
        pts = list(points) + [None] * (npad - n)
        self.n = n
        self.points = affine_to_device(pts)

    def commit_batch(self, scalar_vectors: list[list[int]]) -> list:
        return msm(self.points, scalar_vectors)

    def commit(self, scalars: list[int]):
        return self.commit_batch([scalars])[0]
