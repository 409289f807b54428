"""Parity of the Pallas MSM kernels (limb-major field/EC) against the
host/XLA golden paths.  Runs in interpret mode on CPU; the TPU path is
exercised by bench.py on hardware (same code, interpret=False).
"""
import os
import random

import numpy as np
import jax.numpy as jnp
import pytest

from halo2tpu.fields.bn254 import Q, R, G1_GEN
from halo2tpu.fields.jfield import FQ, mont_mul
from halo2tpu.curves import g1 as G1
from halo2tpu.curves.jpoint import affine_to_device, device_to_affine
from halo2tpu.ops.pallas_field import (
    LimbConstants, add_lm, mont_mul_lm, sub_lm,
)
from halo2tpu.ops.pallas_ec import (
    _fold_mixed_tiled, fold_add_any, from_limb_major, to_limb_major,
)

KQ = LimbConstants(Q)
random.seed(20240818)


def test_mont_mul_lm_matches_jfield():
    vals_a = [random.randrange(Q) for _ in range(16)]
    vals_b = [random.randrange(Q) for _ in range(16)] + []
    a = FQ.encode(vals_a)
    b = FQ.encode(vals_b)
    ref = mont_mul(FQ, a, b)
    got = jnp.transpose(mont_mul_lm(KQ, jnp.transpose(a), jnp.transpose(b)))
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_add_sub_lm():
    vals_a = [random.randrange(Q) for _ in range(8)]
    vals_b = [random.randrange(Q) for _ in range(8)]
    a = jnp.transpose(FQ.encode(vals_a))
    b = jnp.transpose(FQ.encode(vals_b))
    s = FQ.decode(jnp.transpose(add_lm(KQ, a, b)))
    d = FQ.decode(jnp.transpose(sub_lm(KQ, a, b)))
    # decode() removes Montgomery form; compare in plain ints
    assert s == [(x + y) % Q for x, y in zip(vals_a, vals_b)]
    assert d == [(x - y) % Q for x, y in zip(vals_a, vals_b)]


def test_fold_mixed_tiled_parity():
    """Mixed add over 128 lanes incl. masked and identity lanes."""
    L = 128
    pts = [G1.scalar_mul(G1_GEN, 3 + i) for i in range(L - 1)] + [None]
    accs = [G1.scalar_mul(G1_GEN, 900 + i) for i in range(L - 2)] + [None] * 2
    bits = np.ones((1, L), np.uint32)
    bits[0, 5] = 0
    got = from_limb_major(
        _fold_mixed_tiled(to_limb_major(affine_to_device(accs)),
                          to_limb_major(affine_to_device(pts)),
                          jnp.asarray(bits), 128), (L,))
    exp = []
    for i, (a, p) in enumerate(zip(accs, pts)):
        if bits[0, i] == 0 or p is None:
            exp.append(a)
        elif a is None:
            exp.append(p)
        else:
            exp.append(G1.add(a, p))
    assert device_to_affine(got) == exp


def test_fold_add_any_parity():
    """Full add incl. identity, doubling, inverse lanes and lane padding."""
    L = 100   # deliberately unaligned: exercises the pad-to-128 path
    ps = [G1.scalar_mul(G1_GEN, 40 + i) for i in range(L - 2)] + [None] * 2
    qs = [G1.scalar_mul(G1_GEN, 140 + i) for i in range(L - 4)] + [
        ps[L - 4],             # doubling lane
        G1.neg(ps[L - 3]),     # inverse lane -> infinity
        None,                  # p=None, q=None -> infinity
        G1_GEN]                # p=None -> q
    got = from_limb_major(
        fold_add_any(to_limb_major(affine_to_device(ps + [None] * 28))[:, :, :L],
                     to_limb_major(affine_to_device(qs + [None] * 28))[:, :, :L]),
        (L,))
    exp = [G1.add(p, q) for p, q in zip(ps, qs)]
    assert device_to_affine(got) == exp


@pytest.mark.slow
def test_window_table_parity():
    """Precomputed multiple table entries equal w*P for every base."""
    os.environ["HALO2TPU_PALLAS"] = "1"
    try:
        from halo2tpu.ops.msm import TABLE_W, precompute_window_table
        n = 8
        pts = [G1.scalar_mul(G1_GEN, 5 + i) for i in range(n - 1)] + [None]
        tab = precompute_window_table(to_limb_major(affine_to_device(pts)))
        for w in range(TABLE_W):
            got = device_to_affine(
                from_limb_major(tab[:, 16 * w:16 * (w + 1), :], (n,)))
            exp = [None if (p is None or w == 0) else G1.scalar_mul(p, w)
                   for p in pts]
            assert got == exp, f"window {w}"
    finally:
        os.environ.pop("HALO2TPU_PALLAS", None)


@pytest.mark.slow
def test_msm_pallas_interpret_parity():
    os.environ["HALO2TPU_PALLAS"] = "1"
    try:
        from halo2tpu.ops.msm import MSMContext
        n = 16
        pts = [G1.scalar_mul(G1_GEN, random.randrange(R)) for _ in range(n)]
        ctx = MSMContext(pts)
        sv = [random.randrange(R) for _ in range(n)]
        assert ctx.commit(sv) == G1.msm(pts, sv)
    finally:
        os.environ.pop("HALO2TPU_PALLAS", None)
