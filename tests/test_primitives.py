"""Bit-parity tests of host primitives (SURVEY §4 test strategy item 2)."""
import random

from halo2tpu.fields import bn254
from halo2tpu.ops.keccak import keccak256
from halo2tpu.curves import g1 as G1
from halo2tpu.curves.pairing import (
    FQ12_ONE, f12_inv, f12_mul, f12_pow, pairing, pairing_check,
    G2_GEN, g2_is_on_curve, g2_neg, g2_scalar_mul, Q,
)


def test_keccak_vectors():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    # multi-block
    assert keccak256(b"a" * 300).hex() == keccak256(b"a" * 300).hex()


def test_field_constants():
    # DELTA pinned by contract.sol:440
    assert bn254.FR_DELTA == pow(bn254.FR_GENERATOR, 1 << bn254.FR_S, bn254.R)
    w = bn254.fr_root_of_unity(4)
    assert pow(w, 16, bn254.R) == 1 and pow(w, 8, bn254.R) != 1


def test_batch_inv():
    random.seed(0)
    vals = [random.randrange(1, bn254.R) for _ in range(33)] + [0]
    out = bn254.batch_inv(vals)
    for v, i in zip(vals, out):
        if v == 0:
            assert i == 0
        else:
            assert v * i % bn254.R == 1


def test_g1_ops():
    g = bn254.G1_GEN
    assert G1.is_on_curve(g)
    two_g = G1.add(g, g)
    assert G1.is_on_curve(two_g)
    assert G1.scalar_mul(g, 2) == two_g
    assert G1.scalar_mul(g, bn254.R) is None  # order r
    # msm vs naive
    random.seed(1)
    pts = [G1.scalar_mul(g, random.randrange(bn254.R)) for _ in range(10)]
    scs = [random.randrange(bn254.R) for _ in range(10)]
    naive = None
    for p, s in zip(pts, scs):
        naive = G1.add(naive, G1.scalar_mul(p, s))
    assert G1.msm(pts, scs) == naive


def test_pairing_bilinear():
    g = bn254.G1_GEN
    e1 = pairing(g, G2_GEN)
    assert e1 != FQ12_ONE
    assert f12_pow(e1, bn254.R) == FQ12_ONE
    e2 = pairing(G1.scalar_mul(g, 3), G2_GEN)
    e3 = pairing(g, g2_scalar_mul(G2_GEN, 3))
    assert e2 == e3 == f12_pow(e1, 3)
    # e(aP, Q) e(-aP, Q) == 1
    assert pairing_check([
        (G1.scalar_mul(g, 5), G2_GEN),
        (G1.neg(G1.scalar_mul(g, 5)), G2_GEN),
    ])


def test_g2():
    assert g2_is_on_curve(G2_GEN)
    assert g2_is_on_curve(g2_scalar_mul(G2_GEN, 12345))
