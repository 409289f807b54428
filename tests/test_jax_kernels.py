"""Bit-parity of the JAX/TPU kernels against the python-int golden path
(SURVEY §4 strategy item 2).  Runs on the CPU backend (conftest) with tiny
shapes; the TPU path is exercised by bench.py.
"""
import random

import pytest

from halo2tpu.fields.bn254 import R, Q, G1_GEN, fr_root_of_unity
from halo2tpu.fields import jfield
from halo2tpu.fields.jfield import FR, FQ


random.seed(0)


def test_field_roundtrip_and_mul():
    xs = [0, 1, R - 1, R - 2] + [random.randrange(R) for _ in range(28)]
    ys = [1, R - 1, 0, 5] + [random.randrange(R) for _ in range(28)]
    ax, ay = FR.encode(xs), FR.encode(ys)
    assert FR.decode(ax) == [x % R for x in xs]
    assert FR.decode(jfield.mont_mul(FR, ax, ay)) == [x * y % R for x, y in zip(xs, ys)]
    assert FR.decode(jfield.add(FR, ax, ay)) == [(x + y) % R for x, y in zip(xs, ys)]
    assert FR.decode(jfield.sub(FR, ax, ay)) == [(x - y) % R for x, y in zip(xs, ys)]
    assert FR.decode(jfield.neg(FR, ax)) == [(-x) % R for x in xs]


def test_field_fq():
    xs = [random.randrange(Q) for _ in range(16)]
    ax = FQ.encode(xs)
    assert FQ.decode(jfield.mont_mul(FQ, ax, ax)) == [x * x % Q for x in xs]


def test_batch_inv():
    xs = [random.randrange(1, R) for _ in range(32)]
    ax = FR.encode(xs)
    assert FR.decode(jfield.batch_inv_scan(FR, ax)) == [pow(x, -1, R) for x in xs]


def test_prefix_prod():
    xs = [random.randrange(R) for _ in range(16)]
    ax = FR.encode(xs)
    got = FR.decode(jfield._prefix_prod(FR, ax))
    acc, want = 1, []
    for x in xs:
        acc = acc * x % R
        want.append(acc)
    assert got == want


def test_ntt_parity():
    from halo2tpu.ops.ntt import get_plan, ntt, intt
    from halo2tpu.plonk.polyops import ntt as host_ntt
    k, n = 4, 16
    omega = fr_root_of_unity(k)
    vals = [random.randrange(R) for _ in range(n)]
    plan = get_plan(n, omega)
    a = FR.encode(vals)
    assert FR.decode(ntt(plan, a)) == host_ntt(vals, omega)
    assert FR.decode(intt(plan, ntt(plan, a))) == vals


def test_jpoint_parity():
    from halo2tpu.curves import g1 as G1
    from halo2tpu.curves.jpoint import affine_to_device, device_to_affine, padd, pdbl
    pts = [G1.scalar_mul(G1_GEN, random.randrange(R)) for _ in range(4)] + [None]
    qts = [G1.scalar_mul(G1_GEN, random.randrange(R)) for _ in range(4)] + [None]
    a, b = affine_to_device(pts), affine_to_device(qts)
    assert device_to_affine(padd(a, b)) == [G1.add(p, q) for p, q in zip(pts, qts)]
    assert device_to_affine(pdbl(a)) == [G1.add(p, p) for p in pts]
    assert device_to_affine(padd(a, a)) == [G1.add(p, p) for p in pts]
    neg = affine_to_device([G1.neg(p) for p in pts])
    assert device_to_affine(padd(a, neg)) == [None] * 5


@pytest.mark.slow
@pytest.mark.slow
def test_msm_parity():
    from halo2tpu.curves import g1 as G1
    from halo2tpu.ops.msm import MSMContext
    n = 16
    pts = [G1.scalar_mul(G1_GEN, random.randrange(R)) for _ in range(n)]
    ctx = MSMContext(pts)
    sv = [random.randrange(R) for _ in range(n)]
    assert ctx.commit(sv) == G1.msm(pts, sv)


@pytest.mark.slow
@pytest.mark.slow
def test_jax_engine_proof_byte_parity():
    """The TPU engine must produce byte-identical proofs to the host
    engine for the same witness + seed."""
    from halo2tpu.circuits.signal import SquareCircuit
    from halo2tpu.plonk.keygen import keygen
    from halo2tpu.plonk.prover import create_proof
    from halo2tpu.plonk.srs import setup
    from halo2tpu.plonk.verifier import verify_proof

    k = 3
    c = SquareCircuit(5)
    srs = setup(k)
    pk, vk = keygen(c, k, srs)
    p_host = create_proof(pk, srs, c, c.instances(), rng_seed=9, engine="host")
    p_jax = create_proof(pk, srs, c, c.instances(), rng_seed=9, engine="jax")
    assert p_host == p_jax
    assert verify_proof(vk, srs, c.instances(), p_jax)
