"""Native C++ host runtime: keccak256 parity vs the Python reference, gate
evaluator parity vs the Python mock path, and the full mock prover using the
native evaluator.
"""
import random

import pytest

import halo2tpu.native as native
from halo2tpu.fields.bn254 import R
from halo2tpu.ops.keccak import keccak256 as py_keccak
from halo2tpu.plonk.circuit import Circuit, ConstraintSystem
from halo2tpu.plonk.mock import MockProver

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain")


def test_keccak_parity():
    random.seed(0)
    for ln in (0, 1, 31, 32, 135, 136, 137, 500):
        data = bytes(random.randrange(256) for _ in range(ln))
        assert native.keccak256(data) == py_keccak(data)


def test_keccak_known_vector():
    # keccak256("") — the Ethereum empty-string hash
    assert native.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")


def test_gate_evaluator_parity():
    """Random expression over random columns: native rows == python rows."""
    from halo2tpu.plonk.expression import AdviceQuery, Constant, FixedQuery

    random.seed(1)
    n, u = 32, 25
    adv = [[random.randrange(R) for _ in range(n)] for _ in range(2)]
    fx = [[random.randrange(100) for _ in range(n)]]
    a0 = AdviceQuery(0, 0)
    a1 = AdviceQuery(1, 1)
    f0 = FixedQuery(0, -1)
    expr = f0 * (a0 * a0 + a1 * Constant(7) - a0) - a1

    def py_eval(row):
        def val(src, col, rot):
            return src[col][(row + rot) % n] % R
        return expr.evaluate(
            constant=lambda c: c % R,
            fixed=lambda q: val(fx, q.column_index, q.rotation),
            advice=lambda q: val(adv, q.column_index, q.rotation),
            instance=lambda q: 0,
            negate=lambda x: (-x) % R,
            add=lambda x, y: (x + y) % R,
            mul=lambda x, y: x * y % R)

    expect = [r for r in range(u) if py_eval(r) != 0]
    ev = native.NativeGateEvaluator(fx, adv, [], n, u)
    got = ev.eval_poly(expr, max_fail=n)
    assert got == expect


def test_mock_prover_uses_native():
    from halo2tpu.circuits.signal import SquareCircuit
    c = SquareCircuit(5)
    MockProver.run(4, c, c.instances()).assert_satisfied()

    class Bad(SquareCircuit):
        def synthesize(self, config, asn):
            asn.enable_selector(config["selector"], 0)
            asn.assign_advice(config["advice"][0], 0, self.signal_hash)
            asn.assign_advice(config["advice"][1], 0, 99)

    fails = MockProver.run(4, Bad(5), [[25]]).verify()
    assert any(f.kind == "gate" for f in fails)
