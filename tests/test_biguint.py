"""BigUint chip (SURVEY L4): every instruction computes the right value AND
yields a satisfiable constraint set; tampered witnesses are rejected.
Mirrors the reference op surface (/root/reference/src/big_uint/instructions.rs).
"""
import random

import pytest

from halo2tpu.fields.bn254 import R
from halo2tpu.gadgets.biguint import AssignedBigUint, BigUintChip, RefreshAux
from halo2tpu.gadgets.flexgate import FlexGateConfig, GateChip
from halo2tpu.gadgets.range import RangeChip, RangeStrategyConfig
from halo2tpu.plonk.circuit import Circuit, ConstraintSystem
from halo2tpu.plonk.mock import MockProver

K = 11
LIMB_BITS = 8  # small limbs keep the mock prover fast; algorithms identical


class BigUintHarness(Circuit):
    def __init__(self, body, num_advice=8, lookup_bits=8, num_lookup=4):
        self.body = body
        self.num_advice = num_advice
        self.lookup_bits = lookup_bits
        self.num_lookup = num_lookup

    def configure(self, cs):
        gcfg = FlexGateConfig.configure(cs, self.num_advice)
        rcfg = RangeStrategyConfig.configure(
            cs, gcfg, self.lookup_bits, self.num_lookup)
        return gcfg, rcfg

    def synthesize(self, config, asn):
        gcfg, rcfg = config
        gate = GateChip(gcfg, asn)
        rng = RangeChip(rcfg, gate, asn)
        rng.load_table()
        big = BigUintChip(gate, rng, LIMB_BITS)
        self.body(gate, big)


def run(body, should_pass=True, **kw):
    mp = MockProver.run(K, BigUintHarness(body, **kw), [])
    fails = mp.verify()
    if should_pass:
        assert not fails, fails[:3]
    else:
        assert fails


def test_assign_and_constants():
    def body(g, big):
        a = big.assign_integer(0xDEADBEEF, 32)
        assert a.value == 0xDEADBEEF
        assert [c.value for c in a.limbs] == [0xEF, 0xBE, 0xAD, 0xDE]
        c = big.assign_constant(0x1234)
        assert c.num_limbs == 2 and c.value == 0x1234
        m = big.max_value(3)
        assert m.value == (1 << 24) - 1

    run(body)


def test_add_sub():
    random.seed(1)
    av, bv = random.getrandbits(32), random.getrandbits(32)

    def body(g, big):
        a = big.assign_integer(av, 32)
        b = big.assign_integer(bv, 32)
        s = big.add(a, b)
        assert s.value == av + bv
        assert s.num_limbs == 5
        hi, lo = max(av, bv), min(av, bv)
        d, over = big.sub_unsafe(big.assign_integer(hi, 32),
                                 big.assign_integer(lo, 32))
        assert over.value == 0 and d.value == hi - lo
        _, over2 = big.sub_unsafe(big.assign_integer(lo, 32),
                                  big.assign_integer(hi, 32))
        assert over2.value == (1 if hi != lo else 0)

    run(body)


def test_mul_and_refresh():
    av, bv = 0xABCDEF12, 0x3456789A

    def body(g, big):
        a = big.assign_integer(av, 32)
        b = big.assign_integer(bv, 32)
        m = big.mul(a, b)
        assert m.muled and m.value == av * bv
        aux = RefreshAux(LIMB_BITS, 4, 4)
        f = big.refresh(m, aux)
        assert not f.muled
        got = sum(c.value << (LIMB_BITS * i) for i, c in enumerate(f.limbs))
        assert got == av * bv

    run(body)


def test_modular_ops():
    nv = 0xF123_4567_89AB_CDEF  # 64-bit modulus
    av, bv = 0x1234_5678_9ABC_DEF0 % nv, 0xDEAD_BEEF_0BAD_F00D % nv

    def body(g, big):
        n = big.assign_integer(nv, 64)
        a = big.assign_integer(av, 64)
        b = big.assign_integer(bv, 64)
        assert big.add_mod(a, b, n).value == (av + bv) % nv
        assert big.sub_mod(a, b, n).value == (av - bv) % nv
        r = big.mul_mod(a, b, n)
        assert r.value == av * bv % nv
        assert big.square_mod(a, n).value == av * av % nv

    run(body)


def test_pow_mod():
    nv = 0xE123_4567  # 32-bit modulus
    av = 0x1234_5678 % nv

    def body(g, big):
        n = big.assign_integer(nv, 32)
        a = big.assign_integer(av, 32)
        e = g.load_witness(13)
        p = big.pow_mod(a, e, n, 5)
        assert p.value == pow(av, 13, nv)
        pf = big.pow_mod_fixed_exp(a, 17, n)
        assert pf.value == pow(av, 17, nv)

    run(body)


def test_comparisons():
    def body(g, big):
        a = big.assign_integer(1000, 16)
        b = big.assign_integer(2000, 16)
        assert big.is_zero(big.assign_integer(0, 16)).value == 1
        assert big.is_zero(a).value == 0
        assert big.is_equal_fresh(a, a).value == 1
        assert big.is_equal_fresh(a, b).value == 0
        assert big.is_less_than(a, b).value == 1
        assert big.is_less_than(b, a).value == 0
        assert big.is_less_than_or_equal(a, a).value == 1
        assert big.is_greater_than(b, a).value == 1
        assert big.is_greater_than_or_equal(a, a).value == 1
        assert big.is_in_field(a, b).value == 1
        big.assert_equal_fresh(a, a)
        big.assert_in_field(a, b)

    run(body)


def test_is_equal_muled():
    av, bv, cv = 0xAABB, 0xCCDD, 0xEEFF

    def body(g, big):
        a = big.assign_integer(av, 16)
        b = big.assign_integer(bv, 16)
        c = big.assign_integer(cv, 16)
        ab = big.mul(a, b)
        ba = big.mul(b, a)
        ac = big.mul(a, c)
        assert big.is_equal_muled(ab, ba, 2, 2).value == 1
        assert big.is_equal_muled(ab, ac, 2, 2).value == 0
        big.assert_equal_muled(ab, ba, 2, 2)

    run(body)


def test_mulmod_cheat_rejected():
    """Forged remainder must break the a*b == q*n + r carry equality."""
    nv, av, bv = 0xF1234567, 0x12345678 % 0xF1234567, 0x0BADF00D

    class Cheat(BigUintHarness):
        def synthesize(self, config, asn):
            gcfg, rcfg = config
            gate = GateChip(gcfg, asn)
            rng = RangeChip(rcfg, gate, asn)
            rng.load_table()
            big = BigUintChip(gate, rng, LIMB_BITS)
            n = big.assign_integer(nv, 32)
            a = big.assign_integer(av, 32)
            b = big.assign_integer(bv, 32)
            r = big.mul_mod(a, b, n)
            # tamper the first remainder limb after the fact
            asn.advice[r.limbs[0].col.index][r.limbs[0].row] = (
                (r.limbs[0].value + 1) % R)

    mp = MockProver.run(K, Cheat(None), [])
    assert mp.verify()


def test_refresh_aux_growth():
    aux = RefreshAux(64, 32, 32)
    # 32-limb 64-bit product limbs carry into at most 2 extra limbs
    assert max(aux.increased_limbs_vec) <= 2
    assert len(aux.increased_limbs_vec) >= 63
