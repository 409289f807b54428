"""RSA chip (SURVEY L4): in-circuit RSASSA-PKCS1-v1_5 verification of real
2048-bit signatures produced by the `cryptography` library (the reference's
equivalent harness signs with the Rust `rsa` crate inside synthesize,
/root/reference/src/lib.rs:347-349).
"""
import pytest

from halo2tpu.fields.bn254 import R
from halo2tpu.gadgets.biguint import BigUintChip
from halo2tpu.gadgets.flexgate import FlexGateConfig, GateChip
from halo2tpu.gadgets.range import RangeChip, RangeStrategyConfig
from halo2tpu.gadgets.rsa import RSAChip, RSAPublicKey, RSASignature
from halo2tpu.plonk.circuit import Circuit, ConstraintSystem
from halo2tpu.plonk.mock import MockProver
from halo2tpu.utils.rsa_native import (
    generate_key,
    sha256_words_le,
    sign_pkcs1v15_sha256,
)

K = 14
NUM_ADVICE = 48
LOOKUP_BITS = 12
NUM_LOOKUP = 12
LIMB_BITS = 64
DEFAULT_BITS = 2048
EXP_BITS = 17


class RSAHarness(Circuit):
    def __init__(self, body):
        self.body = body

    def configure(self, cs):
        gcfg = FlexGateConfig.configure(cs, NUM_ADVICE)
        rcfg = RangeStrategyConfig.configure(cs, gcfg, LOOKUP_BITS, NUM_LOOKUP)
        return gcfg, rcfg

    def synthesize(self, config, asn):
        gcfg, rcfg = config
        gate = GateChip(gcfg, asn)
        rng = RangeChip(rcfg, gate, asn)
        rng.load_table()
        big = BigUintChip(gate, rng, LIMB_BITS)
        rsa_chip = RSAChip(big, DEFAULT_BITS, EXP_BITS)
        self.body(gate, rsa_chip)


@pytest.fixture(scope="module")
def keypair():
    return generate_key(2048)


def test_pkcs1v15_valid_signature(keypair):
    key, n, e = keypair
    msg = b"halo2tpu rsa chip test vector"
    sig = sign_pkcs1v15_sha256(key, msg)
    words = sha256_words_le(msg)

    seen = {}

    def body(gate, chip):
        pk = chip.assign_public_key(RSAPublicKey(n, e))
        s = chip.assign_signature(RSASignature(sig))
        hcells = [gate.load_witness(w) for w in words]
        ok = chip.verify_pkcs1v15_signature(pk, hcells, s)
        gate.assert_is_const(ok, 1)
        seen["ok"] = ok.value

    mp = MockProver.run(K, RSAHarness(body), [])
    assert seen["ok"] == 1
    fails = mp.verify()
    assert not fails, fails[:3]


def test_pkcs1v15_invalid_signature(keypair):
    """A wrong digest must drive the validity bit to 0 (constraints still
    satisfiable — the bit itself is the output, as in the reference API)."""
    key, n, e = keypair
    msg = b"halo2tpu rsa chip test vector"
    sig = sign_pkcs1v15_sha256(key, msg)
    words = sha256_words_le(b"a different message")

    seen = {}

    def body(gate, chip):
        pk = chip.assign_public_key(RSAPublicKey(n, e))
        s = chip.assign_signature(RSASignature(sig))
        hcells = [gate.load_witness(w) for w in words]
        ok = chip.verify_pkcs1v15_signature(pk, hcells, s)
        seen["ok"] = ok.value

    mp = MockProver.run(K, RSAHarness(body), [])
    assert seen["ok"] == 0
    assert not mp.verify()


def test_variable_exponent_modpow(keypair):
    key, n, e = keypair
    msg = b"var-exp"
    sig = sign_pkcs1v15_sha256(key, msg)

    seen = {}

    def body(gate, chip):
        pk = chip.assign_public_key(RSAPublicKey(n, e, e_is_fixed=False))
        s = chip.assign_signature(RSASignature(sig))
        powed = chip.modpow_public_key(s.c, pk)
        seen["em"] = powed.value

    mp = MockProver.run(K, RSAHarness(body), [])
    assert seen["em"] == pow(sig, e, n)
    fails = mp.verify()
    assert not fails, fails[:3]
