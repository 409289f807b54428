"""Flagship RSA-SHA256 circuit (reference lib.rs:256-452): real 2048-bit
keypair, real signature, mock-prover satisfiability with the n-limbs + digest
public-input layout.  Message length kept short here to bound mock-prover
time; bench.py runs the full-size configuration on the real prover.
"""
import hashlib

import pytest

from halo2tpu.circuits.rsa_sha256 import NUM_LIMBS, RSASha256Circuit
from halo2tpu.plonk.mock import MockProver
from halo2tpu.utils.rsa_native import generate_key, sign_pkcs1v15_sha256

K = 15
MSG = b"the quick brown fox jumps over the lazy dog" * 2  # 86 bytes, 2 blocks


@pytest.fixture(scope="module")
def signed():
    key, n, e = generate_key(2048)
    sig = sign_pkcs1v15_sha256(key, MSG)
    return n, sig


def test_rsa_sha256_mock(signed):
    n, sig = signed
    c = RSASha256Circuit(MSG, n, sig)
    mp = MockProver.run(K, c, c.instances())
    fails = mp.verify()
    assert not fails, fails[:3]
    inst = c.instances()
    assert len(inst[0]) == NUM_LIMBS
    assert bytes(inst[1]) == hashlib.sha256(MSG).digest()


def test_rsa_sha256_wrong_signature_fails(signed):
    n, sig = signed
    c = RSASha256Circuit(MSG, n, sig + 1)
    mp = MockProver.run(K, c, c.instances())
    assert mp.verify(), "forged signature must be rejected"


def test_one_vk_two_lengths_two_keys():
    """Reference scenario `test_rsa_signature_with_hash_circuit2`
    (/root/reference/src/lib.rs:454-611): TWO independent keypairs signing
    messages of DIFFERENT lengths, verified by the SAME circuit structure
    (one vk) — the dynamic-length SHA path makes the constraint system
    independent of the actual message length."""
    from halo2tpu.circuits.rsa_sha256 import RSASha256Params
    from halo2tpu.plonk.keygen import cs_structure_digest

    p = RSASha256Params(max_msg_len=128)   # sized down to bound mock time
    msg1 = bytes(range(107))               # two lengths, two keys
    msg2 = b"short message"
    circs = []
    for msg in (msg1, msg2):
        key, n, e = generate_key(2048)
        sig = sign_pkcs1v15_sha256(key, msg)
        circs.append(RSASha256Circuit(msg, n, sig, params=p))
    d1, d2 = (cs_structure_digest(c) for c in circs)
    assert d1 == d2, "vk structure must be independent of message length"
    for c in circs:
        mp = MockProver.run(K, c, c.instances())
        fails = mp.verify()
        assert not fails, fails[:3]
