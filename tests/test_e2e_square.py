"""End-to-end: Square (signal) circuit proof, verified by the python port of
the reference on-chain verifier — the SURVEY §7 step-6 milestone closing the
loop on every protocol detail (transcript, SHPLONK, blinding, proof layout).
"""
import pytest

from halo2tpu.circuits.signal import SquareCircuit
from halo2tpu.plonk.keygen import keygen
from halo2tpu.plonk.mock import MockProver
from halo2tpu.plonk.prover import create_proof
from halo2tpu.plonk.srs import setup
from halo2tpu.plonk.verifier import verify_proof

K = 4


@pytest.fixture(scope="module")
def srs():
    return setup(K)


def test_mock_square():
    c = SquareCircuit(5)
    MockProver.run(K, c, c.instances()).assert_satisfied()


def test_proof_layout_matches_contract(srs):
    """Proof must be 0x0460 = 1120 bytes — the length hardcoded in
    contract.sol:221 (2 advice + 3 perm z + 1 random + 2 quotient points,
    15 evals, W, W')."""
    c = SquareCircuit(5)
    pk, vk = keygen(c, K, srs)
    assert vk.cs.degree() == 3
    assert vk.cs.blinding_factors() == 5          # rotation -6, contract.sol:544-550
    assert vk.cs.num_permutation_chunks() == 3    # contract.sol phase2: 3 z points
    assert vk.domain.quotient_poly_degree == 2    # contract.sol phase3: 2 points
    proof = create_proof(pk, srs, c, c.instances(), rng_seed=42)
    assert len(proof) == 0x0460


def test_prove_verify(srs):
    c = SquareCircuit(5)
    pk, vk = keygen(c, K, srs)
    proof = create_proof(pk, srs, c, c.instances(), rng_seed=42)
    assert verify_proof(vk, srs, c.instances(), proof)


def test_proof_is_seed_deterministic(srs):
    c = SquareCircuit(5)
    pk, vk = keygen(c, K, srs)
    p1 = create_proof(pk, srs, c, c.instances(), rng_seed=7)
    p2 = create_proof(pk, srs, c, c.instances(), rng_seed=7)
    p3 = create_proof(pk, srs, c, c.instances(), rng_seed=8)
    assert p1 == p2
    assert p1 != p3
    assert verify_proof(vk, srs, c.instances(), p3)


def test_tampered_proof_rejected(srs):
    c = SquareCircuit(5)
    pk, vk = keygen(c, K, srs)
    proof = create_proof(pk, srs, c, c.instances(), rng_seed=42)
    for off in (0, 130, 700, len(proof) - 1):
        bad = bytearray(proof)
        bad[off] ^= 1
        assert not verify_proof(vk, srs, c.instances(), bytes(bad))


def test_instance_binding(srs):
    c = SquareCircuit(7, constrain_instance=True)
    pk, vk = keygen(c, K, srs)
    proof = create_proof(pk, srs, c, c.instances(), rng_seed=1)
    assert verify_proof(vk, srs, [[49]], proof)
    assert not verify_proof(vk, srs, [[50]], proof)


def test_invalid_witness_fails_mock():
    class BadSquare(SquareCircuit):
        def synthesize(self, config, asn):
            asn.enable_selector(config["selector"], 0)
            asn.assign_advice(config["advice"][0], 0, self.signal_hash)
            asn.assign_advice(config["advice"][1], 0, self.signal_hash + 1)

    mp = MockProver.run(K, BadSquare(5), [[25]])
    assert mp.verify(), "expected gate failure"
