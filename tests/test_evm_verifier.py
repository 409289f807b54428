"""EVM acceptance of the UNCHANGED reference Solidity verifier.

Executes /root/reference/solidity_verifier_contract/contract.sol (PSE
halo2-solidity-verifier output for the Square circuit, contract.sol:443-451
gate, 1120-byte proof contract.sol:226) through the Yul interpreter with real
EVM semantics (keccak transcript, extcodecopy vk reads, BN254 precompiles)
against proof bytes produced by this framework — the BASELINE compatibility
row.
"""
import os

import pytest

from halo2tpu.circuits.signal import SquareCircuit
from halo2tpu.evm.verifier import CONTRACT_PATH, build_vk_code, evm_verify
from halo2tpu.plonk.keygen import keygen
from halo2tpu.plonk.prover import create_proof
from halo2tpu.plonk.srs import setup
from halo2tpu.plonk.verifier import verify_proof

pytestmark = pytest.mark.skipif(
    not os.path.exists(CONTRACT_PATH),
    reason="reference contract.sol not available")


@pytest.fixture(scope="module")
def square_proof():
    srs = setup(4)
    circuit = SquareCircuit(5)  # reference vector, signal.rs:92
    pk, vk = keygen(circuit, 4, srs)
    proof = create_proof(pk, srs, circuit, circuit.instances(), rng_seed=0)
    assert verify_proof(vk, srs, circuit.instances(), proof)
    return srs, vk, circuit, proof


def test_contract_accepts_framework_proof(square_proof):
    srs, vk, circuit, proof = square_proof
    assert len(proof) == 0x0460  # contract.sol:226 hardcoded length check
    assert evm_verify(vk, srs, circuit.instances(), proof)


def test_contract_rejects_tampered_proof(square_proof):
    srs, vk, circuit, proof = square_proof
    # flip one byte in each region: commitments, evals, opening proof
    for pos in (3, 200, 700, 1100):
        bad = bytearray(proof)
        bad[pos] ^= 1
        assert not evm_verify(vk, srs, circuit.instances(), bytes(bad))


def test_contract_rejects_wrong_instances(square_proof):
    srs, vk, circuit, proof = square_proof
    assert not evm_verify(vk, srs, [[7]], proof)


def test_contract_rejects_wrong_length(square_proof):
    srs, vk, circuit, proof = square_proof
    assert not evm_verify(vk, srs, circuit.instances(), proof + b"\x00" * 32)
    assert not evm_verify(vk, srs, circuit.instances(), proof[:-32])


def test_vk_code_layout(square_proof):
    """vk blob must cover the contract's full 0x3a0-byte extcodecopy
    (contract.sol:308): 21 header words + (1 fixed + 3 sigma) points."""
    srs, vk, circuit, proof = square_proof
    code = build_vk_code(vk, srs)
    assert len(code) >= 0x03a0
    assert int.from_bytes(code[:32], "big") == vk.transcript_repr
    assert int.from_bytes(code[32:64], "big") == 1  # num_instances
