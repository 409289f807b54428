"""Timestamp + conditional-secrets circuits: mock + real proofs.

Mirrors the reference tests timestamp.rs:259-275 and
conditional_secrets.rs:297-323 (same witness vectors), plus real-prover
round-trips the reference never had (SURVEY §4).
"""
import pytest

from halo2tpu.circuits.conditional_secrets import IdentityCircuit
from halo2tpu.circuits.timestamp import TimestampCircuit, timestamp_of, ist_to_utc
from halo2tpu.plonk.keygen import keygen
from halo2tpu.plonk.mock import MockProver
from halo2tpu.plonk.prover import create_proof
from halo2tpu.plonk.srs import setup
from halo2tpu.plonk.verifier import verify_proof


@pytest.fixture(scope="module")
def srs6():
    return setup(6)


def test_timestamp_witness_math():
    # reference vector: 2023-07-08 12:34:56 (timestamp.rs:262-269)
    assert timestamp_of(2023, 7, 8, 12, 34, 56) == 1688819696
    assert timestamp_of(1970, 1, 1, 0, 0, 0) == 0
    assert ist_to_utc(timestamp_of(2023, 7, 8, 12, 34, 56)) == 1688819696 - 19800


def test_timestamp_reference_leapyear_quirk():
    """The reference's leap_years_before (timestamp.rs:204-206) does not count
    the current year's own Feb 29, so Mar+ dates of leap years are one day
    short of true UNIX time.  We reproduce the reference bit-for-bit."""
    from datetime import datetime, timezone

    def true_ts(*a):
        return int(datetime(*a, tzinfo=timezone.utc).timestamp())

    assert timestamp_of(2024, 1, 15, 0, 0, 0) == true_ts(2024, 1, 15)
    assert timestamp_of(2024, 3, 1, 0, 0, 0) == true_ts(2024, 3, 1) - 86400


def test_timestamp_mock_and_proof(srs6):
    c = TimestampCircuit(2023, 7, 8, 12, 34, 56)
    MockProver.run(6, c, []).assert_satisfied()
    pk, vk = keygen(c, 6, srs6)
    proof = create_proof(pk, srs6, c, [], rng_seed=11)
    assert verify_proof(vk, srs6, [], proof)


def test_timestamp_strict_mode(srs6):
    c = TimestampCircuit(2023, 7, 8, 12, 34, 56, strict=True)
    MockProver.run(6, c, []).assert_satisfied()
    bad = TimestampCircuit(2023, 13, 8, 12, 34, 56, strict=True)
    assert MockProver.run(6, bad, []).verify(), "month=13 must fail strict gate"


IDENTITY_ARGS = dict(
    reveal_age_above_18=True, age_above_18=1, qr_data_age_above_18=1,
    reveal_gender=True, gender=77, qr_data_gender=77,
    reveal_pincode=True, pincode=110051, qr_data_pincode=110051,
    reveal_state=True, state=[68, 101, 108, 104, 105],  # "Delhi"
    qr_data_state=[68, 101, 108, 104, 105],
)


def test_identity_mock_and_proof(srs6):
    c = IdentityCircuit(**IDENTITY_ARGS)
    MockProver.run(4, c, []).assert_satisfied()
    pk, vk = keygen(c, 4, setup(4))
    proof = create_proof(pk, setup(4), c, [], rng_seed=5)
    assert verify_proof(vk, setup(4), [], proof)


def test_identity_negative():
    args = dict(IDENTITY_ARGS)
    args["gender"] = 70  # mismatch: unconditional equality must fail
    assert MockProver.run(4, IdentityCircuit(**args), []).verify()
    args = dict(IDENTITY_ARGS)
    args["reveal_age_above_18"] = True
    args["age_above_18"] = 0
    args["qr_data_age_above_18"] = 1
    assert MockProver.run(4, IdentityCircuit(**args), []).verify()


def test_identity_reference_quirk_preserved():
    """Gender mismatch fails even with reveal_gender=False — the reference's
    unconditional equality (conditional_secrets.rs:125-130)."""
    args = dict(IDENTITY_ARGS)
    args["reveal_gender"] = False
    args["gender"] = 0
    assert MockProver.run(4, IdentityCircuit(**args), []).verify()
    # gated_reveals mode: hidden gender must be 0 and passes
    assert not MockProver.run(
        4, IdentityCircuit(**args, gated_reveals=True), []).verify()


def test_lookup_circuit_real_proof_engine_parity():
    """Real-prover round-trip of a circuit WITH lookups (range chip), and
    host/jax engine byte parity of the device-resident lookup compression
    + grand-product path (prover.py eval_expr_lagrange)."""
    import jax
    # XLA:CPU's compiler segfaults on one of this test's programs when
    # compiled late in a long suite session (passes in isolation and with
    # a fresh compiler state); observed at compiler.py
    # backend_compile_and_load with and without the persistent cache.
    jax.clear_caches()
    from test_gadgets import RangeHarness

    def body(gate, rng):
        a = gate.load_witness(37)
        rng.range_check(a, 6)
        b = gate.load_witness(63)
        rng.range_check(b, 6)
        rng.check_less_than(a, b, 6)

    c = RangeHarness(body)
    srs8 = setup(8)
    pk, vk = keygen(c, 8, srs8)
    p_host = create_proof(pk, srs8, c, [], rng_seed=7, engine="host")
    assert verify_proof(vk, srs8, [], p_host)
    p_jax = create_proof(pk, srs8, c, [], rng_seed=7, engine="jax")
    assert p_jax == p_host
