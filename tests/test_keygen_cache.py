"""keygen_cached integrity: the structure digest must tie a cached pk to
the circuit's constraint system (round-4 stale-pk guard), and the compact
permutation-mapping pk format must reproduce the host sigma labels."""
import numpy as np
import pytest

from halo2tpu.circuits.signal import SquareCircuit
from halo2tpu.circuits.timestamp import TimestampCircuit
from halo2tpu.plonk.circuit import Assignment, ConstraintSystem
from halo2tpu.plonk.keygen import (build_permutation_mapping,
                                   cs_structure_digest, keygen,
                                   keygen_cached, sigma_labels_host)
from halo2tpu.plonk.srs import setup


def test_digest_depends_on_structure_not_witness():
    assert (cs_structure_digest(SquareCircuit(5))
            == cs_structure_digest(SquareCircuit(9)))
    assert (cs_structure_digest(SquareCircuit(5))
            != cs_structure_digest(TimestampCircuit(2023, 7, 8, 12, 34, 56)))


def test_keygen_cached_recovers_identical_pk(tmp_path):
    srs = setup(4)
    c = SquareCircuit(5)
    pk1, vk1 = keygen_cached(c, 4, srs, cache_key="t", cache_dir=str(tmp_path))
    pk2, vk2 = keygen_cached(c, 4, srs, cache_key="t", cache_dir=str(tmp_path))
    assert vk1.transcript_repr == vk2.transcript_repr
    assert np.array_equal(pk1.perm_mapping, pk2.perm_mapping)
    for a, b in zip(pk1.fixed_values, pk2.fixed_values):
        assert np.array_equal(a, b)


def test_sigma_labels_match_direct_construction():
    """Labels from the compact mapping equal a from-first-principles
    construction: identity cells keep delta^j * omega^i; a copy (a <-> b)
    swaps the two cells' labels (2-cycle)."""
    from halo2tpu.fields.bn254 import R, FR_DELTA, fr_root_of_unity
    cs = ConstraintSystem()
    c = SquareCircuit(5)
    c.configure(cs)
    n = 16
    # hand-build a tiny mapping: two columns, one swap
    cols = cs.permutation_columns
    assert len(cols) >= 2
    copies = [((cols[0], 3), (cols[1], 5))]
    m = build_permutation_mapping(cs, n, copies)
    sig = sigma_labels_host(m, n)
    omega = fr_root_of_unity(4)
    opow = [pow(omega, i, R) for i in range(n)]
    deltas = [pow(FR_DELTA, j, R) for j in range(len(cols))]
    for j in range(len(cols)):
        for i in range(n):
            if (j, i) == (0, 3):
                assert sig[j][i] == deltas[1] * opow[5] % R
            elif (j, i) == (1, 5):
                assert sig[j][i] == deltas[0] * opow[3] % R
            else:
                assert sig[j][i] == deltas[j] * opow[i] % R


def test_fixed_key_roundtrip():
    from halo2tpu.utils.rsa_native import load_fixed_key, sign_pkcs1v15_sha256
    key, n, e = load_fixed_key("tests/golden/rsa_key_2048.json")
    assert n.bit_length() == 2048
    sig = sign_pkcs1v15_sha256(key, b"fixed")
    em = pow(sig, e, n).to_bytes(256, "big")
    assert em[0] == 0 and em[1] == 1  # PKCS#1 v1.5 type-1 block
