"""Native Poseidon sponge parity/semantics (SURVEY N13).

Reference counterpart: PSE `poseidon` crate used natively for the nullifier
(/root/reference/src/lib.rs:890-912) with T=5 RATE=4 R_F=8 R_P=57.
Pinned regression vectors guard the Grain-LFSR parameter derivation — any
change to the constants/MDS generation breaks these.
"""
from halo2tpu.fields.bn254 import R
from halo2tpu.ops.poseidon import (
    Poseidon,
    generate_parameters,
    hash_elements,
    nullifier,
    permute,
)

# Regression vectors pinned at first derivation (halo2tpu.ops.poseidon):
RC00 = 0x2A4203A01C69B91A87E05F81737E9947C9E709C9C258B39A640351D11BFB77CB
MDS00 = 0x14C2C125FBDFEBB54922BAF600A990C07624F037CD6344CC2F5CAC0C46A8858B
H12 = 0x0F8AF9F52112F09E0F203855E953C7A95743F267DD1803EF31702DC9D0BE71F8
H1TO8 = 0x095288862EE7711E4DA09EEA9FA10BE2E4F006C84B5F5EFE9BB802679EC732A5
NULLIFIER_0_31 = 0x0EC09F1637F1698A236FF1914C145C6CFDAB417E330D25C193BB154425520809


def test_parameter_shapes_and_pins():
    rcs, mds = generate_parameters()
    assert len(rcs) == 8 + 57 and all(len(row) == 5 for row in rcs)
    assert len(mds) == 5 and all(len(row) == 5 for row in mds)
    assert all(0 <= c < R for row in rcs for c in row)
    assert rcs[0][0] == RC00
    assert mds[0][0] == MDS00


def test_mds_invertible():
    import numpy as np  # noqa: F401  (fraction-free check below, no numpy)
    _, mds = generate_parameters()
    # Gaussian elimination over F_r: full rank iff no zero pivot survives.
    m = [list(row) for row in mds]
    for col in range(5):
        piv = next((r for r in range(col, 5) if m[r][col] % R), None)
        assert piv is not None, "MDS is singular"
        m[col], m[piv] = m[piv], m[col]
        inv = pow(m[col][col], R - 2, R)
        for r in range(col + 1, 5):
            f = m[r][col] * inv % R
            m[r] = [(m[r][i] - f * m[col][i]) % R for i in range(5)]


def test_hash_regression_vectors():
    assert hash_elements([1, 2]) == H12
    assert hash_elements(list(range(1, 9))) == H1TO8


def test_incremental_update_equals_oneshot():
    vals = [i * i + 3 for i in range(11)]
    s = Poseidon()
    s.update(vals[:2])
    s.update(vals[2:7])
    s.update(vals[7:])
    assert s.squeeze() == hash_elements(vals)


def test_rate_boundary_padding():
    """An exact-RATE input still gets a fresh padding permutation: hashing
    [a,b,c,d] must differ from hashing [a,b,c,d,1] truncated semantics."""
    four = [5, 6, 7, 8]
    h4 = hash_elements(four)
    h5 = hash_elements(four + [1])
    assert h4 != h5
    # Manual composition: absorb chunk, then padding-only permutation.
    st = [(1 << 64) % R, *four]
    st = permute(st)
    st[1] = (st[1] + 1) % R
    st = permute(st)
    assert st[1] == h4


def test_nullifier_recipe():
    photo = bytes(range(32))
    assert nullifier(12345678, photo) == NULLIFIER_0_31
    assert nullifier(12345678, photo) == hash_elements(
        [12345678] + list(photo))
