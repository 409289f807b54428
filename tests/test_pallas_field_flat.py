"""Flat-layout pallas mont_mul fast path (ops/pallas_field.py): bit parity
with host integer arithmetic, exercised in interpret mode on CPU (the TPU
bench drives the compiled kernel on hardware)."""
import numpy as np

from halo2tpu.fields.bn254 import R
from halo2tpu.fields.jfield import FR
from halo2tpu.ops.pallas_field import kc_for, mont_mul_flat


def test_mont_mul_flat_parity():
    rng = np.random.default_rng(7)
    n = 64
    xs = [int.from_bytes(rng.bytes(31), "big") % R for _ in range(n)]
    ys = [int.from_bytes(rng.bytes(31), "big") % R for _ in range(n)]
    a = FR.encode(xs)
    b = FR.encode(ys)
    out = FR.decode(mont_mul_flat(kc_for(R), a, b))
    assert out == [x * y % R for x, y in zip(xs, ys)]


def test_mont_mul_flat_batched_shape():
    rng = np.random.default_rng(8)
    xs = [int.from_bytes(rng.bytes(31), "big") % R for _ in range(32)]
    a = FR.encode(xs).reshape(4, 8, 16)
    out = mont_mul_flat(kc_for(R), a, a)
    assert out.shape == (4, 8, 16)
    got = FR.decode(out.reshape(32, 16))
    assert got == [x * x % R for x in xs]


def test_mont_mul_flat_zero_padding_lanes():
    """Padding lanes are zeros; mont_mul(0,0)=0 must not corrupt edges."""
    a = FR.encode([1, R - 1, 0])
    b = FR.encode([R - 1, R - 1, 5])
    out = FR.decode(mont_mul_flat(kc_for(R), a, b))
    assert out == [R - 1, (R - 1) * (R - 1) % R, 0]
