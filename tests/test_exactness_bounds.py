"""Worst-case exactness bounds for the float-carried integer kernels.

VERDICT r4 #2: the TPU prover rides two float paths whose correctness rests
on exactness arguments, not on float semantics:

  1. `ops/pallas_field._conv_const_mx` — Montgomery constant-convolutions
     as f32(HIGHEST)/bf16 MXU matmuls.  Exact iff every partial sum stays
     below 2^24 (f32 integer-exactness) and all operands are bf16-exact
     (integers <= 255 are).
  2. `ops/msm._partials_fused` — the windowed-table one-hot select as two
     bf16 einsums.  Exact because each output sum has EXACTLY ONE nonzero
     term (one-hot over the 256 window entries) of magnitude <= 255.

These tests CONSTRUCT the worst cases (maximal limbs everywhere) rather
than fuzzing, and assert the arithmetic bounds analytically so a future
layout change that violates them fails loudly.
"""
import numpy as np
import pytest

from halo2tpu.fields.bn254 import Q, R
from halo2tpu.ops import pallas_field as pf

MASK = pf.MASK
NLIMB = pf.NLIMB


def _lazy_value(cols, lane):
    """Integer value of a lazy 16-bit column-sum array at one lane."""
    return sum(int(cols[k, lane]) << (16 * k) for k in range(cols.shape[0]))


def _limbs_int(limbs) -> int:
    return sum(int(limbs[i]) << (16 * i) for i in range(len(limbs)))


# ---------------------------------------------------------------------------
# analytic bounds
# ---------------------------------------------------------------------------

def test_conv8_matrix_row_sums_under_f32_exactness():
    """Every MXU row sum, with WORST-CASE inputs (all 8-bit halves = 255),
    must stay strictly below 2^24 so each f32 partial sum is an exact
    integer.  Checked for the two matrices actually used (p^-1 and p, for
    both moduli) AND for the theoretical all-0xFF constant."""
    worst_input = 255
    for p in (Q, R, (1 << 256) - 1):     # last = worst possible constant
        kc_like_rows = []
        for out16, v in ((16, (-pow(p, -1, 1 << 256)) % (1 << 256) if p % 2
                          else 0), (32, p)):
            M = pf.LimbConstants._conv8_matrix(v, out16)
            kc_like_rows.append(M)
            row_sums = (M * worst_input).sum(axis=1)
            assert row_sums.max() < 2 ** 24, (
                f"row sum {row_sums.max()} breaks f32 integer exactness")
            # the docstring's tighter claim: < 2^21
            assert row_sums.max() < 2 ** 21
        # entries themselves must be bf16-exact integers
        for M in kc_like_rows:
            assert M.max() <= 255 and np.all(M == np.round(M))


def test_recombined_mx_columns_fit_u32():
    """mm[:out16] + (mm[out16:] << 8) must fit in uint32 at worst case,
    and T33 + mp must not overflow u32 in _mont_reduce."""
    max_row = 32 * 255 * 255                 # worst 8-bit row sum
    recombined = max_row + (max_row << 8)
    assert recombined < 2 ** 32
    # _conv column sums (33-col product of 16-bit limbs): per column at most
    # 2*16 terms of < 2^16 each
    conv_max = 2 * NLIMB * (MASK)
    assert conv_max + recombined < 2 ** 32


# ---------------------------------------------------------------------------
# MXU const-conv vs scalar VPU path vs big-int golden, worst-case limbs
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("p", [Q, R])
def test_conv_const_mx_worst_case_exact(p):
    import jax.numpy as jnp
    kc = pf.LimbConstants(p)
    T = 8
    rng = np.random.default_rng(0)
    # worst case: ALL limbs maximal, plus random fills
    xs = np.full((NLIMB, T), MASK, np.uint32)
    xs[:, 1:] = rng.integers(0, MASK + 1, (NLIMB, T - 1), dtype=np.uint32)
    xs[:, 1] = 0
    x = jnp.asarray(xs)
    for const_int, M, out16 in (
            (_limbs_int(kc.p_inv_full), kc.mx_pinv, 16),
            (_limbs_int(kc.p_limbs), kc.mx_p, 32)):
        mx = np.asarray(pf._conv_const_mx(x, jnp.asarray(M), out16))
        for lane in range(T):
            xv = sum(int(xs[k, lane]) << (16 * k) for k in range(NLIMB))
            want = (xv * const_int) % (1 << (16 * out16))
            assert _lazy_value(mx, lane) % (1 << (16 * out16)) == want, (
                f"lane {lane}: MXU const-conv diverges from big-int")


def test_mont_mul_lm_mxu_vs_golden_edge_inputs():
    """Full Montgomery product through the MXU path on edge inputs
    (p-1 squared = maximal canonical operands) vs python-int golden."""
    import jax.numpy as jnp
    for p in (Q, R):
        kc = pf.LimbConstants(p)
        edge = [p - 1, p - 2, 1, (1 << 254) % p]
        vals_a, vals_b = [], []
        for a in edge:
            for b in edge:
                vals_a.append(a)
                vals_b.append(b)
        T = len(vals_a)
        A = np.zeros((NLIMB, T), np.uint32)
        B = np.zeros((NLIMB, T), np.uint32)
        for t, (a, b) in enumerate(zip(vals_a, vals_b)):
            for k in range(NLIMB):
                A[k, t] = (a >> (16 * k)) & MASK
                B[k, t] = (b >> (16 * k)) & MASK
        with pf.mx_ctx(kc, jnp.asarray(kc.mx_pinv), jnp.asarray(kc.mx_p)):
            out = np.asarray(pf.mont_mul_lm(kc, jnp.asarray(A),
                                            jnp.asarray(B)))
        rinv = pow(1 << 256, -1, p)
        for t, (a, b) in enumerate(zip(vals_a, vals_b)):
            got = sum(int(out[k, t]) << (16 * k) for k in range(NLIMB))
            assert got == a * b * rinv % p, f"lane {t} wrong"


# ---------------------------------------------------------------------------
# MSM one-hot bf16 table select
# ---------------------------------------------------------------------------

def test_onehot_select_worst_case_matches_gather():
    """The windowed-MSM einsum select (ops/msm.py _partials_fused body)
    against a plain numpy gather, with a WORST-CASE table (all limbs
    0xFFFF: both 8-bit halves 255, the bf16 exactness edge) and adversarial
    digit patterns (all-equal, all-distinct, boundary 0/255)."""
    import jax
    import jax.numpy as jnp
    W, C, G = 256, 8, 16
    rng = np.random.default_rng(1)
    tab = np.full((3, W, NLIMB, C), 0xFFFF, np.uint16)
    tab[:, :, :, : C // 2] = rng.integers(
        0, 1 << 16, (3, W, NLIMB, C // 2), dtype=np.uint16)
    digs = np.zeros((G, C), np.uint32)
    digs[0] = 0
    digs[1] = 255
    digs[2] = np.arange(C) % 256
    digs[3:] = rng.integers(0, 256, (G - 3, C), dtype=np.uint32)

    def select(tab_c, digs):
        wrange = jnp.arange(W, dtype=jnp.uint32)
        oh = (digs[:, None, :] == wrange[None, :, None]).astype(jnp.bfloat16)
        tlo = (tab_c & jnp.uint16(0xFF)).astype(jnp.bfloat16)
        thi = (tab_c >> 8).astype(jnp.bfloat16)
        slo = jnp.einsum("cwlk,gwk->clgk", tlo, oh,
                         preferred_element_type=jnp.float32)
        shi = jnp.einsum("cwlk,gwk->clgk", thi, oh,
                         preferred_element_type=jnp.float32)
        return (slo.astype(jnp.uint32) | (shi.astype(jnp.uint32) << 8))

    got = np.asarray(jax.jit(select)(jnp.asarray(tab), jnp.asarray(digs)))
    # golden: plain gather
    want = np.zeros((3, NLIMB, G, C), np.uint32)
    for g in range(G):
        for c in range(C):
            want[:, :, g, c] = tab[:, digs[g, c], :, c]
    assert np.array_equal(got, want)


def test_window_digits_cover_scalar():
    """The 8-bit digit decomposition must reconstruct the scalar exactly
    for the all-ones worst case and random scalars."""
    import jax.numpy as jnp
    from halo2tpu.ops.msm import _window_digits, WINDOW_BITS, NUM_WINDOWS
    from halo2tpu.fields.jfield import ints_to_limbs
    vals = [R - 1, (1 << 254) - 1, 0, 1, 0xFFFF] + [
        int.from_bytes(np.random.default_rng(2).bytes(31), "big")
        for _ in range(4)]
    limbs = jnp.asarray(ints_to_limbs(vals))[None]      # (1, n, 16)
    digs = np.asarray(_window_digits(limbs))            # (NW, 1, n)
    for i, v in enumerate(vals):
        rec = sum(int(digs[w, 0, i]) << (WINDOW_BITS * w)
                  for w in range(NUM_WINDOWS))
        assert rec == v % (1 << 256)
