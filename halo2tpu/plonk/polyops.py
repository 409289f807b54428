"""Host-side (python-int) polynomial ops over Fr.

Golden reference twin of the JAX engine (ops/ntt.py etc.); used directly by
keygen and by the host prover engine for small circuits / tests.
"""
from __future__ import annotations

from ..fields.bn254 import R, inv_mod


def bit_reverse_permute(a: list[int]) -> list[int]:
    n = len(a)
    bits = n.bit_length() - 1
    out = [0] * n
    for i in range(n):
        j = int(format(i, f"0{bits}b")[::-1], 2) if bits else 0
        out[j] = a[i]
    return out


def ntt(a, omega: int) -> list[int]:
    """In-order forward NTT: out[i] = sum_j a[j] omega^(ij)."""
    a = bit_reverse_permute(list(a))
    n = len(a)
    m = 1
    while m < n:
        w_m = pow(omega, n // (2 * m), R)
        for k in range(0, n, 2 * m):
            w = 1
            for j in range(m):
                t = w * a[k + j + m] % R
                u = a[k + j]
                a[k + j] = (u + t) % R
                a[k + j + m] = (u - t) % R
                w = w * w_m % R
        m *= 2
    return a


def intt(a, omega: int) -> list[int]:
    n = len(a)
    out = ntt(a, inv_mod(omega, R))
    n_inv = inv_mod(n, R)
    return [x * n_inv % R for x in out]


def lagrange_to_coeff(values, omega: int) -> list[int]:
    return intt(values, omega)


def coeff_to_lagrange(coeffs, omega: int) -> list[int]:
    return ntt(coeffs, omega)


def eval_poly(coeffs, x: int) -> int:
    acc = 0
    for c in reversed(list(coeffs)):
        acc = (acc * x + c) % R
    return acc


def coeff_to_extended_coset(coeffs, domain) -> list[int]:
    """Evaluate an n-degree poly on the coset g*<omega_ext> of the extended
    domain: scale coeffs by g^i, pad to extended_n, forward NTT."""
    g = domain.coset_shift
    scaled = []
    gp = 1
    for c in coeffs:
        scaled.append(c * gp % R)
        gp = gp * g % R
    scaled += [0] * (domain.extended_n - len(scaled))
    return ntt(scaled, domain.extended_omega)


def extended_coset_to_coeff(values, domain) -> list[int]:
    coeffs = intt(values, domain.extended_omega)
    ginv = inv_mod(domain.coset_shift, R)
    gp = 1
    out = []
    for c in coeffs:
        out.append(c * gp % R)
        gp = gp * ginv % R
    return out
