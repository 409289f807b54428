"""SHPLONK (BDFG21) multi-open prover, matching the on-chain verifier.

Derivation (from contract.sol:535-780): let the queries be grouped into
rotation sets T_k (ordered by first appearance of each poly; points within a
set sorted by rotation).  With challenges zeta (combine polys within a set),
nu (combine sets) and mu (opening point):

  f_k(X)   = sum_j zeta^j p_{k,j}(X)
  r_k(X)   = interpolation of f_k on T_k
  h(X)     = sum_k nu^k (f_k(X) - r_k(X)) / Z_k(X)          -> W  = [h]
  d_k      = Z_0(mu) / Z_k(mu)   (the contract's normalized "diff"s)
  L(X)     = sum_k nu^k d_k (f_k(X) - r_k(mu)) - Z_0(mu) h(X)
  W'       = [ L(X) / (X - mu) ]

The verifier then checks  e(acc, [1]_2) * e(W', [-tau]_2) == 1  with
  acc = sum_k nu^k d_k ([f_k] - r_k(mu) G) - Z_0(mu) W + mu W',
which equals [X * L(X)/(X-mu)] = tau W'.

Poly combination/commitment run on the prover engine; the per-set
interpolations and the exact divisions by tiny vanishing sets are host-side
(O(n) python over at most a handful of sets).
"""
from __future__ import annotations

from dataclasses import dataclass

from ..fields.bn254 import R, batch_inv, inv_mod
from .domain import Domain, rotate_omega
from .transcript import ProofWriter


@dataclass
class Query:
    poly_id: tuple      # identity key: queries of the same poly share sets
    coeffs: object      # engine vector, coefficient form
    rotation: int


def group_rotation_sets(queries: list[Query]):
    """Group queries by poly; rotation set = all rotations of that poly;
    sets ordered by first appearance, polys within a set by first appearance,
    rotations sorted ascending.  Matches the layout hardcoded in
    contract.sol:552-616 for the reference Square circuit."""
    poly_rotations: dict[tuple, list[int]] = {}
    poly_coeffs: dict[tuple, object] = {}
    order: list[tuple] = []
    for q in queries:
        if q.poly_id not in poly_rotations:
            poly_rotations[q.poly_id] = []
            poly_coeffs[q.poly_id] = q.coeffs
            order.append(q.poly_id)
        if q.rotation not in poly_rotations[q.poly_id]:
            poly_rotations[q.poly_id].append(q.rotation)

    sets: list[dict] = []
    set_index: dict[frozenset, int] = {}
    for pid in order:
        rots = frozenset(poly_rotations[pid])
        if rots not in set_index:
            set_index[rots] = len(sets)
            sets.append({"rotations": sorted(rots), "polys": []})
        sets[set_index[rots]]["polys"].append(pid)
    return sets, poly_coeffs


def _divide_linear(p: list, a: int) -> list:
    """p(X) / (X - a) (exact synthetic division, remainder dropped)."""
    out = [0] * (len(p) - 1)
    acc = 0
    for i in range(len(p) - 1, 0, -1):
        acc = (p[i] + acc) % R
        out[i - 1] = acc
        acc = acc * a % R
    return out


def _interpolate(points: list[int], values: list[int]) -> list[int]:
    """Lagrange interpolation -> coefficient list of len(points)."""
    m = len(points)
    coeffs = [0] * m
    for i in range(m):
        npoly = [1]
        denom = 1
        for j in range(m):
            if j == i:
                continue
            npoly = [((npoly[t - 1] if t > 0 else 0)
                      - points[j] * (npoly[t] if t < len(npoly) else 0)) % R
                     for t in range(len(npoly) + 1)]
            denom = denom * (points[i] - points[j]) % R
        s = values[i] * inv_mod(denom, R) % R
        for t, c in enumerate(npoly):
            coeffs[t] = (coeffs[t] + c * s) % R
    return coeffs


def shplonk_open(t: ProofWriter, srs, d: Domain, queries: list[Query],
                 x: int, eng) -> None:
    zeta = t.squeeze_challenge()
    nu = t.squeeze_challenge()

    sets, poly_coeffs = group_rotation_sets(queries)
    n = d.n

    # per-set combined polys (engine) and interpolations (host)
    set_data = []
    for s_ in sets:
        f = eng.const_vec(0, n)
        zp = 1
        for pid in s_["polys"]:
            f = eng.add(f, eng.scale(poly_coeffs[pid], zp))
            zp = zp * zeta % R
        points = [rotate_omega(d, x, rot) for rot in s_["rotations"]]
        values = [eng.eval_poly(f, pt) for pt in points]
        r_coeffs = _interpolate(points, values)
        set_data.append({"f": f, "f_ints": eng.to_ints(f),
                         "points": points, "r": r_coeffs})

    # h(X) = sum nu^k (f_k - r_k) / Z_k   (division host-side: per set it is
    # |T_k| synthetic divisions, |T_k| <= 3)
    h_ints = [0] * n
    nup = 1
    for sd in set_data:
        q = [(a - (sd["r"][i] if i < len(sd["r"]) else 0)) % R
             for i, a in enumerate(sd["f_ints"])]
        for pt in sd["points"]:
            q = _divide_linear(q, pt)
            q.append(0)
        for i, c in enumerate(q):
            h_ints[i] = (h_ints[i] + nup * c) % R
        nup = nup * nu % R
    h_vec = eng.from_ints(h_ints)
    t.write_point(eng.commit_batch([h_vec])[0])

    mu = t.squeeze_challenge()

    # Z_k(mu), normalized diffs d_k = Z_0(mu)/Z_k(mu)
    z_mu = []
    for sd in set_data:
        zv = 1
        for pt in sd["points"]:
            zv = zv * ((mu - pt) % R) % R
        z_mu.append(zv)
    z0_mu = z_mu[0]
    z_mu_inv = batch_inv(z_mu)
    d_norm = [z0_mu * zi % R for zi in z_mu_inv]

    # L(X) = sum nu^k d_k (f_k(X) - r_k(mu)) - Z_0(mu) h(X), then / (X - mu)
    from .polyops import eval_poly as host_eval
    L = [0] * n
    nup = 1
    for sd, dk in zip(set_data, d_norm):
        r_mu = host_eval(sd["r"], mu)
        coef = nup * dk % R
        for i, c in enumerate(sd["f_ints"]):
            L[i] = (L[i] + coef * c) % R
        L[0] = (L[0] - coef * r_mu) % R
        nup = nup * nu % R
    negz0 = (-z0_mu) % R
    for i, c in enumerate(h_ints):
        L[i] = (L[i] + negz0 * c) % R

    w_prime = _divide_linear(L, mu) + [0]
    t.write_point(eng.commit_batch([eng.from_ints(w_prime)])[0])
