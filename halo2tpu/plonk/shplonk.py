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

Everything stays engine-resident: per-set interpolations are host-side (at
most 3 points per set), but the synthetic divisions by (X - a) run as
engine suffix-scans (engine.div_linear) — the round-2 version pulled every
combined poly to the host (~10 MB device reads per proof at 7 MB/s).
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

    # per-set combined polys (one weighted reduction per set — a ~250-poly
    # zeta-Horner chain would serialize dispatch at tunnel RTT) and
    # interpolations (host, <= 3 points)
    set_data = []
    for s_ in sets:
        polys = [poly_coeffs[pid] for pid in s_["polys"]]
        zps = [pow(zeta, j, R) for j in range(len(polys))]
        f = eng.weighted_sum(polys, zps)
        points = [rotate_omega(d, x, rot) for rot in s_["rotations"]]
        set_data.append({"f": f, "points": points})
    values = eng.eval_polys(
        [(sd["f"], pt) for sd in set_data for pt in sd["points"]])
    vi = 0
    for sd in set_data:
        m = len(sd["points"])
        sd["r"] = _interpolate(sd["points"], values[vi:vi + m])
        vi += m

    # h(X) = sum nu^k (f_k - r_k) / Z_k  — engine-resident: subtract the
    # (tiny) interpolant, then one div_linear suffix-scan per point
    h_vec = eng.const_vec(0, n)
    nup = 1
    for sd in set_data:
        r_pad = sd["r"] + [0] * (n - len(sd["r"]))
        q = eng.sub(sd["f"], eng.from_ints(r_pad))
        for pt in sd["points"]:
            q = eng.div_linear(q, pt)
        h_vec = eng.add(h_vec, eng.scale(q, nup))
        nup = nup * nu % R
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
    L = eng.const_vec(0, n)
    nup = 1
    const_corr = 0          # the -coef*r_k(mu) terms all land on coeff 0
    for sd, dk in zip(set_data, d_norm):
        r_mu = host_eval(sd["r"], mu)
        coef = nup * dk % R
        L = eng.add(L, eng.scale(sd["f"], coef))
        const_corr = (const_corr - coef * r_mu) % R
        nup = nup * nu % R
    corr = eng.set_rows(eng.const_vec(0, n), 0, [const_corr])
    L = eng.add(L, corr)
    L = eng.add(L, eng.scale(h_vec, (-z0_mu) % R))

    w_prime = eng.div_linear(L, mu)
    t.write_point(eng.commit_batch([w_prime])[0])
