"""The PLONKish prover: witness -> proof bytes.

Pipeline (matches the implied production flow, SURVEY §3.4, and the proof
layout decoded from contract.sol):

  absorb vk digest + instances
  phase 1: commit advice columns ................ -> theta
  lookups: commit permuted (A', S') pairs ....... -> beta, gamma
  phase 2: commit permutation z chunks, lookup
           products, vanishing random poly ...... -> y
  phase 3: commit quotient h chunks ............. -> x
  evals (advice, fixed, random, sigmas, perm z, lookups)
  SHPLONK multiopen ............................. zeta, nu, W, mu, W'

This module is engine-agnostic in structure; the default engine is the host
python-int engine (slow, golden); the JAX engine accelerates the hot ops.
"""
from __future__ import annotations

import numpy as np

from ..fields.bn254 import R, FR_DELTA, batch_inv, inv_mod
from .circuit import Assignment
from .domain import rotate_omega
from .keygen import ProvingKey
from .polyops import (
    coeff_to_extended_coset,
    eval_poly,
    extended_coset_to_coeff,
    lagrange_to_coeff,
)
from .shplonk import Query, shplonk_open
from .transcript import ProofWriter


def _rng_field(rng: np.random.Generator) -> int:
    return int.from_bytes(rng.bytes(32), "big") % R


class _Cosets:
    """Lazy cache of extended-coset evaluations attached to a pk."""

    def __init__(self, pk: ProvingKey):
        self.pk = pk
        d = pk.vk.domain
        n, en = d.n, d.extended_n
        self.fixed = [coeff_to_extended_coset(p, d) for p in pk.fixed_polys]
        self.sigma = [coeff_to_extended_coset(p, d) for p in pk.sigma_polys]
        b = pk.vk.cs.blinding_factors()
        # lagrange l_0, l_last, l_blind on the extended coset
        def lag_coset(rows):
            vals = [0] * n
            for r_ in rows:
                vals[r_ % n] = 1
            return coeff_to_extended_coset(lagrange_to_coeff(vals, d.omega), d)

        self.l0 = lag_coset([0])
        self.l_last = lag_coset([n - (b + 1)])
        self.l_blind = lag_coset(range(n - b, n))
        self.l_active = [(1 - (a + bl)) % R for a, bl in zip(self.l_last, self.l_blind)]
        # 1 / Z_H on the coset: Z_H(g w^i) = g^n w^{n i} - 1
        g_n = pow(d.coset_shift, n, R)
        w_n = pow(d.extended_omega, n, R)
        zh = []
        cur = g_n
        for _ in range(en):
            zh.append((cur - 1) % R)
            cur = cur * w_n % R
        self.zh_inv = batch_inv(zh)
        # coset points and delta powers for the permutation identity side
        self.coset_points = []
        cur = d.coset_shift
        for _ in range(en):
            self.coset_points.append(cur)
            cur = cur * d.extended_omega % R


def _get_cosets(pk: ProvingKey) -> _Cosets:
    if not hasattr(pk, "_cosets"):
        pk._cosets = _Cosets(pk)
    return pk._cosets


def _rotated(vals, rot: int, step: int):
    """vals evaluated at rotation `rot` of the base domain = roll by
    rot * step in the extended domain (step = extended_n / n)."""
    if rot == 0:
        return vals
    k = (rot * step) % len(vals)
    return vals[k:] + vals[:k]


def _permute_lookup(inputs: list[int], table: list[int], usable: int):
    """halo2 lookup permutation: A' = A sorted (by first occurrence runs);
    S' = table values aligned so that whenever A'[i] != A'[i-1], S'[i] =
    A'[i]; remaining S' slots filled with unused table values."""
    a = sorted(inputs[:usable])
    t_counts: dict[int, int] = {}
    for v in table[:usable]:
        t_counts[v] = t_counts.get(v, 0) + 1
    s = [0] * usable
    leftover = []
    for i, v in enumerate(a):
        if i == 0 or v != a[i - 1]:
            if t_counts.get(v, 0) == 0:
                raise ValueError(f"lookup failure: input {v} not in table")
            t_counts[v] -= 1
            s[i] = v
        else:
            s[i] = None  # fill later
    rest = []
    for v, c in t_counts.items():
        rest.extend([v] * c)
    ri = 0
    for i in range(usable):
        if s[i] is None:
            s[i] = rest[ri]
            ri += 1
    return a, s


def create_proof(pk: ProvingKey, srs, circuit, instances: list[list[int]],
                 rng_seed: int = 0, debug: dict | None = None) -> bytes:
    vk = pk.vk
    cs = vk.cs
    d = vk.domain
    n = d.n
    b = cs.blinding_factors()
    u = n - (b + 1)  # unusable rows start
    step = d.extended_n // n
    rng = np.random.default_rng(rng_seed)
    cosets = _get_cosets(pk)

    t = ProofWriter()
    t.common_scalar(vk.transcript_repr)

    # -- instances ---------------------------------------------------------
    for col in instances:
        assert len(col) <= u, "too many instance rows"
        for v in col:
            t.common_scalar(v)
    instance_values = []
    for ci in range(cs.num_instance):
        vals = [0] * n
        col = instances[ci] if ci < len(instances) else []
        for i, v in enumerate(col):
            vals[i] = v % R
        instance_values.append(vals)
    instance_polys = [lagrange_to_coeff(v, d.omega) for v in instance_values]

    # -- phase 1: advice ---------------------------------------------------
    asn = Assignment(cs, n)
    circuit.synthesize(pk.config, asn)
    advice_values = []
    for col in asn.advice:
        vals = [int(x) % R for x in col]
        for i in range(u, n):
            vals[i] = _rng_field(rng)
        advice_values.append(vals)
    advice_polys = [lagrange_to_coeff(v, d.omega) for v in advice_values]
    for vals in advice_values:
        t.write_point(srs.commit_lagrange(vals))

    theta = t.squeeze_challenge()

    # column value accessor (lagrange domain) for permutation / lookups
    def col_vals(col):
        if col.kind == "advice":
            return advice_values[col.index]
        if col.kind == "fixed":
            return [int(x) % R for x in pk.fixed_values[col.index]]
        return instance_values[col.index]

    def eval_expr_rows(expr):
        """Evaluate an expression over all n rows (lagrange domain, host)."""
        def q_vals(q, source):
            v = source[q.column_index]
            rot = q.rotation % n
            return v[rot:] + v[:rot] if rot else v
        fixed_l = [[int(x) % R for x in c] for c in pk.fixed_values]
        return expr.evaluate(
            constant=lambda c: [c % R] * n,
            fixed=lambda q: q_vals(q, fixed_l),
            advice=lambda q: q_vals(q, advice_values),
            instance=lambda q: q_vals(q, instance_values),
            negate=lambda a: [(-x) % R for x in a],
            add=lambda a, bb: [(x + y) % R for x, y in zip(a, bb)],
            mul=lambda a, bb: [x * y % R for x, y in zip(a, bb)],
        )

    # -- lookups: permuted pairs ------------------------------------------
    lookup_state = []
    for lk in cs.lookups:
        def compress(exprs):
            acc = [0] * n
            for e in exprs:
                vals = eval_expr_rows(e)
                acc = [(a * theta + v) % R for a, v in zip(acc, vals)]
            return acc
        comp_input = compress([p[0] for p in lk.pairs])
        comp_table = compress([p[1] for p in lk.pairs])
        a_p, s_p = _permute_lookup(comp_input, comp_table, u)
        a_vals = a_p + [0] * (n - u)
        s_vals = s_p + [0] * (n - u)
        for i in range(u, n):
            a_vals[i] = _rng_field(rng)
            s_vals[i] = _rng_field(rng)
        lookup_state.append({
            "comp_input": comp_input, "comp_table": comp_table,
            "a_vals": a_vals, "s_vals": s_vals,
        })
        t.write_point(srs.commit_lagrange(a_vals))
        t.write_point(srs.commit_lagrange(s_vals))

    beta = t.squeeze_challenge()
    gamma = t.squeeze_challenge()

    # -- phase 2: permutation grand products -------------------------------
    chunk_len = cs.permutation_chunk_len()
    perm_cols = cs.permutation_columns
    chunks = [perm_cols[i:i + chunk_len] for i in range(0, len(perm_cols), chunk_len)]

    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * d.omega % R
    deltas = [pow(FR_DELTA, j, R) for j in range(len(perm_cols))]

    z_values_sets = []
    last_z = 1
    gidx = 0
    for chunk in chunks:
        num = [1] * n
        den = [1] * n
        for col in chunk:
            vals = col_vals(col)
            sig = pk.sigma_values[perm_cols.index(col)]
            delta = deltas[gidx]
            for i in range(n):
                num[i] = num[i] * ((vals[i] + beta * delta % R * omega_pows[i] + gamma) % R) % R
                den[i] = den[i] * ((vals[i] + beta * sig[i] + gamma) % R) % R
            gidx += 1
        den_inv = batch_inv(den)
        z = [0] * n
        z[0] = last_z
        for i in range(u):
            z[i + 1 if i + 1 < n else 0] = z[i] * num[i] % R * den_inv[i] % R
        # z[u] is the chunk's final value; blind rows [n-b, n)
        last_z = z[u]
        for i in range(n - b, n):
            z[i] = _rng_field(rng)
        z_values_sets.append(z)
    z_polys = [lagrange_to_coeff(z, d.omega) for z in z_values_sets]
    for z in z_values_sets:
        t.write_point(srs.commit_lagrange(z))

    # lookup product polys:
    # z(w x) (a'+beta)(s'+gamma) = z(x) (A+beta)(S+gamma)
    # so z[i+1] = z[i] * (A_i+beta)(S_i+gamma) / ((a'_i+beta)(s'_i+gamma))
    for lk_s in lookup_state:
        ci, ct = lk_s["comp_input"], lk_s["comp_table"]
        av, sv = lk_s["a_vals"], lk_s["s_vals"]
        den = [(av[i] + beta) % R * ((sv[i] + gamma) % R) % R for i in range(n)]
        num = [(ci[i] + beta) % R * ((ct[i] + gamma) % R) % R for i in range(n)]
        den_inv = batch_inv(den)
        z = [0] * n
        z[0] = 1
        for i in range(u):
            z[i + 1] = z[i] * num[i] % R * den_inv[i] % R
        for i in range(n - b, n):
            z[i] = _rng_field(rng)
        lk_s["z_vals"] = z
        lk_s["z_poly"] = lagrange_to_coeff(z, d.omega)
        lk_s["a_poly"] = lagrange_to_coeff(av, d.omega)
        lk_s["s_poly"] = lagrange_to_coeff(sv, d.omega)
        t.write_point(srs.commit_lagrange(z))

    # vanishing random poly
    random_poly = [_rng_field(rng) for _ in range(n)]
    t.write_point(srs.commit(random_poly))

    y = t.squeeze_challenge()

    # -- phase 3: quotient -------------------------------------------------
    en = d.extended_n
    advice_cosets = [coeff_to_extended_coset(p, d) for p in advice_polys]
    instance_cosets = [coeff_to_extended_coset(p, d) for p in instance_polys]
    z_cosets = [coeff_to_extended_coset(p, d) for p in z_polys]

    def coset_of(col):
        if col.kind == "advice":
            return advice_cosets[col.index]
        if col.kind == "fixed":
            return cosets.fixed[col.index]
        return instance_cosets[col.index]

    def eval_expr_coset(expr):
        return expr.evaluate(
            constant=lambda c: [c % R] * en,
            fixed=lambda q: _rotated(cosets.fixed[q.column_index], q.rotation, step),
            advice=lambda q: _rotated(advice_cosets[q.column_index], q.rotation, step),
            instance=lambda q: _rotated(instance_cosets[q.column_index], q.rotation, step),
            negate=lambda a: [(-x) % R for x in a],
            add=lambda a, bb: [(x + y) % R for x, y in zip(a, bb)],
            mul=lambda a, bb: [x * y % R for x, y in zip(a, bb)],
        )

    hv = [0] * en  # folded h numerator

    def fold(vals):
        nonlocal hv
        hv = [(h * y + v) % R for h, v in zip(hv, vals)]

    # gates
    for gate in cs.gates:
        for poly in gate.polys:
            fold(eval_expr_coset(poly))

    # permutation expressions (order matches contract.sol:452-505)
    if chunks:
        z_first = z_cosets[0]
        z_last_c = z_cosets[-1]
        # l_0 (1 - z_first)
        fold([l0 * ((1 - z) % R) % R for l0, z in zip(cosets.l0, z_first)])
        # l_last (z_last^2 - z_last)
        fold([ll * ((z * z - z) % R) % R for ll, z in zip(cosets.l_last, z_last_c)])
        # l_0 (z_j - z_{j-1}(w^{-(b+1)} X))
        for j in range(1, len(chunks)):
            prev_rot = _rotated(z_cosets[j - 1], -(b + 1), step)
            fold([l0 * ((zj - zp) % R) % R
                  for l0, zj, zp in zip(cosets.l0, z_cosets[j], prev_rot)])
        # product rules
        gidx = 0
        for j, chunk in enumerate(chunks):
            z_next = _rotated(z_cosets[j], 1, step)
            lhs = list(z_next)
            rhs = list(z_cosets[j])
            for col in chunk:
                cvals = coset_of(col)
                sidx = perm_cols.index(col)
                sig_c = cosets.sigma[sidx]
                delta = deltas[gidx]
                for i in range(en):
                    lhs[i] = lhs[i] * ((cvals[i] + beta * sig_c[i] + gamma) % R) % R
                    rhs[i] = rhs[i] * ((cvals[i] + beta * delta % R * cosets.coset_points[i] + gamma) % R) % R
                gidx += 1
            fold([(l - r_) * a % R for l, r_, a in zip(lhs, rhs, cosets.l_active)])

    # lookup expressions
    for lk, lk_s in zip(cs.lookups, lookup_state):
        zc = coeff_to_extended_coset(lk_s["z_poly"], d)
        ac = coeff_to_extended_coset(lk_s["a_poly"], d)
        sc = coeff_to_extended_coset(lk_s["s_poly"], d)
        z_next = _rotated(zc, 1, step)
        a_prev = _rotated(ac, -1, step)

        def compress_coset(exprs):
            acc = [0] * en
            for e in exprs:
                vals = eval_expr_coset(e)
                acc = [(a * theta + v) % R for a, v in zip(acc, vals)]
            return acc

        comp_in = compress_coset([p[0] for p in lk.pairs])
        comp_tb = compress_coset([p[1] for p in lk.pairs])
        # l_0 (1 - z)
        fold([l0 * ((1 - z) % R) % R for l0, z in zip(cosets.l0, zc)])
        # l_last (z^2 - z)
        fold([ll * ((z * z - z) % R) % R for ll, z in zip(cosets.l_last, zc)])
        # (z(wx)(a'+b)(s'+g) - z(x)(A+b)(S+g)) * active
        fold([
            ((zn * ((a + beta) % R) % R * ((s + gamma) % R)
              - z * ((cin + beta) % R) % R * ((ctb + gamma) % R)) % R) * act % R
            for zn, a, s, z, cin, ctb, act in
            zip(z_next, ac, sc, zc, comp_in, comp_tb, cosets.l_active)
        ])
        # l_0 (a' - s')
        fold([l0 * ((a - s) % R) % R for l0, a, s in zip(cosets.l0, ac, sc)])
        # (a' - s')(a' - a'(w^-1 x)) * active
        fold([((a - s) % R) * ((a - ap) % R) % R * act % R
              for a, s, ap, act in zip(ac, sc, a_prev, cosets.l_active)])

    h_values = [v * zi % R for v, zi in zip(hv, cosets.zh_inv)]
    h_coeffs = extended_coset_to_coeff(h_values, d)
    # degree bound: quotient_poly_degree * n coefficients
    h_coeffs = h_coeffs[: d.quotient_poly_degree * n]
    h_chunks = [h_coeffs[i * n:(i + 1) * n] for i in range(d.quotient_poly_degree)]
    h_chunks = [c + [0] * (n - len(c)) for c in h_chunks]
    for c in h_chunks:
        t.write_point(srs.commit(c))

    x = t.squeeze_challenge()
    xn = pow(x, n, R)

    # -- evaluations -------------------------------------------------------
    def poly_of(kind, idx):
        return {"advice": advice_polys, "fixed": pk.fixed_polys,
                "instance": instance_polys}[kind][idx]

    for ci, rot in cs.advice_queries:
        t.write_scalar(eval_poly(advice_polys[ci], rotate_omega(d, x, rot)))
    for ci, rot in cs.fixed_queries:
        t.write_scalar(eval_poly(pk.fixed_polys[ci], rotate_omega(d, x, rot)))
    # vanishing: random eval
    t.write_scalar(eval_poly(random_poly, x))
    # permutation commons (sigmas)
    for sp in pk.sigma_polys:
        t.write_scalar(eval_poly(sp, x))
    # permutation products
    x_next = rotate_omega(d, x, 1)
    x_last = rotate_omega(d, x, -(b + 1))
    for j, zp in enumerate(z_polys):
        t.write_scalar(eval_poly(zp, x))
        t.write_scalar(eval_poly(zp, x_next))
        if j + 1 < len(z_polys):
            t.write_scalar(eval_poly(zp, x_last))
    # lookups: z(x), z(wx), a'(x), a'(w^-1 x), s'(x)
    x_prev = rotate_omega(d, x, -1)
    for lk_s in lookup_state:
        t.write_scalar(eval_poly(lk_s["z_poly"], x))
        t.write_scalar(eval_poly(lk_s["z_poly"], x_next))
        t.write_scalar(eval_poly(lk_s["a_poly"], x))
        t.write_scalar(eval_poly(lk_s["a_poly"], x_prev))
        t.write_scalar(eval_poly(lk_s["s_poly"], x))

    # -- multiopen queries (order pins SHPLONK set structure) --------------
    h_folded = [0] * n
    for c in reversed(h_chunks):
        h_folded = [(hf * xn + cc) % R for hf, cc in zip(h_folded, c)]

    queries: list[Query] = []
    for ci, rot in cs.advice_queries:
        queries.append(Query(("advice", ci), advice_polys[ci], rot))
    for j, zp in enumerate(z_polys):
        queries.append(Query(("perm_z", j), zp, 0))
        queries.append(Query(("perm_z", j), zp, 1))
    for j in range(len(z_polys) - 2, -1, -1):
        queries.append(Query(("perm_z", j), z_polys[j], -(b + 1)))
    for li, lk_s in enumerate(lookup_state):
        queries.append(Query(("lk_z", li), lk_s["z_poly"], 0))
        queries.append(Query(("lk_a", li), lk_s["a_poly"], 0))
        queries.append(Query(("lk_s", li), lk_s["s_poly"], 0))
        queries.append(Query(("lk_a", li), lk_s["a_poly"], -1))
        queries.append(Query(("lk_z", li), lk_s["z_poly"], 1))
    for ci, rot in cs.fixed_queries:
        queries.append(Query(("fixed", ci), pk.fixed_polys[ci], rot))
    for j, sp in enumerate(pk.sigma_polys):
        queries.append(Query(("sigma", j), sp, 0))
    queries.append(Query(("h",), h_folded, 0))
    queries.append(Query(("random",), random_poly, 0))

    if debug is not None:
        debug.update(dict(
            advice_polys=advice_polys, instance_polys=instance_polys,
            z_polys=z_polys, random_poly=random_poly, h_chunks=h_chunks,
            h_folded=h_folded, h_values=h_values, hv=hv, queries=queries,
            theta=theta, beta=beta, gamma=gamma, y=y, x=x,
            advice_values=advice_values, z_values_sets=z_values_sets,
            lookup_state=lookup_state,
        ))
    shplonk_open(t, srs, d, queries, x)
    return bytes(t.proof)
