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

Engine-generic: all polynomial arithmetic (NTT, coset evaluation, expression
folding, scans, MSM commitments) routes through plonk/engine.py — the
HostEngine is the python-int golden path, the JaxEngine runs the same math
as fused XLA on TPU.  Both produce byte-identical proofs for a given seed.
"""
from __future__ import annotations

import numpy as np

from ..fields.bn254 import R, FR_DELTA
from .circuit import Assignment
from .domain import rotate_omega
from .keygen import ProvingKey
from .shplonk import Query, shplonk_open
from .transcript import ProofWriter


def _rng_field(rng: np.random.Generator) -> int:
    return int.from_bytes(rng.bytes(32), "big") % R


class _Cosets:
    """Engine-resident extended-coset data, cached per (pk, engine)."""

    def __init__(self, pk: ProvingKey, eng):
        d = pk.vk.domain
        n, en = d.n, d.extended_n
        b = pk.vk.cs.blinding_factors()
        self.fixed_polys = [eng.from_ints(p) for p in pk.fixed_polys]
        self.fixed = [eng.coeff_to_extended_coset(p) for p in self.fixed_polys]
        self.sigma_polys = [eng.from_ints(p) for p in pk.sigma_polys]
        self.sigma = [eng.coeff_to_extended_coset(p) for p in self.sigma_polys]
        # n-domain Lagrange columns resident on the engine: lookup
        # compression and grand-product assembly read these directly
        # instead of re-encoding host ints every proof (VERDICT r1 #6)
        self.fixed_lag = [eng.from_ints([int(x) % R for x in col])
                          for col in pk.fixed_values]
        self.sigma_lag = [eng.from_ints(col) for col in pk.sigma_values]
        omega_pows = [1] * n
        for i in range(1, n):
            omega_pows[i] = omega_pows[i - 1] * d.omega % R
        self.omega_pows = eng.from_ints(omega_pows)

        def lag_coset(rows):
            vals = [0] * n
            for r_ in rows:
                vals[r_ % n] = 1
            return eng.coeff_to_extended_coset(
                eng.lagrange_to_coeff(eng.from_ints(vals)))

        self.l0 = lag_coset([0])
        self.l_last = lag_coset([n - (b + 1)])
        l_blind = lag_coset(range(n - b, n))
        one = eng.const_vec(1, en)
        self.l_active = eng.sub(eng.sub(one, self.l_last), l_blind)
        # 1/Z_H and coset points on the extended coset
        g_n = pow(d.coset_shift, n, R)
        w_n = pow(d.extended_omega, n, R)
        zh, pts = [], []
        cur, curp = g_n, d.coset_shift
        for _ in range(en):
            zh.append((cur - 1) % R)
            pts.append(curp)
            cur = cur * w_n % R
            curp = curp * d.extended_omega % R
        self.zh_inv = eng.batch_inv(eng.from_ints(zh))
        self.coset_points = eng.from_ints(pts)


def _get_cosets(pk: ProvingKey, eng) -> _Cosets:
    cache = getattr(pk, "_cosets_cache", None)
    if cache is None:
        cache = pk._cosets_cache = {}
    if eng.name not in cache:
        cache[eng.name] = _Cosets(pk, eng)
    return cache[eng.name]


def _permute_lookup(inputs: list[int], table: list[int], usable: int):
    """halo2 lookup permutation: A' = A sorted; S' aligned so that wherever
    A'[i] != A'[i-1], S'[i] = A'[i]; leftovers fill the gaps."""
    a = sorted(inputs[:usable])
    t_counts: dict[int, int] = {}
    for v in table[:usable]:
        t_counts[v] = t_counts.get(v, 0) + 1
    s: list = [None] * usable
    for i, v in enumerate(a):
        if i == 0 or v != a[i - 1]:
            if t_counts.get(v, 0) == 0:
                raise ValueError(f"lookup failure: input {v} not in table")
            t_counts[v] -= 1
            s[i] = v
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
                 rng_seed: int = 0, engine: str | object = "host",
                 debug: dict | None = None, tracer=None) -> bytes:
    from ..utils.trace import NULL
    tr = tracer or NULL
    vk = pk.vk
    cs = vk.cs
    d = vk.domain
    n = d.n
    b = cs.blinding_factors()
    u = n - (b + 1)  # unusable rows start
    step = d.extended_n // n
    rng = np.random.default_rng(rng_seed)

    if isinstance(engine, str):
        from .engine import make_engine
        eng = make_engine(engine, d, srs)
    else:
        eng = engine
    cosets = _get_cosets(pk, eng)

    t = ProofWriter()
    t.common_scalar(vk.transcript_repr)

    # -- instances ---------------------------------------------------------
    for col in instances:
        assert len(col) <= u, "too many instance rows"
        for v in col:
            t.common_scalar(v)
    instance_ints = []
    for ci in range(cs.num_instance):
        vals = [0] * n
        col = instances[ci] if ci < len(instances) else []
        for i, v in enumerate(col):
            vals[i] = v % R
        instance_ints.append(vals)
    instance_values = [eng.from_ints(v) for v in instance_ints]
    instance_polys = [eng.lagrange_to_coeff(v) for v in instance_values]

    # -- phase 1: advice ---------------------------------------------------
    asn = Assignment(cs, n)
    with tr.phase("synthesize"):
        circuit.synthesize(pk.config, asn)
    advice_ints = []
    for col in asn.advice:
        vals = [int(x) % R for x in col]
        for i in range(u, n):
            vals[i] = _rng_field(rng)
        advice_ints.append(vals)
    with tr.phase("advice_ntt"):
        advice_values = [eng.from_ints(v) for v in advice_ints]
        advice_polys = [eng.lagrange_to_coeff(v) for v in advice_values]
    with tr.phase("commit_advice"):
        for p in eng.commit_lagrange_batch(advice_values):
            t.write_point(p)
    tr.count("advice_columns", len(advice_values))

    theta = t.squeeze_challenge()

    def eval_expr_lagrange(expr):
        """Engine-resident expression evaluation over the n-domain (lookup
        compression; only the permutation SORT stays host-side)."""
        return expr.evaluate(
            constant=lambda c: eng.const_vec(c, n),
            fixed=lambda q: eng.rotate(cosets.fixed_lag[q.column_index],
                                       q.rotation),
            advice=lambda q: eng.rotate(advice_values[q.column_index],
                                        q.rotation),
            instance=lambda q: eng.rotate(instance_values[q.column_index],
                                          q.rotation),
            negate=eng.neg,
            add=eng.add,
            mul=eng.mul,
        )

    # -- lookups: permuted pairs ------------------------------------------
    tr_lookups = tr.phase("lookups_permute")
    tr_lookups.__enter__()
    lookup_state = []
    lookup_perm_vecs = []
    for lk in cs.lookups:
        def compress(exprs):
            acc = eng.const_vec(0, n)
            for e in exprs:
                acc = eng.add(eng.scale(acc, theta), eval_expr_lagrange(e))
            return acc
        ci_dev = compress([p[0] for p in lk.pairs])
        ct_dev = compress([p[1] for p in lk.pairs])
        comp_input = eng.to_ints(ci_dev)
        comp_table = eng.to_ints(ct_dev)
        a_p, s_p = _permute_lookup(comp_input, comp_table, u)
        a_vals = a_p + [0] * (n - u)
        s_vals = s_p + [0] * (n - u)
        for i in range(u, n):
            a_vals[i] = _rng_field(rng)
            s_vals[i] = _rng_field(rng)
        lookup_state.append({
            "comp_input_dev": ci_dev, "comp_table_dev": ct_dev,
            "a_ints": a_vals, "s_ints": s_vals,
        })
        lookup_perm_vecs.extend([eng.from_ints(a_vals), eng.from_ints(s_vals)])
    tr_lookups.__exit__(None, None, None)
    with tr.phase("commit_lookup_permuted"):
        for p in eng.commit_lagrange_batch(lookup_perm_vecs):
            t.write_point(p)

    beta = t.squeeze_challenge()
    gamma = t.squeeze_challenge()

    # -- phase 2: permutation grand products -------------------------------
    chunk_len = cs.permutation_chunk_len()
    perm_cols = cs.permutation_columns
    chunks = [perm_cols[i:i + chunk_len] for i in range(0, len(perm_cols), chunk_len)]

    def col_values(col):
        if col.kind == "advice":
            return advice_values[col.index]
        if col.kind == "fixed":
            return cosets.fixed_lag[col.index]
        return instance_values[col.index]

    deltas = [pow(FR_DELTA, j, R) for j in range(len(perm_cols))]

    # Build every grand-product numerator/denominator (permutation chunks +
    # lookup products), then resolve all of them in ONE batched engine pass
    # (single stacked inversion + vmapped prefix scan on the JaxEngine).
    tr_gp = tr.phase("grand_products")
    tr_gp.__enter__()
    nums, dens = [], []
    gidx = 0
    for chunk in chunks:
        num = eng.const_vec(1, n)
        den = eng.const_vec(1, n)
        for col in chunk:
            vals = col_values(col)
            sig_l = cosets.sigma_lag[perm_cols.index(col)]
            delta = deltas[gidx]
            id_part = eng.scale(cosets.omega_pows, beta * delta % R)
            num = eng.mul(num, eng.add_const(eng.add(vals, id_part), gamma))
            den = eng.mul(den, eng.add_const(
                eng.add(vals, eng.scale(sig_l, beta)), gamma))
            gidx += 1
        nums.append(num)
        dens.append(den)
    lookup_a_vecs, lookup_s_vecs = [], []
    for lk_s in lookup_state:
        av = eng.from_ints(lk_s["a_ints"])
        sv = eng.from_ints(lk_s["s_ints"])
        lookup_a_vecs.append(av)
        lookup_s_vecs.append(sv)
        nums.append(eng.mul(eng.add_const(lk_s["comp_input_dev"], beta),
                            eng.add_const(lk_s["comp_table_dev"], gamma)))
        dens.append(eng.mul(eng.add_const(av, beta),
                            eng.add_const(sv, gamma)))
    prefixes = eng.grand_products(nums, dens)
    nums.clear()
    dens.clear()
    for lk_s in lookup_state:   # compressed vectors are re-derived on the
        lk_s["comp_input_dev"] = lk_s["comp_table_dev"] = None  # coset later

    z_ints_sets = []
    last_z = 1
    for pref in prefixes[:len(chunks)]:
        scaled = eng.to_ints(eng.scale(pref, last_z))
        z = [last_z] + scaled[:u] + [0] * b
        last_z = z[u]
        for i in range(n - b, n):
            z[i] = _rng_field(rng)
        z_ints_sets.append(z)
    tr_gp.__exit__(None, None, None)
    z_values = [eng.from_ints(z) for z in z_ints_sets]
    z_polys = [eng.lagrange_to_coeff(z) for z in z_values]

    # lookup product polys: z[i+1] = z[i] * (A+beta)(S+gamma)/((a'+beta)(s'+gamma))
    lookup_z_vecs = []
    for lk_s, av, sv, pref in zip(lookup_state, lookup_a_vecs,
                                  lookup_s_vecs, prefixes[len(chunks):]):
        prefix = eng.to_ints(pref)
        z = [1] + prefix[:u] + [0] * b
        for i in range(n - b, n):
            z[i] = _rng_field(rng)
        lk_s["z_ints"] = z
        zv = eng.from_ints(z)
        lookup_z_vecs.append(zv)
        lk_s["z_poly"] = eng.lagrange_to_coeff(zv)
        lk_s["a_poly"] = eng.lagrange_to_coeff(av)
        lk_s["s_poly"] = eng.lagrange_to_coeff(sv)
    with tr.phase("commit_z"):
        for p in eng.commit_lagrange_batch(z_values + lookup_z_vecs):
            t.write_point(p)

    # vanishing random poly
    random_ints = [_rng_field(rng) for _ in range(n)]
    random_poly = eng.from_ints(random_ints)
    t.write_point(eng.commit_batch([random_poly])[0])

    y = t.squeeze_challenge()

    # -- phase 3: quotient -------------------------------------------------
    # Lagrange-domain advice is dead from here on (the quotient reads the
    # coefficient/coset forms): free ~80 x n-vectors of HBM at k=15.
    # (rebind, not del: the names live in eval_expr_lagrange's closure)
    advice_values = advice_ints = None
    tr_q = tr.phase("quotient")
    tr_q.__enter__()
    en = d.extended_n
    advice_cosets = [eng.coeff_to_extended_coset(p) for p in advice_polys]
    instance_cosets = [eng.coeff_to_extended_coset(p) for p in instance_polys]
    z_cosets = [eng.coeff_to_extended_coset(p) for p in z_polys]

    def coset_of(col):
        if col.kind == "advice":
            return advice_cosets[col.index]
        if col.kind == "fixed":
            return cosets.fixed[col.index]
        return instance_cosets[col.index]

    def rot_ext(vec, rot):
        return eng.rotate(vec, rot * step)

    def eval_expr_coset(expr):
        return expr.evaluate(
            constant=lambda c: eng.const_vec(c, en),
            fixed=lambda q: rot_ext(cosets.fixed[q.column_index], q.rotation),
            advice=lambda q: rot_ext(advice_cosets[q.column_index], q.rotation),
            instance=lambda q: rot_ext(instance_cosets[q.column_index], q.rotation),
            negate=eng.neg,
            add=eng.add,
            mul=eng.mul,
        )

    hv = eng.const_vec(0, en)

    def fold(vals):
        nonlocal hv
        hv = eng.add(eng.scale(hv, y), vals)

    one_ext = eng.const_vec(1, en)
    for gate in cs.gates:
        for poly in gate.polys:
            fold(eval_expr_coset(poly))

    # permutation expressions (order matches contract.sol:452-505)
    if chunks:
        # l_0 (1 - z_first)
        fold(eng.mul(cosets.l0, eng.sub(one_ext, z_cosets[0])))
        # l_last (z_last^2 - z_last)
        zl = z_cosets[-1]
        fold(eng.mul(cosets.l_last, eng.sub(eng.mul(zl, zl), zl)))
        # l_0 (z_j - z_{j-1}(w^{-(b+1)} X))
        for j in range(1, len(chunks)):
            prev_rot = rot_ext(z_cosets[j - 1], -(b + 1))
            fold(eng.mul(cosets.l0, eng.sub(z_cosets[j], prev_rot)))
        # product rules
        gidx = 0
        for j, chunk in enumerate(chunks):
            lhs = rot_ext(z_cosets[j], 1)
            rhs = z_cosets[j]
            for col in chunk:
                cvals = coset_of(col)
                sig_c = cosets.sigma[perm_cols.index(col)]
                delta = deltas[gidx]
                lhs = eng.mul(lhs, eng.add_const(
                    eng.add(cvals, eng.scale(sig_c, beta)), gamma))
                rhs = eng.mul(rhs, eng.add_const(
                    eng.add(cvals, eng.scale(cosets.coset_points, beta * delta % R)),
                    gamma))
                gidx += 1
            fold(eng.mul(eng.sub(lhs, rhs), cosets.l_active))

    # lookup expressions
    for lk, lk_s in zip(cs.lookups, lookup_state):
        zc = eng.coeff_to_extended_coset(lk_s["z_poly"])
        ac = eng.coeff_to_extended_coset(lk_s["a_poly"])
        sc = eng.coeff_to_extended_coset(lk_s["s_poly"])
        z_next = rot_ext(zc, 1)
        a_prev = rot_ext(ac, -1)

        def compress_coset(exprs):
            acc = eng.const_vec(0, en)
            for e in exprs:
                acc = eng.add(eng.scale(acc, theta), eval_expr_coset(e))
            return acc

        comp_in = compress_coset([p[0] for p in lk.pairs])
        comp_tb = compress_coset([p[1] for p in lk.pairs])
        fold(eng.mul(cosets.l0, eng.sub(one_ext, zc)))
        fold(eng.mul(cosets.l_last, eng.sub(eng.mul(zc, zc), zc)))
        lhs = eng.mul(z_next, eng.mul(eng.add_const(ac, beta),
                                      eng.add_const(sc, gamma)))
        rhs = eng.mul(zc, eng.mul(eng.add_const(comp_in, beta),
                                  eng.add_const(comp_tb, gamma)))
        fold(eng.mul(eng.sub(lhs, rhs), cosets.l_active))
        fold(eng.mul(cosets.l0, eng.sub(ac, sc)))
        fold(eng.mul(eng.mul(eng.sub(ac, sc), eng.sub(ac, a_prev)),
                     cosets.l_active))

    tr_q.__exit__(None, None, None)
    h_values = eng.mul(hv, cosets.zh_inv)
    h_coeffs_ints = eng.to_ints(eng.extended_coset_to_coeff(h_values))
    h_coeffs_ints = h_coeffs_ints[: d.quotient_poly_degree * n]
    h_chunk_ints = [h_coeffs_ints[i * n:(i + 1) * n]
                    for i in range(d.quotient_poly_degree)]
    h_chunk_ints = [c + [0] * (n - len(c)) for c in h_chunk_ints]
    h_chunks = [eng.from_ints(c) for c in h_chunk_ints]
    with tr.phase("commit_h"):
        for p in eng.commit_batch(h_chunks):
            t.write_point(p)

    x = t.squeeze_challenge()
    xn = pow(x, n, R)

    # -- evaluations (batched: one device round-trip per distinct x) --------
    tr_e = tr.phase("evals")
    tr_e.__enter__()
    x_next = rotate_omega(d, x, 1)
    x_last = rotate_omega(d, x, -(b + 1))
    x_prev = rotate_omega(d, x, -1)
    pairs = []
    for ci, rot in cs.advice_queries:
        pairs.append((advice_polys[ci], rotate_omega(d, x, rot)))
    for ci, rot in cs.fixed_queries:
        pairs.append((cosets.fixed_polys[ci], rotate_omega(d, x, rot)))
    pairs.append((random_poly, x))
    for sp in cosets.sigma_polys:
        pairs.append((sp, x))
    for j, zp in enumerate(z_polys):
        pairs.append((zp, x))
        pairs.append((zp, x_next))
        if j + 1 < len(z_polys):
            pairs.append((zp, x_last))
    for lk_s in lookup_state:
        pairs.extend([(lk_s["z_poly"], x), (lk_s["z_poly"], x_next),
                      (lk_s["a_poly"], x), (lk_s["a_poly"], x_prev),
                      (lk_s["s_poly"], x)])
    for v in eng.eval_polys(pairs):
        t.write_scalar(v)
    tr_e.__exit__(None, None, None)
    # -- multiopen queries (order pins SHPLONK set structure) --------------
    # fold h chunks with x^n (Horner from last chunk)
    h_folded = eng.const_vec(0, n)
    for c in reversed(h_chunks):
        h_folded = eng.add(eng.scale(h_folded, xn), c)

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
        queries.append(Query(("fixed", ci), cosets.fixed_polys[ci], rot))
    for j, sp in enumerate(cosets.sigma_polys):
        queries.append(Query(("sigma", j), sp, 0))
    queries.append(Query(("h",), h_folded, 0))
    queries.append(Query(("random",), random_poly, 0))

    if debug is not None:
        debug.update(dict(
            advice_polys=advice_polys, instance_polys=instance_polys,
            z_polys=z_polys, random_poly=random_poly, h_chunks=h_chunks,
            h_folded=h_folded, queries=queries, engine=eng,
            theta=theta, beta=beta, gamma=gamma, y=y, x=x,
        ))
    with tr.phase("shplonk"):
        shplonk_open(t, srs, d, queries, x, eng)
    return bytes(t.proof)
