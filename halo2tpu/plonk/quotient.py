"""Part-wise quotient evaluation (the prover's vanishing argument).

TPU-first replacement for halo2's full extended-coset evaluation: the
extended coset {g * w_ext^j} splits into step = extended_n/n interleaved
cosets ("parts") of the order-n subgroup — part q holds rows j = q + step*t
with points c_q * w^t, c_q = g * w_ext^q (polyops.part_shift).  Because
expression rotations on the extended domain are always multiples of step,
a rotation never crosses parts; and Z_H(x) = x^n - 1 is CONSTANT on a part
(c_q^n - 1).  So the whole quotient can be evaluated part by part with an
n-sized working set: at composite-Aadhaar width (~750 columns, step 8) this
is ~1.5 GB of transient HBM instead of the ~12 GB of resident full-size
cosets that ResourceExhausted'd the round-2 bench.

Two execution paths, byte-identical results:
  - host path: python-int evaluation via Expr.evaluate (golden reference)
  - jnp path:  expressions are compiled into jitted fold programs, cached
    by STRUCTURE (leaf kinds/rotations + op tree) so the ~250 structurally
    identical flexgate gates of a wide circuit share one compiled XLA
    program; challenges and constants enter as (16,)-scalar arguments, so
    nothing recompiles across proofs.

Fold order (gates, then permutation rules, then per-lookup rules) is pinned
by the verifier's y-Horner (contract.sol:443-505) and must match
verifier.py exactly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..fields import jfield
from ..fields.jfield import FR as JFR
from ..fields.bn254 import R, FR_DELTA
from .expression import (AdviceQuery, Constant, FixedQuery, InstanceQuery,
                         Neg, Product, Sum)
from . import polyops


# ---------------------------------------------------------------------------
# structural expression compiler (jnp path)

_FOLD_FNS: dict[str, object] = {}


def _walk(e, leaves, toks):
    if isinstance(e, Constant):
        leaves.append(("const", e.value))
        toks.append("c")
    elif isinstance(e, AdviceQuery):
        leaves.append(("advice", e.column_index))
        toks.append(f"a{e.rotation};")
    elif isinstance(e, FixedQuery):
        leaves.append(("fixed", e.column_index))
        toks.append(f"f{e.rotation};")
    elif isinstance(e, InstanceQuery):
        leaves.append(("instance", e.column_index))
        toks.append(f"i{e.rotation};")
    elif isinstance(e, Neg):
        toks.append("n(")
        _walk(e.expr, leaves, toks)
        toks.append(")")
    elif isinstance(e, Sum):
        toks.append("s(")
        _walk(e.lhs, leaves, toks)
        toks.append(",")
        _walk(e.rhs, leaves, toks)
        toks.append(")")
    elif isinstance(e, Product):
        toks.append("p(")
        _walk(e.lhs, leaves, toks)
        toks.append(",")
        _walk(e.rhs, leaves, toks)
        toks.append(")")
    else:  # pragma: no cover
        raise TypeError(f"unknown expr node {type(e)}")


def _make_val_fn(expr):
    """Build jit fn(*leaf_arrays) -> expr value.  Two exprs with the same
    structure token produce identical traced graphs, so the fn built from
    the first instance serves all of them."""

    def f(*args):
        it = iter(args)
        shape = None
        for a in args:
            if a.ndim == 2:
                shape = a.shape
                break

        def ev(e):
            if isinstance(e, Constant):
                return jnp.broadcast_to(next(it), shape)
            if isinstance(e, (AdviceQuery, FixedQuery, InstanceQuery)):
                a = next(it)
                r = e.rotation % a.shape[0]
                return jnp.roll(a, -r, axis=0) if r else a
            if isinstance(e, Neg):
                return jfield.neg(JFR, ev(e.expr))
            if isinstance(e, Sum):
                return jfield.add(JFR, ev(e.lhs), ev(e.rhs))
            return jfield.mont_mul(JFR, ev(e.lhs), ev(e.rhs))

        return ev(expr)

    return jax.jit(f)


def _val_fn_for(expr):
    leaves: list = []
    toks: list = []
    _walk(expr, leaves, toks)
    key = "".join(toks)
    fn = _FOLD_FNS.get(key)
    if fn is None:
        fn = _make_val_fn(expr)
        _FOLD_FNS[key] = fn
    return fn, leaves


# shared jitted rule kernels (each returns its expression VALUE; the y-fold
# happens afterwards as a weighted reduction — a Horner chain of dependent
# dispatches would serialize at ~30 ms/link on the axon runtime) -----------

def _bc(s, like):
    return jnp.broadcast_to(s, like.shape)


@jax.jit
def _val_l0_one_minus_z(l0, z):
    one = _bc(jnp.asarray(JFR.one_mont), z)
    return jfield.mont_mul(JFR, l0, jfield.sub(JFR, one, z))


@jax.jit
def _val_llast_zz(l_last, z):
    return jfield.mont_mul(JFR, l_last,
                           jfield.sub(JFR, jfield.mont_mul(JFR, z, z), z))


@partial(jax.jit, static_argnums=3)
def _val_l0_z_minus_prev(l0, z, z_prev, rot):
    prev = jnp.roll(z_prev, -(rot % z_prev.shape[0]), axis=0)
    return jfield.mont_mul(JFR, l0, jfield.sub(JFR, z, prev))


@jax.jit
def _val_perm_product(z, l_active, cvals, sigmas, bds, beta, gamma, wq):
    """Permutation chunk product rule value:
      (z(wX) prod(c + beta*sigma + gamma) - z(X) prod(c + beta*delta_j*wq
       + gamma)) * l_active.  cvals/sigmas: (m, n, 16); bds: (m, 16)."""
    z_next = jnp.roll(z, -1, axis=0)
    lhs, rhs = z_next, z
    m = cvals.shape[0]
    for j in range(m):
        c = cvals[j]
        t1 = jfield.add(JFR, c, jfield.mont_mul(JFR, sigmas[j], _bc(beta, c)))
        lhs = jfield.mont_mul(JFR, lhs,
                              jfield.add(JFR, t1, _bc(gamma, c)))
        t2 = jfield.add(JFR, c, jfield.mont_mul(JFR, wq, _bc(bds[j], c)))
        rhs = jfield.mont_mul(JFR, rhs,
                              jfield.add(JFR, t2, _bc(gamma, c)))
    return jfield.mont_mul(JFR, jfield.sub(JFR, lhs, rhs), l_active)


@jax.jit
def _val_lookup_rules(zc, ac, sc, comp_in, comp_tb, l0, l_last, l_active,
                      beta, gamma):
    """The five halo2 lookup-argument expression values, protocol order:
      l0(1-z); l_last(z^2-z);
      (z(wX)(a'+beta)(s'+gamma) - z(X)(A+beta)(S+gamma)) l_active;
      l0(a'-s'); (a'-s')(a'-a'(w^-1 X)) l_active."""
    one = _bc(jnp.asarray(JFR.one_mont), zc)
    bb, gb = _bc(beta, zc), _bc(gamma, zc)
    v1 = jfield.mont_mul(JFR, l0, jfield.sub(JFR, one, zc))
    v2 = jfield.mont_mul(JFR, l_last,
                         jfield.sub(JFR, jfield.mont_mul(JFR, zc, zc), zc))
    z_next = jnp.roll(zc, -1, axis=0)
    a_prev = jnp.roll(ac, 1, axis=0)
    lhs = jfield.mont_mul(JFR, z_next, jfield.mont_mul(
        JFR, jfield.add(JFR, ac, bb), jfield.add(JFR, sc, gb)))
    rhs = jfield.mont_mul(JFR, zc, jfield.mont_mul(
        JFR, jfield.add(JFR, comp_in, bb), jfield.add(JFR, comp_tb, gb)))
    v3 = jfield.mont_mul(JFR, jfield.sub(JFR, lhs, rhs), l_active)
    a_minus_s = jfield.sub(JFR, ac, sc)
    v4 = jfield.mont_mul(JFR, l0, a_minus_s)
    v5 = jfield.mont_mul(JFR, jfield.mont_mul(
        JFR, a_minus_s, jfield.sub(JFR, ac, a_prev)), l_active)
    return v1, v2, v3, v4, v5


def compress_exprs(eng, exprs, col_vals, theta, n):
    """theta-compression sum_i theta^(k-1-i) e_i over any column family
    (prover's n-domain lookup compression reuses the quotient's
    structure-compiled value fns on the jnp path)."""
    if eng.jnp_backed:
        vals = []
        for e in exprs:
            fn, leaves = _val_fn_for(e)
            args = [eng._enc_scalar(v) if kind == "const"
                    else col_vals[kind][v] for kind, v in leaves]
            vals.append(fn(*args))
        if len(vals) == 1:
            return vals[0]
        k = len(vals)
        return eng.weighted_sum(vals, [pow(theta, k - 1 - i, R)
                                       for i in range(k)])
    acc = eng.const_vec(0, n)
    for e in exprs:
        v = e.evaluate(
            constant=lambda c: eng.const_vec(c, n),
            fixed=lambda qu: eng.rotate(col_vals["fixed"][qu.column_index],
                                        qu.rotation),
            advice=lambda qu: eng.rotate(col_vals["advice"][qu.column_index],
                                         qu.rotation),
            instance=lambda qu: eng.rotate(
                col_vals["instance"][qu.column_index], qu.rotation),
            negate=eng.neg,
            add=eng.add,
            mul=eng.mul,
        )
        acc = eng.add(eng.scale(acc, theta), v)
    return acc


# ---------------------------------------------------------------------------
# fold driver

def fold_quotient(eng, cs, d, st, srcs, ch, tracer=None):
    """Evaluate the folded quotient numerator part by part and return the
    h coefficient chunks.

    st:   prover._PkState (part l0/l_last/l_active, zh_inv, omega_pows,
          fixed/sigma coefficient polys)
    srcs: dict with advice_polys, instance_polys, z_polys,
          lookup_polys = [(z, a, s)] per lookup
    ch:   dict with theta, beta, gamma, y (python ints)
    """
    step = d.extended_n // d.n
    parts = []
    for q in range(step):
        if eng.jnp_backed:
            hv = _fold_part_jnp(eng, cs, d, st, srcs, ch, q)
        else:
            hv = _fold_part_host(eng, cs, d, st, srcs, ch, q)
        parts.append(eng.scale(hv, st.zh_inv[q]))
    return eng.parts_to_h_chunks(parts, d.quotient_poly_degree)


def _perm_layout(cs):
    chunk_len = cs.permutation_chunk_len()
    cols = cs.permutation_columns
    return [cols[i:i + chunk_len] for i in range(0, len(cols), chunk_len)]


def _fold_part_jnp(eng, cs, d, st, srcs, ch, q):
    """Jnp path: every contribution is evaluated as an INDEPENDENT dispatch
    (they pipeline), then hv = sum_i y^(N-1-i) v_i runs as chunked weighted
    reductions — identical value to the verifier's Horner y-fold, without
    an N-deep dependent-dispatch chain."""
    n = d.n
    b = cs.blinding_factors()
    # part values for every column family, one batched scaled-NTT per family
    adv = eng.coeff_to_part_stack(srcs["advice_polys"], q)
    fix = st.fixed_parts(eng, q)     # witness-independent: cached on state
    sig = st.sigma_parts(eng, q)
    inst = eng.coeff_to_part_stack(srcs["instance_polys"], q)
    zs = eng.coeff_to_part_stack(srcs["z_polys"], q)
    lk_parts = []
    for (zp, ap, sp) in srcs["lookup_polys"]:
        zc, ac, sc = eng.coeff_to_part_stack([zp, ap, sp], q)
        lk_parts.append((zc, ac, sc))
    l0, l_last, l_active = st.part_l[q]
    wq = eng.scale(st.omega_pows, polyops.part_shift(d, q))

    col_vals = {"advice": adv, "fixed": fix, "instance": inst}
    theta = ch["theta"]
    beta_e = eng._enc_scalar(ch["beta"])
    gamma_e = eng._enc_scalar(ch["gamma"])

    def leaf_arrays(leaves):
        out = []
        for kind, v in leaves:
            if kind == "const":
                out.append(eng._enc_scalar(v))
            else:
                out.append(col_vals[kind][v])
        return out

    values = []   # protocol fold order (gates, permutation, lookups)

    for gate in cs.gates:
        for poly in gate.polys:
            fn, leaves = _val_fn_for(poly)
            values.append(fn(*leaf_arrays(leaves)))

    chunks = _perm_layout(cs)
    if chunks:
        perm_cols = cs.permutation_columns
        deltas = [pow(FR_DELTA, j, R) for j in range(len(perm_cols))]
        values.append(_val_l0_one_minus_z(l0, zs[0]))
        values.append(_val_llast_zz(l_last, zs[-1]))
        for j in range(1, len(chunks)):
            values.append(_val_l0_z_minus_prev(l0, zs[j], zs[j - 1],
                                               (-(b + 1)) % n))
        gidx = 0
        for j, chunk in enumerate(chunks):
            cvals = jnp.stack([col_vals[c.kind][c.index] for c in chunk])
            sigmas = jnp.stack([sig[perm_cols.index(c)] for c in chunk])
            bds = jnp.stack([eng._enc_scalar(ch["beta"] * deltas[gidx + i] % R)
                             for i in range(len(chunk))])
            values.append(_val_perm_product(zs[j], l_active, cvals, sigmas,
                                            bds, beta_e, gamma_e, wq))
            gidx += len(chunk)

    for lk, (zc, ac, sc) in zip(cs.lookups, lk_parts):
        def compress(exprs):
            vals = []
            for e in exprs:
                fn, leaves = _val_fn_for(e)
                vals.append(fn(*leaf_arrays(leaves)))
            k = len(vals)
            if k == 1:
                return vals[0]
            return eng.weighted_sum(vals,
                                    [pow(theta, k - 1 - i, R)
                                     for i in range(k)])

        comp_in = compress([p[0] for p in lk.pairs])
        comp_tb = compress([p[1] for p in lk.pairs])
        values.extend(_val_lookup_rules(zc, ac, sc, comp_in, comp_tb,
                                        l0, l_last, l_active, beta_e,
                                        gamma_e))

    if not values:   # constraint-free circuit (reference timestamp quirk)
        return jnp.zeros((n, jfield.NLIMB), jnp.uint32)
    N = len(values)
    y = ch["y"]
    return eng.weighted_sum(values, [pow(y, N - 1 - i, R) for i in range(N)])


def _fold_part_host(eng, cs, d, st, srcs, ch, q):
    n = d.n
    b = cs.blinding_factors()
    adv = [eng.coeff_to_part(p, q) for p in srcs["advice_polys"]]
    fix = [eng.coeff_to_part(p, q) for p in st.fixed_polys]
    sig = [eng.coeff_to_part(p, q) for p in st.sigma_polys]
    inst = [eng.coeff_to_part(p, q) for p in srcs["instance_polys"]]
    zs = [eng.coeff_to_part(p, q) for p in srcs["z_polys"]]
    lk_parts = [tuple(eng.coeff_to_part(p, q) for p in polys)
                for polys in srcs["lookup_polys"]]
    l0, l_last, l_active = st.part_l[q]
    wq = eng.scale(st.omega_pows, polyops.part_shift(d, q))
    theta, beta, gamma, y = ch["theta"], ch["beta"], ch["gamma"], ch["y"]

    col_vals = {"advice": adv, "fixed": fix, "instance": inst}

    def eval_expr(expr):
        return expr.evaluate(
            constant=lambda c: eng.const_vec(c, n),
            fixed=lambda qu: eng.rotate(fix[qu.column_index], qu.rotation),
            advice=lambda qu: eng.rotate(adv[qu.column_index], qu.rotation),
            instance=lambda qu: eng.rotate(inst[qu.column_index], qu.rotation),
            negate=eng.neg,
            add=eng.add,
            mul=eng.mul,
        )

    hv = eng.const_vec(0, n)

    def fold(vals):
        nonlocal hv
        hv = eng.add(eng.scale(hv, y), vals)

    one = eng.const_vec(1, n)
    for gate in cs.gates:
        for poly in gate.polys:
            fold(eval_expr(poly))

    chunks = _perm_layout(cs)
    if chunks:
        perm_cols = cs.permutation_columns
        deltas = [pow(FR_DELTA, j, R) for j in range(len(perm_cols))]
        fold(eng.mul(l0, eng.sub(one, zs[0])))
        zl = zs[-1]
        fold(eng.mul(l_last, eng.sub(eng.mul(zl, zl), zl)))
        for j in range(1, len(chunks)):
            prev = eng.rotate(zs[j - 1], -(b + 1))
            fold(eng.mul(l0, eng.sub(zs[j], prev)))
        gidx = 0
        for j, chunk in enumerate(chunks):
            lhs = eng.rotate(zs[j], 1)
            rhs = zs[j]
            for col in chunk:
                cv = col_vals[col.kind][col.index]
                sg = sig[perm_cols.index(col)]
                lhs = eng.mul(lhs, eng.add_const(
                    eng.add(cv, eng.scale(sg, beta)), gamma))
                rhs = eng.mul(rhs, eng.add_const(
                    eng.add(cv, eng.scale(wq, beta * deltas[gidx] % R)),
                    gamma))
                gidx += 1
            fold(eng.mul(eng.sub(lhs, rhs), l_active))

    for lk, (zc, ac, sc) in zip(cs.lookups, lk_parts):
        def compress(exprs):
            acc = eng.const_vec(0, n)
            for e in exprs:
                acc = eng.add(eng.scale(acc, theta), eval_expr(e))
            return acc

        comp_in = compress([p[0] for p in lk.pairs])
        comp_tb = compress([p[1] for p in lk.pairs])
        z_next = eng.rotate(zc, 1)
        a_prev = eng.rotate(ac, -1)
        fold(eng.mul(l0, eng.sub(one, zc)))
        fold(eng.mul(l_last, eng.sub(eng.mul(zc, zc), zc)))
        lhs = eng.mul(z_next, eng.mul(eng.add_const(ac, beta),
                                      eng.add_const(sc, gamma)))
        rhs = eng.mul(zc, eng.mul(eng.add_const(comp_in, beta),
                                  eng.add_const(comp_tb, gamma)))
        fold(eng.mul(eng.sub(lhs, rhs), l_active))
        fold(eng.mul(l0, eng.sub(ac, sc)))
        fold(eng.mul(eng.mul(eng.sub(ac, sc), eng.sub(ac, a_prev)),
                     l_active))
    return hv
