"""Polynomial-arithmetic engines for the prover.

The prover pipeline (prover.py) is engine-generic: every hot operation —
NTTs, part/coset evaluation, expression folding, grand-product scans, batch
inversion, lookup permutation, MSM commitments — goes through one of these
engines, with field vectors held in an engine-owned representation:

  HostEngine: python-int lists (golden reference; fine for k <= 8)
  JaxEngine:  (n, 16)-limb Montgomery device arrays; NTT/MSM on TPU
              (ops/ntt.py, ops/msm.py), elementwise ops fused by XLA

The engines are transcript-compatible: both produce identical proof bytes
for the same witness + rng seed (tested in tests/test_jax_kernels.py,
test_jax_engine_proof_byte_parity).

Device-residency is the design rule (round-2 lesson: the TPU tunnel moves
device->host bytes at ~7 MB/s): every engine method keeps data in engine
representation, transfers ride a packed uint16 wire, and the only
device->host reads in a proof are commitment points, per-point evaluations
and a handful of scalars.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.bn254 import R, batch_inv as host_batch_inv, inv_mod
from ..fields import jfield
from ..fields.jfield import FR as JFR, NLIMB
from ..ops import ntt as jntt
from ..ops.msm import MSMContext
from .domain import Domain
from . import polyops


class HostEngine:
    """Python-int engine (golden reference)."""

    name = "host"
    jnp_backed = False

    def __init__(self, domain: Domain, srs):
        self.d = domain
        self.srs = srs

    # representation
    def from_ints(self, vals):
        return [v % R for v in vals]

    def from_ints_stack(self, cols):
        return [self.from_ints(c) for c in cols]

    def from_packed(self, u16_arr):
        """(n, 16) uint16 plain limbs -> engine vector."""
        return jfield.limbs_to_ints(np.asarray(u16_arr))

    def from_packed_stack(self, arrs):
        return [self.from_packed(a) for a in arrs]

    def to_ints(self, vec):
        return list(vec)

    def const_vec(self, c, n):
        return [c % R] * n

    # elementwise
    def add(self, a, b):
        return [(x + y) % R for x, y in zip(a, b)]

    def sub(self, a, b):
        return [(x - y) % R for x, y in zip(a, b)]

    def mul(self, a, b):
        return [x * y % R for x, y in zip(a, b)]

    def neg(self, a):
        return [(-x) % R for x in a]

    def scale(self, a, c):
        c %= R
        return [x * c % R for x in a]

    def add_const(self, a, c):
        c %= R
        return [(x + c) % R for x in a]

    def rotate(self, a, k):
        k %= len(a)
        return a[k:] + a[:k] if k else a

    def batch_inv(self, a):
        return host_batch_inv(a)

    def prefix_prod(self, a):
        out = [0] * len(a)
        acc = 1
        for i, v in enumerate(a):
            acc = acc * v % R
            out[i] = acc
        return out

    # scalar access
    def read_rows(self, vecs, row):
        """[vec, ...] -> [int(vec[row]), ...]."""
        return [int(v[row]) % R for v in vecs]

    def set_rows(self, vec, start, ints):
        out = list(vec)
        for i, v in enumerate(ints):
            out[start + i] = v % R
        return out

    def assemble_z(self, pref, head, blind_start, blind_ints):
        """z[0] = head, z[i] = head * pref[i-1]; rows >= blind_start get
        blind_ints."""
        head %= R
        z = [head] + [head * p % R for p in pref[:-1]]
        return self.set_rows(z, blind_start, blind_ints)

    # transforms
    def lagrange_to_coeff(self, vec):
        return polyops.intt(vec, self.d.omega)

    def lagrange_to_coeff_stack(self, vecs):
        return [self.lagrange_to_coeff(v) for v in vecs]

    def coeff_to_lagrange(self, vec):
        return polyops.ntt(vec, self.d.omega)

    def coeff_to_extended_coset(self, vec):
        return polyops.coeff_to_extended_coset(vec, self.d)

    def extended_coset_to_coeff(self, vec):
        return polyops.extended_coset_to_coeff(vec, self.d)

    # parts (extended coset split into step interleaved n-cosets)
    def coeff_to_part(self, vec, q):
        return polyops.coeff_to_part(vec, self.d, q)

    def coeff_to_part_stack(self, vecs, q):
        return [self.coeff_to_part(v, q) for v in vecs]

    def parts_to_h_chunks(self, parts, qpd):
        return polyops.parts_to_h_chunks(parts, self.d, qpd)

    # lookup permutation (grouping form; see prover._permute_lookup docs)
    def permute_lookup(self, comp_input, comp_table, usable):
        a = sorted(comp_input[:usable])
        t_counts: dict[int, int] = {}
        for v in comp_table[:usable]:
            t_counts[v] = t_counts.get(v, 0) + 1
        s: list = [None] * usable
        for i, v in enumerate(a):
            if i == 0 or v != a[i - 1]:
                if t_counts.get(v, 0) == 0:
                    raise ValueError(f"lookup failure: input {v} not in table")
                t_counts[v] -= 1
                s[i] = v
        # leftovers fill the gaps in ascending value order (matches the
        # device sort-based construction, so proofs are engine-independent)
        rest = []
        for v in sorted(t_counts):
            rest.extend([v] * t_counts[v])
        ri = 0
        for i in range(usable):
            if s[i] is None:
                s[i] = rest[ri]
                ri += 1
        n = self.d.n
        return a + [0] * (n - usable), s + [0] * (n - usable)

    # evaluation & commitment
    def eval_poly(self, coeffs, x):
        return polyops.eval_poly(coeffs, x)

    def eval_polys(self, pairs):
        """[(poly, x), ...] -> list of evaluations (python ints), same
        order.  The prover's eval phase batches through this."""
        return [self.eval_poly(p, x) for p, x in pairs]

    def div_linear(self, vec, a):
        """vec(X) / (X - a), exact synthetic division, zero-padded back to
        the input length."""
        out = [0] * len(vec)
        acc = 0
        for i in range(len(vec) - 1, 0, -1):
            acc = (vec[i] + acc) % R
            out[i - 1] = acc
            acc = acc * a % R
        return out

    def grand_products(self, nums, dens):
        """Per-vector prefix products of num/den ratios (permutation +
        lookup grand products batched into one inversion/scan pass)."""
        return [self.prefix_prod(self.mul(n_, self.batch_inv(d_)))
                for n_, d_ in zip(nums, dens)]

    def commit_lagrange_batch(self, vecs):
        return [self.srs.commit_lagrange(v) for v in vecs]

    def commit_batch(self, vecs):
        return [self.srs.commit(v) for v in vecs]


# ---------------------------------------------------------------------------
# device helpers (jitted once, shared by all JaxEngine instances)

def _enc_scalar_raw(c: int):
    return JFR.encode([c % R])[0]


@jax.jit
def _stack_rows(rows):
    return jnp.stack(rows)


def _tree_sum(spec, arr):
    """Sum over axis 0 of (m, n, 16) by halving rounds."""
    while arr.shape[0] > 1:
        half = arr.shape[0] // 2
        head = jfield.add(spec, arr[:half], arr[half:2 * half])
        arr = head if 2 * half == arr.shape[0] else \
            jnp.concatenate([head, arr[2 * half:]], axis=0)
    return arr[0]


def _sort_by_value(arr, extra=(), num_extra_keys=0):
    """Sort (m, 16) plain limb rows ascending by value; extra (m,) operands
    ride along (first num_extra_keys of them as trailing sort keys)."""
    ops = tuple(arr[:, NLIMB - 1 - i] for i in range(NLIMB)) + tuple(extra)
    out = jax.lax.sort(ops, num_keys=NLIMB + num_extra_keys, is_stable=True)
    sorted_arr = jnp.stack(out[:NLIMB][::-1], axis=1)
    return sorted_arr, out[NLIMB:]


def _permute_lookup_jit(u: int, a_plain, t_plain):
    """Device lookup permutation (halo2 permuted-pairs, SURVEY "sorting on
    TPU" hard part): returns (A' plain, S' plain, fail) with rows >= u
    zeroed.  A' = sorted inputs; S' = table permuted so every first
    occurrence in A' has S'[i] = A'[i], leftovers fill gaps in ascending
    value order.  All-0xFFFFFFFF limb rows are unreachable sentinels
    (real limbs are 16-bit)."""
    n = a_plain.shape[0]
    row = jnp.arange(n)
    pad = row >= u
    FF = jnp.uint32(0xFFFFFFFF)
    a1 = jnp.where(pad[:, None], FF, a_plain)
    t1 = jnp.where(pad[:, None], FF, t_plain)

    ap, _ = _sort_by_value(a1)
    prev = jnp.concatenate([jnp.full((1, NLIMB), FF, jnp.uint32), ap[:-1]], 0)
    first = ((row == 0) | jnp.any(ap != prev, axis=1)) & ~pad

    # markers (distinct A' values) + table entries, sorted by (value, flag):
    # a table copy directly after a marker is the consumed one
    mark = jnp.where(first[:, None], ap, FF)
    vals = jnp.concatenate([mark, t1], axis=0)
    flag = jnp.concatenate([jnp.zeros(n, jnp.uint32), jnp.ones(n, jnp.uint32)])
    svals, (sflag,) = _sort_by_value(vals, (flag,), num_extra_keys=1)
    prev_flag = jnp.concatenate([jnp.ones(1, jnp.uint32), sflag[:-1]])
    prev_vals = jnp.concatenate(
        [jnp.full((1, NLIMB), FF, jnp.uint32), svals[:-1]], 0)
    eq_prev = jnp.all(svals == prev_vals, axis=1)
    consumed = (sflag == 1) & (prev_flag == 0) & eq_prev
    is_ff = jnp.all(svals == FF, axis=1)
    nxt_flag = jnp.concatenate([sflag[1:], jnp.zeros(1, jnp.uint32)])
    nxt_vals = jnp.concatenate([svals[1:], jnp.zeros((1, NLIMB), jnp.uint32)], 0)
    eq_next = jnp.all(svals == nxt_vals, axis=1)
    fail = jnp.any((sflag == 0) & ~is_ff & ~((nxt_flag == 1) & eq_next))

    # compact unconsumed table entries (already ascending) to the front
    left = (sflag == 1) & ~consumed & ~is_ff
    ckey = jnp.where(left, jnp.uint32(0), jnp.uint32(1))
    cops = (ckey,) + tuple(svals[:, NLIMB - 1 - i] for i in range(NLIMB))
    cs = jax.lax.sort(cops, num_keys=1, is_stable=True)
    leftover = jnp.stack(cs[1:][::-1], axis=1)

    gap_rank = jnp.cumsum((~first & ~pad).astype(jnp.int32)) - 1
    sp = jnp.where(first[:, None], ap,
                   leftover[jnp.clip(gap_rank, 0, 2 * n - 1)])
    zero = jnp.zeros((), jnp.uint32)
    ap = jnp.where(pad[:, None], zero, ap)
    sp = jnp.where(pad[:, None], zero, sp)
    return ap, sp, fail


_permute_lookup_dev = jax.jit(_permute_lookup_jit, static_argnums=0)


class JaxEngine:
    """TPU engine: vectors are (n, 16) uint32 Montgomery limb arrays."""

    name = "jax"
    jnp_backed = True
    stack_chunk = 64        # columns per batched-NTT pass (bounds transients)

    def __init__(self, domain: Domain, srs, msm_batch: int = 8):
        self.d = domain
        self.srs = srs
        self.msm_batch = msm_batch
        d = domain
        self._plan = jntt.get_plan(d.n, d.omega)
        self._msm_lagrange = MSMContext(srs.g_lagrange[:d.n])
        self._msm_coeff = MSMContext(srs.g[:d.n])
        self._pow_cache = {}
        self._scalar_cache = {}
        self._part_scale_cache = {}

    # representation
    def from_ints(self, vals):
        return JFR.encode(vals)

    def from_ints_stack(self, cols):
        """Many equal-length int columns -> list of (n, 16) vectors via ONE
        packed transfer + one widen/to-mont pass."""
        if not cols:
            return []
        u16 = np.stack([jfield.ints_to_limbs16([v % R for v in c])
                        for c in cols])
        stacked = JFR.encode_packed(u16)
        return [stacked[i] for i in range(len(cols))]

    def from_packed(self, u16_arr):
        return JFR.encode_packed(np.asarray(u16_arr))

    def from_packed_stack(self, arrs):
        if not arrs:
            return []
        stacked = JFR.encode_packed(np.stack([np.asarray(a) for a in arrs]))
        return [stacked[i] for i in range(len(arrs))]

    def to_ints(self, vec):
        return JFR.decode(vec)

    def _enc_scalar(self, c):
        c %= R
        v = self._scalar_cache.get(c)
        if v is None:
            v = _enc_scalar_raw(c)
            if len(self._scalar_cache) > 256:
                self._scalar_cache.clear()
            self._scalar_cache[c] = v
        return v

    def const_vec(self, c, n):
        return jnp.broadcast_to(self._enc_scalar(c), (n, jfield.NLIMB))

    # elementwise
    def add(self, a, b):
        return jfield.add(JFR, a, b)

    def sub(self, a, b):
        return jfield.sub(JFR, a, b)

    def mul(self, a, b):
        return jfield.mont_mul(JFR, a, b)

    def neg(self, a):
        return jfield.neg(JFR, a)

    def scale(self, a, c):
        return jfield.mont_mul(JFR, a, self.const_vec(c, a.shape[0]))

    def add_const(self, a, c):
        return jfield.add(JFR, a, self.const_vec(c, a.shape[0]))

    def rotate(self, a, k):
        return jnp.roll(a, -int(k % a.shape[0]), axis=0)

    def batch_inv(self, a):
        return jfield.batch_inv_scan(JFR, a)

    def prefix_prod(self, a):
        return jfield._prefix_prod(JFR, a)

    # scalar access
    def read_rows(self, vecs, row):
        stacked = _stack_rows([v[row] for v in vecs])
        return JFR.decode(stacked)

    def set_rows(self, vec, start, ints):
        if not ints:
            return vec
        patch = JFR.encode(ints)
        return jax.lax.dynamic_update_slice(vec, patch, (start, 0))

    def assemble_z(self, pref, head, blind_start, blind_ints):
        scaled = self.scale(pref, head)
        z = jnp.concatenate(
            [self.const_vec(head, 1), scaled[:-1]], axis=0)
        return self.set_rows(z, blind_start, blind_ints)

    # transforms
    def lagrange_to_coeff(self, vec):
        return jntt.intt(self._plan, vec)

    def _stack_transform(self, vecs, fn):
        """Apply fn over (n, C, 16) stacks in bounded chunks; returns the
        per-column list."""
        out = []
        for i in range(0, len(vecs), self.stack_chunk):
            chunk = vecs[i:i + self.stack_chunk]
            stacked = jnp.stack(chunk, axis=1)          # (n, C, 16)
            res = fn(stacked)
            out.extend(res[:, j] for j in range(len(chunk)))
        return out

    def lagrange_to_coeff_stack(self, vecs):
        if not vecs:
            return []
        return self._stack_transform(vecs, lambda s: jntt.intt(self._plan, s))

    def coeff_to_lagrange(self, vec):
        return jntt.ntt(self._plan, vec)

    # legacy full-coset transforms (kept for the sharded engine / tests)
    def coeff_to_extended_coset(self, vec):
        d = self.d
        plan_ext = jntt.get_plan(d.extended_n, d.extended_omega)
        en = d.extended_n
        scale_vec = self._part_pows(d.coset_shift, en)
        padded = jnp.concatenate(
            [vec, jnp.zeros((en - vec.shape[0], jfield.NLIMB), jnp.uint32)],
            axis=0)
        return jntt.ntt(plan_ext, jfield.mont_mul(JFR, padded, scale_vec))

    def extended_coset_to_coeff(self, vec):
        d = self.d
        plan_ext = jntt.get_plan(d.extended_n, d.extended_omega)
        coeffs = jntt.intt(plan_ext, vec)
        unscale = self._part_pows(inv_mod(d.coset_shift, R), d.extended_n)
        return jfield.mont_mul(JFR, coeffs, unscale)

    # parts
    def _part_pows(self, c: int, n: int | None = None):
        """Device (n, 16) Montgomery powers c^i, cached per c."""
        n = n or self.d.n
        key = (c % R, n)
        v = self._part_scale_cache.get(key)
        if v is None:
            pows = [1] * n
            for i in range(1, n):
                pows[i] = pows[i - 1] * c % R
            v = JFR.encode(pows)
            if len(self._part_scale_cache) > 96:   # div_linear points churn
                self._part_scale_cache.clear()
            self._part_scale_cache[key] = v
        return v

    def coeff_to_part(self, vec, q):
        c = polyops.part_shift(self.d, q)
        scaled = jfield.mont_mul(JFR, vec, self._part_pows(c))
        return jntt.ntt(self._plan, scaled)

    def coeff_to_part_stack(self, vecs, q):
        if not vecs:
            return []
        c = polyops.part_shift(self.d, q)
        pows = self._part_pows(c)

        def fn(stacked):
            b = jnp.broadcast_to(pows[:, None, :], stacked.shape)
            return jntt.ntt(self._plan, jfield.mont_mul(JFR, stacked, b))

        return self._stack_transform(vecs, fn)

    def parts_to_h_chunks(self, parts, qpd):
        d = self.d
        n, step = d.n, d.extended_n // d.n
        alpha_inv = inv_mod(pow(d.extended_omega, n, R), R)
        g_n_inv = inv_mod(pow(d.coset_shift, n, R), R)
        step_inv = inv_mod(step, R)
        us = []
        for q, part in enumerate(parts):
            u = self.lagrange_to_coeff(part)
            ci = inv_mod(polyops.part_shift(d, q), R)
            us.append(jfield.mont_mul(JFR, u, self._part_pows(ci)))
        U = jnp.stack(us)                                     # (step, n, 16)
        chunks = []
        for s in range(qpd):
            coefs = [pow(alpha_inv, q * s, R) * pow(g_n_inv, s, R)
                     * step_inv % R for q in range(step)]
            cenc = JFR.encode(coefs)[:, None, :]              # (step, 1, 16)
            prod = jfield.mont_mul(JFR, U, jnp.broadcast_to(cenc, U.shape))
            chunks.append(_tree_sum(JFR, prod))
        return chunks

    # lookup permutation
    def permute_lookup(self, ci_dev, ct_dev, usable):
        a_plain = JFR.from_mont(ci_dev)
        t_plain = JFR.from_mont(ct_dev)
        ap, sp, fail = _permute_lookup_dev(usable, a_plain, t_plain)
        if bool(fail):
            raise ValueError("lookup failure: input value not in table")
        return JFR.to_mont(ap), JFR.to_mont(sp)

    # evaluation & commitment
    def _powers(self, x, n):
        key = (x, n)
        if key not in self._pow_cache:
            pows = [1] * n
            for i in range(1, n):
                pows[i] = pows[i - 1] * x % R
            self._pow_cache[key] = JFR.encode(pows)
            if len(self._pow_cache) > 64:
                self._pow_cache.pop(next(iter(self._pow_cache)))
        return self._pow_cache[key]

    def eval_poly(self, coeffs, x):
        n = coeffs.shape[0]
        prod = jfield.mont_mul(JFR, coeffs, self._powers(x % R, n))
        while prod.shape[0] > 1:
            half = prod.shape[0] // 2
            prod = jfield.add(JFR, prod[:half], prod[half:2 * half]) if half * 2 == prod.shape[0] \
                else jnp.concatenate([jfield.add(JFR, prod[:half], prod[half:2 * half]), prod[2 * half:]], axis=0)
        return JFR.decode(prod)[0]

    def eval_polys(self, pairs):
        """Batched multi-point evaluation: groups the (poly, x) pairs by x,
        evaluates each group as ONE stacked mont_mul + tree-sum + decode
        (one device round-trip per distinct x instead of per query).
        Groups are chunked to a lane budget: an unchunked stack of ~500
        k=15 polys makes mont_mul intermediates alone exceed v5e HBM."""
        groups: dict[int, list[int]] = {}
        for i, (_, x) in enumerate(pairs):
            groups.setdefault(x % R, []).append(i)
        out = [None] * len(pairs)
        budget = 1 << 22          # rows (poly_count * n) per stacked pass
        chunked = []
        for x, idxs in groups.items():
            n = max(pairs[i][0].shape[0] for i in idxs)
            per = max(1, budget // n)
            chunked.extend((x, idxs[j:j + per])
                           for j in range(0, len(idxs), per))
        for x, idxs in chunked:
            polys = [pairs[i][0] for i in idxs]
            n = max(p.shape[0] for p in polys)
            stacked = jnp.stack([
                p if p.shape[0] == n else jnp.concatenate(
                    [p, jnp.zeros((n - p.shape[0], jfield.NLIMB),
                                  jnp.uint32)], axis=0)
                for p in polys])                          # (P, n, 16)
            pows = jnp.broadcast_to(self._powers(x, n), stacked.shape)
            prod = jfield.mont_mul(JFR, stacked, pows)
            while prod.shape[1] > 1:
                half = prod.shape[1] // 2
                head = jfield.add(JFR, prod[:, :half], prod[:, half:2 * half])
                prod = head if 2 * half == prod.shape[1] else \
                    jnp.concatenate([head, prod[:, 2 * half:]], axis=1)
            vals = JFR.decode(prod[:, 0])
            for i, v in zip(idxs, vals):
                out[i] = v
        return out

    def div_linear(self, vec, a):
        """vec(X) / (X - a) on device: out[i] = a^-(i+1) * suffix_sum(vec_j
        a^j)[i+1] — one suffix scan + two power-vector muls."""
        a %= R
        n = vec.shape[0]
        P = self._part_pows(a, n)
        IP = self._part_pows(inv_mod(a, R), n)
        t = jfield.mont_mul(JFR, vec, P)
        S = jfield.suffix_sum_mod(JFR, t)
        Sshift = jnp.concatenate(
            [S[1:], jnp.zeros((1, jfield.NLIMB), jnp.uint32)], axis=0)
        out = jfield.mont_mul(JFR, Sshift, IP)
        return self.scale(out, inv_mod(a, R))

    # vectors per stacked grand-product pass: bounds peak HBM (the scan's
    # mont_mul intermediates are ~3x the operand size; at k=15 with ~100
    # resident cosets an unchunked 38-vector pass ResourceExhausted's)
    gp_chunk = 8

    def grand_products(self, nums, dens):
        """Stacked inversion + vmapped scan, in bounded-memory chunks."""
        if not nums:
            return []
        out = []
        for i in range(0, len(nums), self.gp_chunk):
            ns, ds = nums[i:i + self.gp_chunk], dens[i:i + self.gp_chunk]
            count = len(ns)
            n = ns[0].shape[0]
            den_inv = jfield.batch_inv_scan(JFR, jnp.concatenate(ds, axis=0))
            ratios = jfield.mont_mul(JFR, jnp.stack(ns),
                                     den_inv.reshape(count, n, jfield.NLIMB))
            del den_inv
            prefixes = jax.vmap(lambda v: jfield._prefix_prod(JFR, v))(ratios)
            del ratios
            out.extend(prefixes[j] for j in range(count))
        return out

    def commit_lagrange_batch(self, vecs):
        return self._commit(self._msm_lagrange, vecs)

    def commit_batch(self, vecs):
        return self._commit(self._msm_coeff, vecs)

    def _commit(self, ctx: MSMContext, vecs):
        import os, sys, time
        verbose = os.environ.get("HALO2TPU_VERBOSE") == "1"
        t0 = time.time()
        out = []
        npad = ctx.points.shape[0]
        for i in range(0, len(vecs), self.msm_batch):
            if verbose and i:
                print(f"    msm {i}/{len(vecs)} t={time.time()-t0:.1f}s",
                      file=sys.stderr, flush=True)
            chunk = list(vecs[i:i + self.msm_batch])
            real = len(chunk)
            # pad the batch to a fixed size: the MSM step kernels compile
            # per (B, C) shape, so a ragged tail batch would recompile them
            while len(chunk) < self.msm_batch:
                chunk.append(jnp.zeros((npad, jfield.NLIMB), jnp.uint32))
            stacked = jnp.stack([
                jnp.concatenate([v, jnp.zeros((npad - v.shape[0], jfield.NLIMB),
                                              jnp.uint32)], axis=0)
                if v.shape[0] < npad else v for v in chunk])
            plain = JFR.from_mont(stacked)  # MSM wants plain scalar limbs
            out.extend(ctx.commit_limbs(plain)[:real])
        return out


def make_engine(kind: str, domain: Domain, srs):
    if kind == "host":
        return HostEngine(domain, srs)
    if kind == "jax":
        return JaxEngine(domain, srs)
    raise ValueError(f"unknown engine {kind}")
