"""Polynomial-arithmetic engines for the prover.

The prover pipeline (prover.py) is engine-generic: every hot operation —
NTTs, coset evaluation, expression folding, grand-product scans, batch
inversion, MSM commitments — goes through one of these engines, with field
vectors held in an engine-owned representation:

  HostEngine: python-int lists (golden reference; fine for k <= 8)
  JaxEngine:  (n, 16)-limb Montgomery device arrays; NTT/MSM on TPU
              (ops/ntt.py, ops/msm.py), elementwise ops fused by XLA

The engines are transcript-compatible: both produce identical proof bytes
for the same witness + rng seed (tested in tests/test_jax_kernels.py,
test_jax_engine_proof_byte_parity).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.bn254 import R, batch_inv as host_batch_inv, inv_mod
from ..fields import jfield
from ..fields.jfield import FR as JFR
from ..ops import ntt as jntt
from ..ops.msm import MSMContext
from .domain import Domain
from . import polyops


class HostEngine:
    """Python-int engine (golden reference)."""

    name = "host"

    def __init__(self, domain: Domain, srs):
        self.d = domain
        self.srs = srs

    # representation
    def from_ints(self, vals):
        return [v % R for v in vals]

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

    def load_poly(self, p):
        """Accept a pk-stored polynomial: python-int list, or (n, 16)
        Montgomery-limb numpy array (written by a JaxEngine keygen)."""
        if isinstance(p, np.ndarray) and p.dtype == np.uint32:
            return JFR.decode(jnp.asarray(p))
        return p

    def store_poly(self, vec):
        return list(vec)

    # transforms
    def lagrange_to_coeff(self, vec):
        return polyops.intt(vec, self.d.omega)

    def coeff_to_lagrange(self, vec):
        return polyops.ntt(vec, self.d.omega)

    def coeff_to_extended_coset(self, vec):
        return polyops.coeff_to_extended_coset(vec, self.d)

    def extended_coset_to_coeff(self, vec):
        return polyops.extended_coset_to_coeff(vec, self.d)

    # evaluation & commitment
    def eval_poly(self, coeffs, x):
        return polyops.eval_poly(coeffs, x)

    def eval_polys(self, pairs):
        """[(poly, x), ...] -> list of evaluations (python ints), same
        order.  The prover's eval phase batches through this."""
        return [self.eval_poly(p, x) for p, x in pairs]

    def grand_products(self, nums, dens):
        """Per-vector prefix products of num/den ratios (permutation +
        lookup grand products batched into one inversion/scan pass)."""
        return [self.prefix_prod(self.mul(n_, self.batch_inv(d_)))
                for n_, d_ in zip(nums, dens)]

    def commit_lagrange_batch(self, vecs):
        return [self.srs.commit_lagrange(v) for v in vecs]

    def commit_batch(self, vecs):
        return [self.srs.commit(v) for v in vecs]


class JaxEngine:
    """TPU engine: vectors are (n, 16) uint32 Montgomery limb arrays."""

    name = "jax"

    def __init__(self, domain: Domain, srs, msm_batch: int = 8):
        self.d = domain
        self.srs = srs
        self.msm_batch = msm_batch
        d = domain
        self._plan = jntt.get_plan(d.n, d.omega)
        self._plan_ext = jntt.get_plan(d.extended_n, d.extended_omega)
        # coset scale vectors g^i (and inverses), Montgomery form
        g = d.coset_shift
        gp, gi = [1] * d.extended_n, [1] * d.extended_n
        ginv = inv_mod(g, R)
        for i in range(1, d.extended_n):
            gp[i] = gp[i - 1] * g % R
            gi[i] = gi[i - 1] * ginv % R
        self._coset_scale = JFR.encode(gp)
        self._coset_unscale = JFR.encode(gi)
        self._msm_lagrange = MSMContext(srs.g_lagrange[:d.n])
        self._msm_coeff = MSMContext(srs.g[:d.n])
        self._pow_cache = {}

    # representation
    def from_ints(self, vals):
        return JFR.encode(vals)

    def to_ints(self, vec):
        return JFR.decode(vec)

    def const_vec(self, c, n):
        enc = JFR.encode([c % R])[0]
        return jnp.broadcast_to(enc, (n, jfield.NLIMB))

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

    # transforms
    def lagrange_to_coeff(self, vec):
        return jntt.intt(self._plan, vec)

    def coeff_to_lagrange(self, vec):
        return jntt.ntt(self._plan, vec)

    def coeff_to_extended_coset(self, vec):
        n, en = self.d.n, self.d.extended_n
        padded = jnp.concatenate(
            [vec, jnp.zeros((en - vec.shape[0], jfield.NLIMB), jnp.uint32)], axis=0)
        scaled = jfield.mont_mul(JFR, padded, self._coset_scale)
        return jntt.ntt(self._plan_ext, scaled)

    def extended_coset_to_coeff(self, vec):
        coeffs = jntt.intt(self._plan_ext, vec)
        return jfield.mont_mul(JFR, coeffs, self._coset_unscale)

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
        # tree-sum
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
