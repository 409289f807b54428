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

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.bn254 import R, FR_DELTA, batch_inv as host_batch_inv, inv_mod
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

    def from_ints_stack(self, cols, reduced=False, bits=None,
                        blind_start=None):
        if reduced:
            return [list(c) for c in cols]
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

    def assemble_z_batch(self, prefs, heads, blind_start, blind_lists):
        """Batched assemble_z over aligned lists (one engine dispatch on
        the jnp path)."""
        return [self.assemble_z(p, h, blind_start, b)
                for p, h, b in zip(prefs, heads, blind_lists)]

    def set_rows_batch(self, vecs, start, ints_lists):
        return [self.set_rows(v, start, ints)
                for v, ints in zip(vecs, ints_lists)]

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

    @staticmethod
    def check_lookup_fails(fails):
        pass  # host path raises eagerly inside permute_lookup

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
        return a + [0] * (n - usable), s + [0] * (n - usable), None

    def permute_lookup_batch(self, comp_ins, comp_tbs, usable, max_bits):
        """Batch form: lists of compressed input/table vectors (+ per-lookup
        Lookup.max_bits, unused here).  Returns (a_list, s_list, fails)."""
        outs = [self.permute_lookup(ci, ct, usable)
                for ci, ct in zip(comp_ins, comp_tbs)]
        return ([o[0] for o in outs], [o[1] for o in outs],
                [o[2] for o in outs if o[2] is not None])

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

    def weighted_sum(self, vecs, coefs):
        out = [0] * len(vecs[0])
        for v, c in zip(vecs, coefs):
            c %= R
            for i, x in enumerate(v):
                out[i] = (out[i] + c * x) % R
        return out

    def perm_numden(self, cols, sigmas, omega_pows, beta, gamma, deltas):
        """One permutation chunk's grand-product numerator/denominator."""
        n = len(cols[0])
        num = self.const_vec(1, n)
        den = self.const_vec(1, n)
        for vals, sig, delta in zip(cols, sigmas, deltas):
            id_part = self.scale(omega_pows, beta * delta % R)
            num = self.mul(num, self.add_const(self.add(vals, id_part),
                                               gamma))
            den = self.mul(den, self.add_const(
                self.add(vals, self.scale(sig, beta)), gamma))
        return num, den

    def grand_products(self, nums, dens):
        """Per-vector prefix products of num/den ratios (permutation +
        lookup grand products batched into one inversion/scan pass)."""
        return [self.prefix_prod(self.mul(n_, self.batch_inv(d_)))
                for n_, d_ in zip(nums, dens)]

    def perm_numden_chunks(self, chunk_cols, chunk_sigmas, omega_pows,
                           beta, gamma, chunk_deltas):
        """All permutation chunks' grand-product numerators/denominators
        (one fused dispatch on the jnp path)."""
        nums, dens = [], []
        for cols, sigs, dls in zip(chunk_cols, chunk_sigmas, chunk_deltas):
            n_, d_ = self.perm_numden(cols, sigs, omega_pows, beta, gamma,
                                      dls)
            nums.append(n_)
            dens.append(d_)
        return nums, dens

    def sigma_from_mapping(self, mapping):
        """(ncols, n, 2) cell mapping -> engine sigma label columns
        (delta^j' * omega^i' per cell; see keygen.sigma_labels_host)."""
        from .keygen import sigma_labels_host
        return self.from_ints_stack(
            sigma_labels_host(np.asarray(mapping), mapping.shape[1]))

    def lookup_numden(self, comp_ins, comp_tbs, a_vecs, s_vecs, beta, gamma):
        """Per-lookup grand-product numerators (A+beta)(S+gamma) and
        denominators (a'+beta)(s'+gamma), batched."""
        nums = [self.mul(self.add_const(ci, beta), self.add_const(ct, gamma))
                for ci, ct in zip(comp_ins, comp_tbs)]
        dens = [self.mul(self.add_const(a, beta), self.add_const(s, gamma))
                for a, s in zip(a_vecs, s_vecs)]
        return nums, dens

    def commit_lagrange_batch(self, vecs, value_bits=None, blind_start=None):
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


# ---------------------------------------------------------------------------
# fused single-dispatch helpers.  The axon runtime serializes DEPENDENT
# dispatches at ~30 ms each once any device->host read has happened, so
# every log-depth scan / Horner chain / power-vector build must live inside
# ONE compiled program; across programs, only independent work pipelines.

@jax.jit
def _wsum_jit(stacked, coefs):
    """sum_i coefs[i] * stacked[i] over axis 0: (m, n, 16) x (m, 16)."""
    prod = jfield.mont_mul(JFR, stacked,
                           jnp.broadcast_to(coefs[:, None, :], stacked.shape))
    return _tree_sum(JFR, prod)


def _pow_block(a_enc, n):
    """In-graph [a^0 .. a^(n-1)] by doubling (n a power of two)."""
    out = jnp.broadcast_to(jnp.asarray(JFR.one_mont), (1, jfield.NLIMB))
    step = a_enc
    while out.shape[0] < n:
        scaled = jfield.mont_mul(JFR, out,
                                 jnp.broadcast_to(step[None], out.shape))
        out = jnp.concatenate([out, scaled], axis=0)
        step = jfield.mont_mul(JFR, step[None], step[None])[0]
    return out[:n]


@jax.jit
def _div_linear_jit(vec, a_enc, ainv_enc):
    """vec(X)/(X - a): power vectors built in-graph + one suffix scan,
    all one dispatch."""
    n = vec.shape[0]
    P = _pow_block(a_enc, n)
    IP = _pow_block(ainv_enc, n)
    t = jfield.mont_mul(JFR, vec, P)
    S = jfield.suffix_sum_mod(JFR, t)
    Sshift = jnp.concatenate(
        [S[1:], jnp.zeros((1, jfield.NLIMB), jnp.uint32)], axis=0)
    out = jfield.mont_mul(JFR, Sshift, IP)
    return jfield.mont_mul(JFR, out,
                           jnp.broadcast_to(ainv_enc, out.shape))


@jax.jit
def _gp_chunk_jit(nums, dens):
    """(m, n, 16) stacked grand-product numerators/denominators -> per-
    vector prefix products of num/den, one dispatch."""
    m, n = nums.shape[0], nums.shape[1]
    den_inv = jfield.batch_inv_scan(JFR, dens.reshape(m * n, jfield.NLIMB))
    ratios = jfield.mont_mul(JFR, nums,
                             den_inv.reshape(m, n, jfield.NLIMB))
    return jax.vmap(lambda v: jfield._prefix_prod(JFR, v))(ratios)


@partial(jax.jit, static_argnums=2)
def _assemble_z_batch_jit(prefs, heads, start, blinds):
    """prefs (m, n, 16); heads (m, 16) Montgomery; blinds (m, b, 16).
    z[j] = [head_j, head_j * pref_j[:-1]] with blind rows patched — ONE
    dispatch for every grand-product chunk."""
    hb = jnp.broadcast_to(heads[:, None, :], prefs.shape)
    scaled = jfield.mont_mul(JFR, prefs, hb)
    z = jnp.concatenate([heads[:, None, :], scaled[:, :-1]], axis=1)
    return jax.lax.dynamic_update_slice(z, blinds, (0, start, 0))


@partial(jax.jit, static_argnums=1)
def _set_rows_batch_jit(vecs, start, patches):
    return jax.lax.dynamic_update_slice(vecs, patches, (0, start, 0))


@jax.jit
def _gp_numden_all_jit(cols, sigmas, omega_pows, bds, beta, gamma):
    """Every permutation chunk's numerator/denominator in one dispatch.
    cols/sigmas (K, m, n, 16); bds (K, m, 16).  Chunks shorter than m are
    padded with zero col/sigma/bd lanes: both factors then equal gamma, so
    the num/den RATIO — all grand_products consumes — is unchanged."""
    K, m = cols.shape[0], cols.shape[1]
    shape = (K,) + cols.shape[2:]
    num = jnp.broadcast_to(jnp.asarray(JFR.one_mont), shape)
    den = jnp.broadcast_to(jnp.asarray(JFR.one_mont), shape)
    gb = jnp.broadcast_to(gamma, shape)
    bb = jnp.broadcast_to(beta, shape)
    wb = jnp.broadcast_to(omega_pows[None], shape)
    for j in range(m):
        idp = jfield.mont_mul(JFR, wb,
                              jnp.broadcast_to(bds[:, j, None, :], shape))
        num = jfield.mont_mul(JFR, num, jfield.add(
            JFR, jfield.add(JFR, cols[:, j], idp), gb))
        sg = jfield.mont_mul(JFR, sigmas[:, j], bb)
        den = jfield.mont_mul(JFR, den, jfield.add(
            JFR, jfield.add(JFR, cols[:, j], sg), gb))
    return num, den


@jax.jit
def _sigma_labels_jit(dpows, opows, mj):
    """(ncols', n, 2) int32 mapping chunk -> (ncols', n, 16) Montgomery
    sigma labels delta^j' * omega^i', via two gathers + one mont_mul."""
    d = jnp.take(dpows, mj[..., 0], axis=0)
    o = jnp.take(opows, mj[..., 1], axis=0)
    return jfield.mont_mul(JFR, d, o)


@jax.jit
def _lookup_numden_jit(cis, cts, avs, svs, beta, gamma):
    """(L, n, 16) stacks -> per-lookup product numerators/denominators,
    one dispatch."""
    bb = jnp.broadcast_to(beta, cis.shape)
    gb = jnp.broadcast_to(gamma, cis.shape)
    nums = jfield.mont_mul(JFR, jfield.add(JFR, cis, bb),
                           jfield.add(JFR, cts, gb))
    dens = jfield.mont_mul(JFR, jfield.add(JFR, avs, bb),
                           jfield.add(JFR, svs, gb))
    return nums, dens


@jax.jit
def _gp_numden_jit(cols, sigmas, omega_pows, bds, beta, gamma):
    """One permutation chunk's grand-product numerator & denominator:
    num = prod_j (col_j + beta*delta_j*omega_pows + gamma)
    den = prod_j (col_j + beta*sigma_j + gamma).  cols/sigmas (m, n, 16);
    bds (m, 16) = beta*delta_j; one dispatch per chunk."""
    m = cols.shape[0]
    shape = cols.shape[1:]
    num = jnp.broadcast_to(jnp.asarray(JFR.one_mont), shape)
    den = jnp.broadcast_to(jnp.asarray(JFR.one_mont), shape)
    gb = jnp.broadcast_to(gamma, shape)
    bb = jnp.broadcast_to(beta, shape)
    for j in range(m):
        idp = jfield.mont_mul(JFR, omega_pows,
                              jnp.broadcast_to(bds[j], shape))
        num = jfield.mont_mul(JFR, num, jfield.add(
            JFR, jfield.add(JFR, cols[j], idp), gb))
        sg = jfield.mont_mul(JFR, sigmas[j], bb)
        den = jfield.mont_mul(JFR, den, jfield.add(
            JFR, jfield.add(JFR, cols[j], sg), gb))
    return num, den


@jax.jit
def _eval_group_jit(stacked, pows):
    """(P, n, 16) polys x (n, 16) powers -> (P, 16) evaluations."""
    prod = jfield.mont_mul(JFR, stacked,
                           jnp.broadcast_to(pows[None], stacked.shape))
    while prod.shape[1] > 1:
        half = prod.shape[1] // 2
        head = jfield.add(JFR, prod[:, :half], prod[:, half:2 * half])
        prod = head if 2 * half == prod.shape[1] else \
            jnp.concatenate([head, prod[:, 2 * half:]], axis=1)
    return prod[:, 0]


_NW = NLIMB // 2      # packed key words per field element (2 limbs / u32)


def _pack_words(limbs):
    """(m, 16) 16-bit limbs -> (m, 8) packed u32 words, word 0 = MSW
    (lexicographic word order == numeric order)."""
    cols = [(limbs[:, NLIMB - 1 - 2 * j] << 16) | limbs[:, NLIMB - 2 - 2 * j]
            for j in range(_NW)]
    return jnp.stack(cols, axis=1)


def _unpack_words(words):
    """(m, 8) packed words -> (m, 16) limbs."""
    cols = []
    for i in range(NLIMB):
        j = (NLIMB - 1 - i) // 2
        w = words[:, j]
        cols.append((w >> 16) if i % 2 else (w & jnp.uint32(0xFFFF)))
    return jnp.stack(cols, axis=1)


def _permute_lookup_jit(u: int, a_plain, t_plain):
    """Device lookup permutation (halo2 permuted-pairs, SURVEY "sorting on
    TPU" hard part): returns (A' plain, S' plain, fail) with rows >= u
    zeroed.  A' = sorted inputs; S' = table permuted so every first
    occurrence in A' has S'[i] = A'[i], leftovers fill gaps in ascending
    value order (the host engine mirrors this rule, so proofs are
    engine-independent).

    Built ENTIRELY from bitonic sorts + elementwise ops: lax.sort with wide
    keys does not compile in workable time on this TPU stack, and
    data-dependent gathers degrade the runtime's dispatch pipelining — even
    the leftover->gap scatter is realized as a sort-based merge.  All-ones
    words are unreachable sentinels (real values < 2^254)."""
    from ..ops.sort import bitonic_sort_rows
    n = a_plain.shape[0]
    row = jnp.arange(n, dtype=jnp.uint32)
    pad = row >= u
    FFW = jnp.uint32(0xFFFFFFFF)
    aw = jnp.where(pad[:, None], FFW, _pack_words(a_plain))
    tw = jnp.where(pad[:, None], FFW, _pack_words(t_plain))

    # 1) A' = sort(A) (unique idx tie-break word)
    s1 = bitonic_sort_rows(jnp.concatenate([aw, row[:, None]], axis=1))
    apw = s1[:, :_NW]
    prev = jnp.concatenate([jnp.full((1, _NW), FFW, jnp.uint32), apw[:-1]], 0)
    first = ((row == 0) | jnp.any(apw != prev, axis=1)) & ~pad

    # 2) markers (distinct A' values) + table entries sorted by
    #    (value, flag): the table copy directly after a marker is consumed
    mark = jnp.where(first[:, None], apw, FFW)
    vals = jnp.concatenate([mark, tw], axis=0)
    flag = jnp.concatenate([jnp.zeros(n, jnp.uint32), jnp.ones(n, jnp.uint32)])
    row2 = jnp.arange(2 * n, dtype=jnp.uint32)
    s2 = bitonic_sort_rows(jnp.concatenate(
        [vals, flag[:, None], row2[:, None]], axis=1))
    svalw, sflag = s2[:, :_NW], s2[:, _NW]
    prev_flag = jnp.concatenate([jnp.ones(1, jnp.uint32), sflag[:-1]])
    prev_vals = jnp.concatenate(
        [jnp.full((1, _NW), FFW, jnp.uint32), svalw[:-1]], 0)
    eq_prev = jnp.all(svalw == prev_vals, axis=1)
    consumed = (sflag == 1) & (prev_flag == 0) & eq_prev
    is_ff = jnp.all(svalw == FFW, axis=1)
    nxt_flag = jnp.concatenate([sflag[1:], jnp.zeros(1, jnp.uint32)])
    nxt_vals = jnp.concatenate([svalw[1:], jnp.zeros((1, _NW), jnp.uint32)], 0)
    eq_next = jnp.all(svalw == nxt_vals, axis=1)
    fail = jnp.any((sflag == 0) & ~is_ff & ~((nxt_flag == 1) & eq_next))

    # 3) compact leftovers (unconsumed real table entries) to the front,
    #    preserving ascending value order via the sequence tie-break
    left = (sflag == 1) & ~consumed & ~is_ff
    ckey = jnp.where(left, jnp.uint32(0), jnp.uint32(1))
    s3 = bitonic_sort_rows(jnp.concatenate(
        [ckey[:, None], row2[:, None], svalw], axis=1))
    lvals = s3[:, 2:]                       # k-th row = k-th leftover value
    lreal = s3[:, 0] == 0

    # 4) gap positions in row order: sort (first?1:0, i); the k-th gap row
    #    pairs with the k-th leftover (counts match by construction)
    gkey = jnp.where(first | pad, jnp.uint32(1), jnp.uint32(0))
    s4 = bitonic_sort_rows(jnp.concatenate(
        [gkey[:, None], row[:, None]], axis=1))
    gap_pos = s4[:, 1]                      # valid where s4[:,0]==0
    is_gap = s4[:, 0] == 0

    # 5) S' assembly as a sort-based merge: candidate rows
    #    (target position, value) from gap/leftover pairs and from first
    #    rows; invalid rows keyed to the end; first n rows = S' by position
    cand_pos = jnp.concatenate(
        [jnp.where(is_gap, gap_pos, FFW), jnp.where(first, row, FFW)])
    cand_val = jnp.concatenate([lvals[:n], apw], axis=0)
    s5 = bitonic_sort_rows(jnp.concatenate(
        [cand_pos[:, None], cand_val], axis=1))
    spw = s5[:n, 1:]

    zero = jnp.zeros((), jnp.uint32)
    ap = jnp.where(pad[:, None], zero, _unpack_words(apw))
    sp = jnp.where(pad[:, None], zero, _unpack_words(spw))
    return ap, sp, fail


_permute_lookup_dev = jax.jit(_permute_lookup_jit, static_argnums=0)


# The narrow lookup path is a PIPELINE of five batched bitonic sorts with
# small jitted glue stages between them — deliberately NOT one fused jit:
# on the axon TPU stack, compiling the whole pipeline as one program
# produces wrong results for batch sizes >= 4 (verified: identical tiled
# inputs, batch 1-3 correct, batch 4+ consistently wrong; eager staging is
# correct at every batch size).  jax.vmap of the 2D sort miscompiles the
# same way — the batched sort threads its leading axis by hand.

@partial(jax.jit, static_argnums=(0, 3))
def _nl_pack(u: int, a_plain, t_plain, max_bits: int):
    n = a_plain.shape[1]
    L = a_plain.shape[0]
    row = jnp.arange(n, dtype=jnp.uint32)
    active = (row < u)[None, :]
    av = a_plain[:, :, 0] | (a_plain[:, :, 1] << 16)
    tv = t_plain[:, :, 0] | (t_plain[:, :, 1] << 16)
    hi_a = jnp.any(a_plain[:, :, 2:] != 0, axis=2)
    hi_t = jnp.any(t_plain[:, :, 2:] != 0, axis=2)
    lim = jnp.uint32(1 << max_bits)
    toowide = jnp.any(
        (active & (hi_a | hi_t | (av >= lim) | (tv >= lim))), axis=1)
    pad = row >= u
    FFW = jnp.uint32(0xFFFFFFFF)
    aw = jnp.where(pad[None], FFW, av)
    tw = jnp.where(pad[None], FFW, tv)
    rowb = jnp.broadcast_to(row, (L, n))
    return jnp.stack([aw, rowb], axis=2), tw, toowide


@partial(jax.jit, static_argnums=(0,))
def _nl_stage2(u: int, s1, tw):
    L, n = s1.shape[0], s1.shape[1]
    row = jnp.arange(n, dtype=jnp.uint32)
    pad = row >= u
    FFW = jnp.uint32(0xFFFFFFFF)
    apw = s1[:, :, 0]
    prev = jnp.concatenate(
        [jnp.full((L, 1), FFW, jnp.uint32), apw[:, :-1]], axis=1)
    first = ((row[None] == 0) | (apw != prev)) & ~pad[None]
    mark = jnp.where(first, apw, FFW)
    vals = jnp.concatenate([mark, tw], axis=1)
    flag = jnp.concatenate(
        [jnp.zeros(n, jnp.uint32), jnp.ones(n, jnp.uint32)])
    row2 = jnp.arange(2 * n, dtype=jnp.uint32)
    fr2 = jnp.broadcast_to((flag << 30) | row2, (L, 2 * n))
    return jnp.stack([vals, fr2], axis=2), apw, first


@jax.jit
def _nl_stage3(s2):
    L, n2 = s2.shape[0], s2.shape[1]
    FFW = jnp.uint32(0xFFFFFFFF)
    sval = s2[:, :, 0]
    sflag = s2[:, :, 1] >> 30
    prev_flag = jnp.concatenate(
        [jnp.ones((L, 1), jnp.uint32), sflag[:, :-1]], axis=1)
    prev_vals = jnp.concatenate(
        [jnp.full((L, 1), FFW, jnp.uint32), sval[:, :-1]], axis=1)
    consumed = (sflag == 1) & (prev_flag == 0) & (sval == prev_vals)
    is_ff = sval == FFW
    nxt_flag = jnp.concatenate(
        [sflag[:, 1:], jnp.zeros((L, 1), jnp.uint32)], axis=1)
    nxt_vals = jnp.concatenate(
        [sval[:, 1:], jnp.zeros((L, 1), jnp.uint32)], axis=1)
    fail = jnp.any(
        (sflag == 0) & ~is_ff & ~((nxt_flag == 1) & (sval == nxt_vals)),
        axis=1)
    left = (sflag == 1) & ~consumed & ~is_ff
    ckey = jnp.where(left, jnp.uint32(0), jnp.uint32(1))
    r2b = jnp.broadcast_to(jnp.arange(n2, dtype=jnp.uint32), (L, n2))
    return jnp.stack([(ckey << 31) | r2b, sval], axis=2), fail


@partial(jax.jit, static_argnums=(0,))
def _nl_stage4(u: int, first):
    L, n = first.shape
    row = jnp.arange(n, dtype=jnp.uint32)
    pad = row >= u
    rowb = jnp.broadcast_to(row, (L, n))
    gkey = jnp.where(first | pad[None], jnp.uint32(1), jnp.uint32(0))
    return ((gkey << 31) | rowb)[:, :, None]


@jax.jit
def _nl_stage5(s3, s4, first, apw):
    L, n = first.shape
    FFW = jnp.uint32(0xFFFFFFFF)
    row = jnp.arange(n, dtype=jnp.uint32)
    rowb = jnp.broadcast_to(row, (L, n))
    lvals = s3[:, :, 1]
    gap_pos = s4[:, :, 0] & jnp.uint32(0x7FFFFFFF)
    is_gap = (s4[:, :, 0] >> 31) == 0
    cand_pos = jnp.concatenate(
        [jnp.where(is_gap, gap_pos, FFW), jnp.where(first, rowb, FFW)],
        axis=1)
    cand_val = jnp.concatenate([lvals[:, :n], apw], axis=1)
    return jnp.stack([cand_pos, cand_val], axis=2)


@partial(jax.jit, static_argnums=(0, 3))
def _nl_finish(u: int, apw, s5, shape16):
    n = apw.shape[1]
    pad = (jnp.arange(n, dtype=jnp.uint32) >= u)[None]
    zero = jnp.uint32(0)
    ap = jnp.where(pad, zero, apw)
    sp = jnp.where(pad, zero, s5[:, :n, 1])
    nz = jnp.zeros(shape16, jnp.uint32)
    ap16 = nz.at[:, :, 0].set(ap & jnp.uint32(0xFFFF)).at[:, :, 1].set(
        ap >> 16)
    sp16 = nz.at[:, :, 0].set(sp & jnp.uint32(0xFFFF)).at[:, :, 1].set(
        sp >> 16)
    return ap16, sp16


def _permute_lookup_narrow_jit(u: int, a_plain, t_plain, max_bits: int):
    """Batched narrow lookup permutation: a_plain/t_plain (L, n, 16) plain
    limbs for L lookups, ALL bounded by 2^max_bits (max_bits <= 29).
    Returns (A' plain (L, n, 16), S' plain, fail (L,)) — fail also fires
    when a value exceeds the bound (such a witness cannot satisfy the
    lookup; the full-width path would report the same miss).  Staged, not
    fused — see the pipeline note above."""
    from ..ops.sort import bitonic_sort_rows_batched as bsort
    w1, tw, toowide = _nl_pack(u, a_plain, t_plain, max_bits)
    s1 = bsort(w1)
    w2, apw, first = _nl_stage2(u, s1, tw)
    s2 = bsort(w2)
    w3, fail = _nl_stage3(s2)
    s3 = bsort(w3)
    s4 = bsort(_nl_stage4(u, first))
    s5 = bsort(_nl_stage5(s3, s4, first, apw))
    ap16, sp16 = _nl_finish(u, apw, s5, tuple(a_plain.shape))
    return ap16, sp16, fail | toowide


_MSM_CTX_CACHE: dict = {}


def _shared_msm_ctx(srs, n: int, tag: str) -> MSMContext:
    key = (tag, n)
    if key not in _MSM_CTX_CACHE:
        _MSM_CTX_CACHE[key] = MSMContext(
            srs.g_lagrange[:n], cache_tag=f"lag{n}_{tag}")
    return _MSM_CTX_CACHE[key]


class JaxEngine:
    """TPU engine: vectors are (n, 16) uint32 Montgomery limb arrays."""

    name = "jax"
    jnp_backed = True
    # columns per batched-NTT pass: per-column cost on v5e is 25 ms
    # (C=1) / 2.2 ms (C=64) / 1.37 ms (C=128) — but C=128's transients
    # push the WIDE composite circuit (plus its quotient-part cache) into
    # allocator thrash (warm proof 33 s -> 42 s measured), so 64 it is
    stack_chunk = 64

    def __init__(self, domain: Domain, srs, msm_batch: int = 8):
        self.d = domain
        self.srs = srs
        self.msm_batch = msm_batch
        d = domain
        self._plan = jntt.get_plan(d.n, d.omega)
        # ONE MSM context: coefficient-basis commitments route through the
        # Lagrange bases as commit_G(coeffs) == commit_Glag(NTT(coeffs))
        # (same polynomial, change of basis) — the second 256-entry window
        # table would cost another ~0.8 GB HBM and ~220 s cold build for a
        # handful of h-chunk/random-poly commits per proof.  Contexts are
        # shared PROCESS-WIDE by (srs, n): engines are per-domain-degree
        # (the extended/coset math bakes in quotient_poly_degree), but the
        # ~0.8 GB window table is degree-independent.
        self._msm_lagrange = _shared_msm_ctx(srs, d.n, self._srs_tag(srs))
        self._pow_cache = {}
        self._scalar_cache = {}
        self._part_scale_cache = {}

    # representation
    def from_ints(self, vals):
        return JFR.encode(vals)

    def from_ints_stack(self, cols, reduced=False, bits=None,
                        blind_start=None):
        """Many equal-length int columns -> list of (n, 16) vectors via ONE
        packed transfer + one widen/to-mont pass.  reduced=True skips the
        per-value mod (caller guarantees 0 <= v < R — e.g. synthesis
        output, whose assignment paths already reduce).

        bits/blind_start: per-column static value bounds (pre-blinding).
        Columns with bits <= 16 ride a 1/16-width u16 wire (the axon
        tunnel is transfer-bound) with their full-width blinding tail
        patched separately."""
        if not cols:
            return []
        out = [None] * len(cols)
        narrow = [i for i, b in enumerate(bits or [])
                  if b is not None and b <= 16] if blind_start else []
        rest = [i for i in range(len(cols)) if i not in set(narrow)]
        if narrow:
            n = len(cols[narrow[0]])
            main = np.zeros((len(narrow), n), "<u2")
            tails = []
            for j, i in enumerate(narrow):
                main[j, :blind_start] = cols[i][:blind_start]
                tails.append(jfield.ints_to_limbs16(cols[i][blind_start:]))
            enc = JFR.encode_narrow_stack(main, np.stack(tails), blind_start)
            for j, i in enumerate(narrow):
                out[i] = enc[j]
        if rest:
            u16 = np.stack([jfield.ints_to_limbs16(
                cols[i] if reduced else [v % R for v in cols[i]])
                for i in rest])
            stacked = JFR.encode_packed(u16)
            for j, i in enumerate(rest):
                out[i] = stacked[j]
        return out

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

    def assemble_z_batch(self, prefs, heads, blind_start, blind_lists):
        if not prefs:
            return []
        heads_e = JFR.encode([h % R for h in heads])
        blinds = JFR.encode([v % R for b in blind_lists for v in b]).reshape(
            len(prefs), -1, jfield.NLIMB)
        zs = _assemble_z_batch_jit(jnp.stack(prefs), heads_e, blind_start,
                                   blinds)
        return [zs[i] for i in range(len(prefs))]

    def set_rows_batch(self, vecs, start, ints_lists):
        if not vecs:
            return []
        patches = JFR.encode(
            [v % R for ints in ints_lists for v in ints]).reshape(
            len(vecs), -1, jfield.NLIMB)
        out = _set_rows_batch_jit(jnp.stack(vecs), start, patches)
        return [out[i] for i in range(len(vecs))]

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
            chunks.append(_wsum_jit(U, JFR.encode(coefs)))
        return chunks

    # lookup permutation
    def permute_lookup(self, ci_dev, ct_dev, usable):
        """Returns (A', S', fail) with fail a DEVICE bool: the caller
        batches all lookups' failure flags into one read (each sync costs
        a tunnel round-trip)."""
        a_plain = JFR.from_mont(ci_dev)
        t_plain = JFR.from_mont(ct_dev)
        ap, sp, fail = _permute_lookup_dev(usable, a_plain, t_plain)
        return JFR.to_mont(ap), JFR.to_mont(sp), fail

    def permute_lookup_batch(self, comp_ins, comp_tbs, usable, max_bits):
        """All lookups in (at most) TWO fused dispatches: the narrow group
        (static Lookup.max_bits <= 29, e.g. every range lookup) runs the
        vmapped single-word sort network; the rest take the full-width
        path.  ~5x fewer sort-compare words for range-heavy circuits AND
        one dispatch instead of one per lookup (~30 ms tunnel latency
        each)."""
        L = len(comp_ins)
        a_out, s_out = [None] * L, [None] * L
        fails = []
        narrow = [i for i in range(L)
                  if max_bits[i] is not None and max_bits[i] <= 29]
        wide = [i for i in range(L) if i not in narrow]
        if narrow:
            mb = max(max_bits[i] for i in narrow)
            ap = jnp.stack([JFR.from_mont(comp_ins[i]) for i in narrow])
            tp = jnp.stack([JFR.from_mont(comp_tbs[i]) for i in narrow])
            a16, s16, fail = _permute_lookup_narrow_jit(usable, ap, tp, mb)
            for j, i in enumerate(narrow):
                a_out[i] = JFR.to_mont(a16[j])
                s_out[i] = JFR.to_mont(s16[j])
            fails.append(fail)
        for i in wide:
            a_out[i], s_out[i], f = self.permute_lookup(
                comp_ins[i], comp_tbs[i], usable)
            fails.append(f)
        return a_out, s_out, fails

    @staticmethod
    def check_lookup_fails(fails):
        if fails and bool(jnp.any(jnp.concatenate(
                [jnp.atleast_1d(f) for f in fails]))):
            raise ValueError("lookup failure: input value not in table")

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
        results = []   # (group device sums, idxs) — ONE decode at the end
        for x, idxs in chunked:
            polys = [pairs[i][0] for i in idxs]
            n = max(p.shape[0] for p in polys)
            stacked = jnp.stack([
                p if p.shape[0] == n else jnp.concatenate(
                    [p, jnp.zeros((n - p.shape[0], jfield.NLIMB),
                                  jnp.uint32)], axis=0)
                for p in polys])                          # (P, n, 16)
            results.append((_eval_group_jit(stacked, self._powers(x, n)),
                            idxs))
        all_vals = JFR.decode(jnp.concatenate([r[0] for r in results], axis=0))
        vi = 0
        for _, idxs in results:
            for i in idxs:
                out[i] = all_vals[vi]
                vi += 1
        return out

    def div_linear(self, vec, a):
        """vec(X) / (X - a): one fused dispatch (power vectors + suffix
        scan in-graph)."""
        a %= R
        return _div_linear_jit(vec, self._enc_scalar(a),
                               self._enc_scalar(inv_mod(a, R)))

    def weighted_sum(self, vecs, coefs):
        """sum_i coefs[i] * vecs[i] — the workhorse for every Horner-style
        fold (y-fold, theta-compress, zeta-combine): weights are absorbed
        host-side so the device work is chunked independent weighted
        reductions instead of an RTT-serialized dependency chain."""
        assert len(vecs) == len(coefs) and vecs
        parts = []
        for i in range(0, len(vecs), 64):
            chunk = vecs[i:i + 64]
            cenc = JFR.encode([c % R for c in coefs[i:i + 64]])
            parts.append(_wsum_jit(jnp.stack(chunk), cenc))
        acc = parts[0]
        for p in parts[1:]:
            acc = jfield.add(JFR, acc, p)
        return acc

    # vectors per stacked grand-product pass: bounds peak HBM (the scan's
    # mont_mul intermediates are ~3x the operand size; at k=15 with ~100
    # resident cosets an unchunked 38-vector pass ResourceExhausted's)
    gp_chunk = 8

    def grand_products(self, nums, dens):
        """One fused dispatch per bounded-memory chunk (inversion + scans
        in-graph)."""
        if not nums:
            return []
        out = []
        for i in range(0, len(nums), self.gp_chunk):
            ns, ds = nums[i:i + self.gp_chunk], dens[i:i + self.gp_chunk]
            prefixes = _gp_chunk_jit(jnp.stack(ns), jnp.stack(ds))
            out.extend(prefixes[j] for j in range(len(ns)))
        return out

    def perm_numden(self, cols, sigmas, omega_pows, beta, gamma, deltas):
        """One fused dispatch per permutation chunk."""
        bds = jnp.stack([self._enc_scalar(beta * dl % R) for dl in deltas])
        return _gp_numden_jit(jnp.stack(cols), jnp.stack(sigmas), omega_pows,
                              bds, self._enc_scalar(beta),
                              self._enc_scalar(gamma))

    # chunks per fused numden pass: bounds the (K, m, n, 16) operand
    # transients (~100 MB at K=16, m=4, k=15)
    numden_chunk = 16

    def perm_numden_chunks(self, chunk_cols, chunk_sigmas, omega_pows,
                           beta, gamma, chunk_deltas):
        """ALL permutation chunks' num/den in ceil(K/16) dispatches instead
        of one per chunk (dependent dispatches cost ~30 ms tunnel latency
        each).  Short chunks are padded with zero col/sigma/bd lanes — see
        _gp_numden_all_jit for why that preserves the ratio."""
        if not chunk_cols:
            return [], []
        n = chunk_cols[0][0].shape[0]
        m = max(len(c) for c in chunk_cols)
        zero_vec = jnp.zeros((n, jfield.NLIMB), jnp.uint32)
        zero_s = jnp.zeros((jfield.NLIMB,), jnp.uint32)
        be, ge = self._enc_scalar(beta), self._enc_scalar(gamma)
        nums, dens = [], []
        for i in range(0, len(chunk_cols), self.numden_chunk):
            cc = chunk_cols[i:i + self.numden_chunk]
            cs = chunk_sigmas[i:i + self.numden_chunk]
            cd = chunk_deltas[i:i + self.numden_chunk]
            cols = jnp.stack([jnp.stack(list(c) + [zero_vec] * (m - len(c)))
                              for c in cc])
            sigs = jnp.stack([jnp.stack(list(s) + [zero_vec] * (m - len(s)))
                              for s in cs])
            bds = jnp.stack([jnp.stack(
                [self._enc_scalar(beta * dl % R) for dl in d]
                + [zero_s] * (m - len(d))) for d in cd])
            num, den = _gp_numden_all_jit(cols, sigs, omega_pows, bds, be, ge)
            nums.extend(num[j] for j in range(len(cc)))
            dens.extend(den[j] for j in range(len(cc)))
        return nums, dens

    def lookup_numden(self, comp_ins, comp_tbs, a_vecs, s_vecs, beta, gamma):
        if not comp_ins:
            return [], []
        nums, dens = _lookup_numden_jit(
            jnp.stack(comp_ins), jnp.stack(comp_tbs), jnp.stack(a_vecs),
            jnp.stack(s_vecs), self._enc_scalar(beta),
            self._enc_scalar(gamma))
        return ([nums[i] for i in range(len(comp_ins))],
                [dens[i] for i in range(len(comp_ins))])

    def sigma_from_mapping(self, mapping):
        """Device sigma materialization: chunked gathers from the
        delta-power / omega-power tables + one mont_mul — replaces ~ncols*n
        host big-int products (the wide-circuit keygen bottleneck)."""
        mapping = np.asarray(mapping)
        ncols, n = mapping.shape[0], mapping.shape[1]
        deltas = [1] * max(ncols, 1)
        for j in range(1, ncols):
            deltas[j] = deltas[j - 1] * FR_DELTA % R
        dpows = JFR.encode(deltas)
        omega_pows = [1] * n
        for i in range(1, n):
            omega_pows[i] = omega_pows[i - 1] * self.d.omega % R
        opows = JFR.encode(omega_pows)
        out = []
        for i in range(0, ncols, self.stack_chunk):
            mj = jnp.asarray(mapping[i:i + self.stack_chunk])
            labels = _sigma_labels_jit(dpows, opows, mj)
            out.extend(labels[j] for j in range(mj.shape[0]))
        return out

    def commit_lagrange_batch(self, vecs, value_bits=None, blind_start=None):
        """value_bits[i]: static bound (bit length) of vec i's values on
        rows [0, blind_start) — columns of bits/bytes/lookup limbs fold
        only their live digit planes (ops/msm.py planes arg), with the
        full-width blinding tail folded separately over the last base
        chunk.  None entries (or no blind_start) take the full fold."""
        if self._host_commit():
            return [self.srs.commit_lagrange(self.to_ints(v)) for v in vecs]
        return self._commit(self._msm_lagrange, vecs, value_bits,
                            blind_start)

    def commit_batch(self, vecs):
        if self._host_commit():
            return [self.srs.commit(self.to_ints(v)) for v in vecs]
        n = self.d.n
        evals = self.coeff_to_lagrange_stack(
            [jnp.concatenate(
                [v, jnp.zeros((n - v.shape[0], jfield.NLIMB), jnp.uint32)],
                axis=0) if v.shape[0] < n else v for v in vecs])
        return self._commit(self._msm_lagrange, evals)

    def coeff_to_lagrange_stack(self, vecs):
        if not vecs:
            return []
        return self._stack_transform(vecs, lambda s: jntt.ntt(self._plan, s))

    @staticmethod
    def _host_commit() -> bool:
        """On the XLA:CPU backend, commit host-side: compiling the traced
        EC-fold programs takes tens of minutes of XLA:CPU optimization
        passes per shape, and commitment points are exact EC points —
        engine-independent, so proof bytes are unchanged.  The device fold
        paths keep their own dedicated parity tests (test_jax_kernels,
        test_pallas_ec) and run for real on TPU.  Override with
        HALO2TPU_DEVICE_MSM_ON_CPU=1."""
        import os
        return (jax.default_backend() == "cpu"
                and os.environ.get("HALO2TPU_DEVICE_MSM_ON_CPU") != "1")

    # narrow-bucket plane count: scalars < 2^(8*_NARROW_PLANES).  One extra
    # compiled _partials_fused variant; covers every bit/byte/word/lookup
    # column (the flexgate inner-product accumulators are full-width).
    _NARROW_PLANES = 8

    @staticmethod
    def _srs_tag(srs) -> str:
        """Content tag for on-disk artifacts derived from the SRS."""
        import hashlib
        g0 = srs.g_lagrange[0]
        g1 = srs.g_lagrange[-1]
        return hashlib.sha256(repr((len(srs.g_lagrange), g0, g1)).encode()
                              ).hexdigest()[:12]

    def _stack_batch(self, vecs, npad):
        chunk = list(vecs)
        # pad the batch to a fixed size: the MSM step kernels compile
        # per (B, C) shape, so a ragged tail batch would recompile them
        while len(chunk) < self.msm_batch:
            chunk.append(jnp.zeros((npad, jfield.NLIMB), jnp.uint32))
        return jnp.stack([
            jnp.concatenate([v, jnp.zeros((npad - v.shape[0], jfield.NLIMB),
                                          jnp.uint32)], axis=0)
            if v.shape[0] < npad else v for v in chunk])

    def _tail_ctx(self, c0: int) -> MSMContext:
        """MSM context over the last (n - c0) Lagrange bases — the
        full-width fold for blinding-tail rows of narrow columns.
        Process-wide cache (same rationale as _shared_msm_ctx)."""
        key = (self._srs_tag(self.srs), "tail", c0, self.d.n)
        if key not in _MSM_CTX_CACHE:
            _MSM_CTX_CACHE[key] = MSMContext(
                self.srs.g_lagrange[c0:self.d.n])
        return _MSM_CTX_CACHE[key]

    def _commit(self, ctx: MSMContext, vecs, value_bits=None,
                blind_start=None):
        """Batched commitment: every msm_batch-sized chunk folds to device
        partial sums; the whole phase converts to host points with ONE
        device read (sync points cost a ~30 ms tunnel round-trip each).

        Columns with a static value bound (value_bits) split into a
        narrow-plane main fold over rows [0, c0) plus a full-width tail
        fold over [c0, n) (blinding rows are full field elements); the two
        partial points add host-side."""
        from ..curves import g1 as G1
        from ..ops.msm import NUM_WINDOWS, _use_pallas
        npad = ctx.points.shape[0]
        P = self._NARROW_PLANES
        n_idx, f_idx = [], []
        for i in range(len(vecs)):
            b = value_bits[i] if value_bits is not None else None
            narrow = (b is not None and b <= 8 * P - 1
                      and blind_start is not None and _use_pallas()
                      and npad == self.d.n)
            (n_idx if narrow else f_idx).append(i)
        parts, groups = [], []   # aligned: partials (B,32,3,16) + idx lists
        for i in range(0, len(f_idx), self.msm_batch):
            grp = f_idx[i:i + self.msm_batch]
            plain = JFR.from_mont(self._stack_batch([vecs[j] for j in grp],
                                                    npad))
            parts.append(ctx.partials(plain))
            groups.append([("main", j) for j in grp])
        if n_idx:
            c0 = (blind_start // 256) * 256
            tctx = self._tail_ctx(c0)
            for i in range(0, len(n_idx), self.msm_batch):
                grp = n_idx[i:i + self.msm_batch]
                plain = JFR.from_mont(self._stack_batch(
                    [vecs[j] for j in grp], npad))
                main = jax.lax.dynamic_update_slice(
                    plain, jnp.zeros((plain.shape[0], npad - c0,
                                      jfield.NLIMB), jnp.uint32), (0, c0, 0))
                mp = ctx.partials(main, planes=P)
                parts.append(jnp.pad(
                    mp, ((0, 0), (0, NUM_WINDOWS - P), (0, 0), (0, 0))))
                groups.append([("main", j) for j in grp])
                parts.append(tctx.partials(plain[:, c0:]))
                groups.append([("tail", j) for j in grp])
        if not parts:
            return []
        host_pts = ctx.finalize(parts)
        out = [None] * len(vecs)
        tails = {}
        pi = 0
        for grp in groups:
            for kind, j in grp:
                (out if kind == "main" else tails)[j] = host_pts[pi]
                pi += 1
            pi += self.msm_batch - len(grp)   # batch padding entries
        for j, tp in tails.items():
            a, b = out[j], tp
            if a is None:
                out[j] = b
            elif b is not None:
                out[j] = G1.add(a, b)
        return out


def make_engine(kind: str, domain: Domain, srs):
    if kind == "host":
        return HostEngine(domain, srs)
    if kind == "jax":
        return JaxEngine(domain, srs)
    raise ValueError(f"unknown engine {kind}")
