"""Mesh-sharded prover engine: the full create_proof pipeline under a
jax.sharding.Mesh.

The reference parallelizes its prover with rayon shared-memory threads
(halo2_proofs `multicore`; SURVEY §5.8/N15).  The TPU-native replacement is
SPMD over a device mesh: ShardedJaxEngine extends JaxEngine so that field
vectors remain flat (n, 16) uint32 Montgomery limb arrays but live
row-sharded across the mesh, and every prover phase — advice NTTs, lookup
compression, grand products, quotient folding, evaluations, SHPLONK —
executes as GSPMD-partitioned XLA with ICI collectives:

  * NTTs run as the Bailey four-step decomposition (parallel/ntt.py
    convention): chip-local column NTTs, one twiddle scale, an all-to-all
    reshard over ICI, chip-local row NTTs — wrapped here to consume and
    produce flat natural-order vectors so the engine interface (and hence
    the proof bytes) match the single-chip JaxEngine exactly.
  * MSM commitments shard the fold-lane axis (parallel/msm.py): every row
    fold is communication-free across lanes; GSPMD inserts collective
    permutes only for the log2(C) tail folds that cross shard boundaries.
  * Elementwise ops, Hillis-Steele grand-product scans and batch inversion
    are inherited unchanged — GSPMD partitions the same kernels across
    whatever sharding the operands carry.

Exact integer math throughout, so a sharded proof is byte-identical to the
single-device (and host-engine) proof for the same witness + rng seed —
tested in tests/test_sharded_proof.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.bn254 import R, inv_mod
from ..fields import jfield
from ..fields.jfield import FR as JFR, NLIMB, ints_to_limbs, mont_mul
from ..ops import ntt as jntt
from ..ops.msm import _bit_partials, _partials_to_affine
from ..parallel.ntt import twiddle_matrix
from .domain import Domain
from .engine import JaxEngine


def _pick_split(n: int, ndev: int) -> tuple[int, int]:
    """n = n1 * n2, both powers of two divisible by ndev, n1 ~ sqrt(n).
    n1 carries the output (k1) shard, n2 the input (j2) shard."""
    logn = n.bit_length() - 1
    logd = ndev.bit_length() - 1
    assert 1 << logd == ndev, "mesh size must be a power of two"
    assert logn >= 2 * logd, f"n=2^{logn} too small for {ndev}-device four-step"
    l1 = min(max(logn // 2, logd), logn - logd)
    return 1 << l1, 1 << (logn - l1)


class _FlatFourStep:
    """Four-step NTT over flat natural-order (n, 16) vectors, as an
    explicit shard_map SPMD program (manual collectives, chip-local
    radix-2 NTTs) — NOT GSPMD sharding constraints: letting GSPMD
    partition the gather-based butterfly loop is the round-1
    compile-time blowup all over again.

    Identical math to the single-chip radix-2 plan (ops/ntt.py): the
    decomposition only reorders the butterflies, so outputs are bit-exact.
    `scale` multiplies the result by a constant (1/n for the inverse).

    Layout walk (D = mesh size, input/output flat natural row-sharded):
      x (n/D, 16) block = j1-slice of the (n1, n2) matrix
      -> all_to_all: (n1, n2/D)    column NTT over j1 (local)
      -> twiddle w^(k1*j2)         (local block of the twiddle matrix)
      -> all_to_all: (n1/D, n2)    row NTT over j2 (local)
      -> all_to_all: (n2/D, n1)    flat natural k = k2*n1 + k1 block
    """

    def __init__(self, mesh: Mesh, axis: str, n: int, omega: int,
                 scale: int | None = None):
        ndev = mesh.devices.size
        n1, n2 = _pick_split(n, ndev)
        plan1 = jntt.get_plan(n1, pow(omega, n2, R))
        plan2 = jntt.get_plan(n2, pow(omega, n1, R))
        col = NamedSharding(mesh, P(None, axis, None))   # j2-sharded
        self._tw = jax.device_put(jnp.asarray(twiddle_matrix(n1, n2, omega)),
                                  col)
        post = (None if scale is None else
                jnp.asarray(ints_to_limbs([scale * JFR.r % R])[0]))

        def local(tw_local, x_local):
            # x_local: (n/D, 16) = rows j1 in [d*n1/D, (d+1)*n1/D), all j2
            xm = x_local.reshape(n1 // ndev, n2, NLIMB)
            xm = jax.lax.all_to_all(xm, axis, split_axis=1, concat_axis=0,
                                    tiled=True)          # (n1, n2/D, 16)
            a1 = jntt.ntt(plan1, xm)                     # [k1, j2-slice]
            a2 = mont_mul(JFR, a1, tw_local)             # * w^(k1*j2)
            a3 = jax.lax.all_to_all(a2, axis, split_axis=0, concat_axis=1,
                                    tiled=True)          # (n1/D, n2, 16)
            a5 = jntt.ntt(plan2, jnp.swapaxes(a3, 0, 1))  # (n2, n1/D, 16)
            a6 = jax.lax.all_to_all(a5, axis, split_axis=0, concat_axis=1,
                                    tiled=True)          # (n2/D, n1, 16)
            out = a6.reshape(n // ndev, NLIMB)           # k = k2*n1 + k1
            if post is not None:
                out = mont_mul(JFR, out, post)
            return out

        self._run = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, axis, None), P(axis, None)),
            out_specs=P(axis, None)))

    def __call__(self, x):
        return self._run(self._tw, x)


class ShardedJaxEngine(JaxEngine):
    """JaxEngine with every vector row-sharded over a 1D mesh axis."""

    name = "sharded"

    def __init__(self, domain: Domain, srs, mesh: Mesh, axis: str = "shard",
                 msm_batch: int = 8):
        super().__init__(domain, srs, msm_batch)
        self.mesh = mesh
        self.axis = axis
        ndev = mesh.devices.size
        self._ndev = ndev
        self._row_sh = NamedSharding(mesh, P(axis, None))
        d = domain
        self._fwd_n = _FlatFourStep(mesh, axis, d.n, d.omega)
        self._inv_n = _FlatFourStep(mesh, axis, d.n, inv_mod(d.omega, R),
                                    scale=inv_mod(d.n, R))
        self._fwd_ext = _FlatFourStep(mesh, axis, d.extended_n,
                                      d.extended_omega)
        self._inv_ext = _FlatFourStep(mesh, axis, d.extended_n,
                                      inv_mod(d.extended_omega, R),
                                      scale=inv_mod(d.extended_n, R))
        # MSM fold-lane shardings (parallel/msm.py layout)
        self._msm_shardings = (
            NamedSharding(mesh, P(None, None, axis, None, None)),  # acc
            NamedSharding(mesh, P(None, axis, None, None)),        # points
            NamedSharding(mesh, P(None, None, axis, None)),        # scalars
        )

    # representation ---------------------------------------------------
    def from_ints(self, vals):
        return jax.device_put(super().from_ints(vals), self._row_sh)

    def from_ints_stack(self, cols, reduced=False, bits=None,
                        blind_start=None):
        return [self.from_ints(c) for c in cols]

    def permute_lookup_batch(self, comp_ins, comp_tbs, usable, max_bits):
        """Sharded path keeps the per-lookup full-width sort (the narrow
        vmapped network would force a resharding round-trip per stack)."""
        outs = [self.permute_lookup(ci, ct, usable)
                for ci, ct in zip(comp_ins, comp_tbs)]
        return ([o[0] for o in outs], [o[1] for o in outs],
                [o[2] for o in outs if o[2] is not None])

    def from_packed(self, u16_arr):
        return jax.device_put(super().from_packed(u16_arr), self._row_sh)

    def from_packed_stack(self, arrs):
        return [self.from_packed(a) for a in arrs]

    # transforms --------------------------------------------------------
    def lagrange_to_coeff(self, vec):
        return self._inv_n(vec)

    def lagrange_to_coeff_stack(self, vecs):
        return [self._inv_n(v) for v in vecs]

    def coeff_to_lagrange(self, vec):
        return self._fwd_n(vec)

    def coeff_to_lagrange_stack(self, vecs):
        # commit_batch's coeff->eval change of basis, through the sharded
        # four-step NTT (the base-class stack transform would gather the
        # row-sharded vectors onto one device)
        return [self._fwd_n(v) for v in vecs]

    def coeff_to_extended_coset(self, vec):
        en = self.d.extended_n
        padded = jnp.zeros((en, NLIMB), jnp.uint32).at[:vec.shape[0]].set(vec)
        scaled = jfield.mont_mul(JFR, padded,
                                 self._part_pows(self.d.coset_shift, en))
        return self._fwd_ext(scaled)

    def extended_coset_to_coeff(self, vec):
        coeffs = self._inv_ext(vec)
        from ..fields.bn254 import inv_mod as _inv
        unscale = self._part_pows(_inv(self.d.coset_shift, R),
                                  self.d.extended_n)
        return jfield.mont_mul(JFR, coeffs, unscale)

    # parts: per-vector four-step NTTs (the batched gather-NTT stack of the
    # base engine would be GSPMD-partitioned into the round-1 compile
    # blowup; the explicit shard_map four-step stays fast)
    def coeff_to_part(self, vec, q):
        from . import polyops as _po
        c = _po.part_shift(self.d, q)
        return self._fwd_n(jfield.mont_mul(JFR, vec, self._part_pows(c)))

    def coeff_to_part_stack(self, vecs, q):
        return [self.coeff_to_part(v, q) for v in vecs]

    def sigma_from_mapping(self, mapping):
        """Host labels + the engine's (sharding) from_ints_stack: keeps
        every pk vector row-sharded like the rest of the pipeline."""
        from .keygen import sigma_labels_host
        import numpy as _np
        m = _np.asarray(mapping)
        return self.from_ints_stack(sigma_labels_host(m, m.shape[1]))

    # commitment ---------------------------------------------------------
    @staticmethod
    def _host_commit() -> bool:
        # The GSPMD-partitioned device fold is the real path; the env flag
        # lets the DEFAULT CI suite run a full sharded create_proof in
        # tractable time on XLA:CPU (the EC fold graphs execute minutes-
        # slow at the opt level the suite compiles with) — the sharded MSM
        # fold keeps its own mesh kernel tests (test_jax_kernels).
        import os
        return os.environ.get("HALO2TPU_SHARDED_HOST_COMMIT") == "1"

    def _commit(self, ctx, vecs, value_bits=None, blind_start=None):
        # narrow-plane bucketing is a single-chip JaxEngine optimization;
        # the sharded fold keeps the uniform bit-serial path
        npad = ctx.points.shape[0]
        fold = min(npad, max(self._ndev, 128))
        parts = []
        for i in range(0, len(vecs), self.msm_batch):
            chunk = list(vecs[i:i + self.msm_batch])
            while len(chunk) < self.msm_batch:
                chunk.append(jnp.zeros((npad, NLIMB), jnp.uint32))
            stacked = jnp.stack([
                jnp.concatenate([v, jnp.zeros((npad - v.shape[0], NLIMB),
                                              jnp.uint32)], axis=0)
                if v.shape[0] < npad else v for v in chunk])
            plain = JFR.from_mont(stacked)
            parts.append(_bit_partials(ctx.points, plain, fold_width=fold,
                                       shardings=self._msm_shardings))
        if not parts:
            return []
        stackd = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return _partials_to_affine(stackd)[:len(vecs)]
