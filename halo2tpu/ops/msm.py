"""Multi-scalar multiplication on TPU (SURVEY N5) — the prover's dominant
cost (one MSM per polynomial commitment).

TPU-first algorithm choice: *bit-serial masked tree reduction* rather than a
translation of CPU Pippenger.  Pippenger's bucket accumulation is an
irregular scatter — hostile to vector lanes — while for each scalar bit b,
  partial_b = sum_{i : bit_b(s_i)=1} P_i
is a dense masked tree-reduce: log2(n) rounds of full-width Jacobian adds,
total ~n lane-adds per bit, no sort, no scatter.  254 bits x n adds beats
the sorted-scan Pippenger variant (~windows * n log n) on lane work, and the
final combine sum_b 2^b partial_b is 254 host doublings.

Scalars batch: commitments share the same SRS bases, so the tree reduce is
vmapped over the scalar-vector axis — one compiled kernel commits many
polynomials (amortizes weight loads; the batch axis fills the VPU).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..curves import g1 as G1
from ..curves.jpoint import (
    affine_to_device, device_to_affine, identity_points, padd, padd_mixed,
    _psel,
)
from ..fields.bn254 import R
from ..fields.jfield import NLIMB, ints_to_limbs

SCALAR_BITS = 254
LIMB_BITS_SC = 16

# Windowed fixed-base fold (the TPU Pippenger replacement): the SRS bases
# are fixed across every commitment, so each base precomputes a 256-entry
# table of affine multiples w*P (one-time, device-side) and the fold walks
# 32 8-bit digit planes instead of 254 bit planes — ~8x fewer Jacobian
# adds, paid for with a W-way one-hot MXU select per lane (cheap: the MXU
# is otherwise idle during the VPU-bound fold).  The table is held as
# uint16 limbs (half the HBM of f32) and widened to f32 per row step.
WINDOW_BITS = 8
TABLE_W = 1 << WINDOW_BITS          # multiples per base, incl. identity
NUM_WINDOWS = 256 // WINDOW_BITS    # digit planes (top planes of <2^254 are 0)


# C: point-lanes per fold step.  Total fold work is C-independent
# (rows x L = planes x B x n lane-adds) and the whole row loop is one
# compiled program (_partials_fused), so C only sizes the per-iteration
# transients (selected points: 3*16*planes*B*C in f32 + u32 ~ 100 MB at
# C=256) against accumulator lane-width utilization.
_FOLD_WIDTH = 256


# The reduction is driven from Python with exactly TWO compiled padd-step
# kernels (row fold, strided tail fold), each carrying ALL 254 bit-planes as
# a leading batch axis.  Inlining the whole loop into one XLA program looks
# natural but compiles for minutes — the padd graph (~16 field muls) blows
# up XLA's fusion passes super-linearly when replicated into loop bodies —
# while per-bit Python stepping drowns in dispatch overhead.  This shape
# compiles two small kernels once and dispatches only n/C + log2(C) times
# per MSM batch, with every dispatch full of vector work (254*B*C lanes).

@partial(jax.jit, donate_argnums=0)
def _fold_row_step(acc, points_rows, scalar_rows, r):
    """acc: (254, B, C, 3, 16); points_rows: (rows, C, 3, 16); scalar_rows:
    (rows, B, C, 16); adds the masked r-th row of C points into every
    bit-plane of acc.

    The row axis is indexed with a dynamic slice on the UNSHARDED leading
    axis, so the same compiled program runs single-chip or with the C axis
    sharded over a mesh (GSPMD partitions the elementwise fold with zero
    per-step communication — parallel/msm.py)."""
    pts_row = jax.lax.dynamic_slice_in_dim(points_rows, r, 1, axis=0)[0]
    sc_row = jax.lax.dynamic_slice_in_dim(scalar_rows, r, 1, axis=0)[0]
    # (B, C, 16 limbs) -> bits (254, B, C)
    shifts = jnp.arange(LIMB_BITS_SC, dtype=jnp.uint32)
    bits = (sc_row[:, :, :, None] >> shifts) & 1       # (B, C, 16, 16)
    bits = bits.reshape(bits.shape[0], bits.shape[1], 256)
    bits = jnp.moveaxis(bits, -1, 0)[:SCALAR_BITS]     # (254, B, C)
    # mask by zeroing the affine z-flag: padd_mixed treats z=0 as identity
    pts_bc = jnp.broadcast_to(pts_row, acc.shape)
    z_masked = pts_bc[..., 2, :] * bits[..., None]
    sel = jnp.concatenate([pts_bc[..., :2, :], z_masked[..., None, :]],
                          axis=-2)
    return padd_mixed(acc, sel)


@partial(jax.jit, donate_argnums=0)
def _fold_tail_step(acc, stride):
    """One masked strided tree-fold round over the C axis: acc[i] +=
    acc[i+stride] for i < stride (stride traced — one compile total)."""
    other = jnp.roll(acc, -stride, axis=2)
    folded = padd(acc, other)
    keep = jnp.arange(acc.shape[2]) < stride
    return _psel(keep[None, None, :], folded, acc)


def _use_pallas() -> bool:
    import os
    if os.environ.get("HALO2TPU_NO_PALLAS") == "1":
        return False
    if os.environ.get("HALO2TPU_PALLAS") == "1":
        return True
    return jax.default_backend() != "cpu"


@partial(jax.jit, donate_argnums=0, static_argnums=(4, 5))
def _pallas_row_step(acc, pts_lm, scalar_limbs, r, C, tile):
    """One pallas MSM row fold: add the masked r-th group of C base points
    into every (bit-plane, batch) accumulator group.  acc may carry padding
    lanes beyond 254*B*C (kept inert by zero mask bits)."""
    from .pallas_ec import _fold_mixed_tiled
    bsz = scalar_limbs.shape[0]
    pts_c = jax.lax.dynamic_slice_in_dim(pts_lm, r * C, C, axis=2)
    sc = jax.lax.dynamic_slice_in_dim(scalar_limbs, r * C, C, axis=1)
    shifts = jnp.arange(LIMB_BITS_SC, dtype=jnp.uint32)
    bits = (sc[:, :, :, None] >> shifts) & jnp.uint32(1)   # (B, C, 16, 16)
    bits = bits.reshape(bsz, -1, 256)
    bits = jnp.moveaxis(bits, -1, 0)[:SCALAR_BITS]          # (254, B, C)
    bits = bits.reshape(1, -1)
    pad = acc.shape[-1] - bits.shape[-1]
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    return _fold_mixed_tiled(acc, pts_c, bits, tile)


def _bit_partials_pallas(points_lm, scalar_limbs, fold_width=None):
    """Pallas fold pipeline: points_lm (3, 16, n) limb-major; scalar_limbs
    (B, n, 16).  Returns (B, 254, 3, 16)."""
    from .pallas_ec import (_pick_tile, fold_add_any, from_limb_major,
                            identity_lm)
    n = points_lm.shape[-1]
    bsz = scalar_limbs.shape[0]
    C = min(n, fold_width or _FOLD_WIDTH)
    rows = n // C
    G = SCALAR_BITS * bsz
    L = G * C
    tile = _pick_tile(L, C)
    lpad = -L % tile           # pad lanes to the tile grid (masked inert)
    acc = identity_lm(L + lpad)
    for r in range(rows):
        acc = _pallas_row_step(acc, points_lm, scalar_limbs, r, C, tile)
    acc = acc[:, :, :L]
    width = C
    while width > 1:
        half = width // 2
        a4 = acc.reshape(3, 16, G, width)
        acc = fold_add_any(a4[..., :half].reshape(3, 16, G * half),
                           a4[..., half:].reshape(3, 16, G * half))
        width = half
    out = from_limb_major(acc, (SCALAR_BITS, bsz))          # (254, B, 3, 16)
    return jnp.transpose(out, (1, 0, 2, 3))


def _normalize_lm(jac_lm):
    """(3, 16, m) Jacobian limb-major -> affine (z = Montgomery 1, identity
    lanes keep z = 0) via ONE Fq batch inversion."""
    from ..fields.jfield import FQ as JFQ, batch_inv_scan, mont_mul as fmul
    from .pallas_ec import from_limb_major, to_limb_major
    arr = from_limb_major(jac_lm, (jac_lm.shape[-1],))     # (m, 3, 16)
    x, y, z = arr[:, 0], arr[:, 1], arr[:, 2]
    inf = jnp.all(z == 0, axis=-1)
    one = jnp.broadcast_to(JFQ.one_mont, z.shape)
    z_safe = jnp.where(inf[:, None], one, z)
    zi = batch_inv_scan(JFQ, z_safe)
    zi2 = fmul(JFQ, zi, zi)
    zi3 = fmul(JFQ, zi2, zi)
    xa = fmul(JFQ, x, zi2)
    ya = fmul(JFQ, y, zi3)
    za = jnp.where(inf[:, None], jnp.zeros_like(z), one)
    return to_limb_major(jnp.stack([xa, ya, za], axis=1))


def precompute_window_table(points_lm):
    """points_lm (3, 16, n) affine bases -> (3, 16*TABLE_W, n) table with
    tab[:, 16w:16w+16, i] = affine w*P_i (w = 0 and padded bases: z = 0).

    One-time per SRS.  Built in log2(W) doubling rounds instead of W-2
    sequential adds: with multiples 1..m known, evens 2..2m come from ONE
    batched doubling and odds 3..2m+1 from ONE batched mixed add of P —
    ~16 wide dispatches total (the 254-step add chain serialized on the
    axon runtime's per-dispatch latency).  Jacobian->affine normalization
    runs in lane-bounded batch-inversion chunks at the end."""
    from .pallas_ec import fold_add_any, fold_dbl_any, identity_lm
    n = points_lm.shape[-1]
    mults = {1: points_lm}           # Jacobian multiples
    have = 1
    def _cat(arrs):
        # the fold wrappers donate their first argument, so a single-element
        # "concat" (which JAX may alias) must be copied
        return jnp.copy(arrs[0]) if len(arrs) == 1 else \
            jnp.concatenate(arrs, axis=-1)

    while have < TABLE_W - 1:
        evens = fold_dbl_any(_cat([mults[k] for k in range(1, have + 1)]))
        for i in range(have):
            mults[2 * (i + 1)] = jax.lax.dynamic_slice_in_dim(
                evens, i * n, n, axis=2)
        odd_top = min(2 * have + 1, TABLE_W - 1)
        odd_ws = [w for w in range(3, odd_top + 1, 2) if w not in mults]
        if odd_ws:
            odds = fold_add_any(_cat([mults[w - 1] for w in odd_ws]),
                                _cat([points_lm] * len(odd_ws)))
            for i, w in enumerate(odd_ws):
                mults[w] = jax.lax.dynamic_slice_in_dim(
                    odds, i * n, n, axis=2)
        have = odd_top
    # normalize all Jacobian multiples to affine in bounded chunks
    slots = [identity_lm(n)]
    ws = list(range(1, TABLE_W))
    chunk = max(1, (1 << 22) // n)
    for i in range(0, len(ws), chunk):
        grp = ws[i:i + chunk]
        aff = _normalize_lm(jnp.concatenate([mults[w] for w in grp], axis=-1)
                            if len(grp) > 1 else mults[grp[0]])
        for j in range(len(grp)):
            slots.append(jax.lax.dynamic_slice_in_dim(aff, j * n, n, axis=2))
    return jnp.concatenate(slots, axis=1)


def _window_digits(sc):
    """(B, C, 16) 16-bit scalar limbs -> (NUM_WINDOWS, B, C) 4-bit digits."""
    bsz, c = sc.shape[0], sc.shape[1]
    shifts = jnp.arange(0, LIMB_BITS_SC, WINDOW_BITS, dtype=jnp.uint32)
    d = (sc[:, :, :, None] >> shifts) & jnp.uint32(TABLE_W - 1)
    d = d.reshape(bsz, c, NUM_WINDOWS)
    return jnp.moveaxis(d, -1, 0)


@partial(jax.jit, static_argnums=(2, 3))
def _partials_fused(table_f, scalar_limbs, C, P=NUM_WINDOWS):
    """The ENTIRE windowed fold — row loop, tail tree-fold, transpose — as
    ONE XLA program, so an MSM batch is a single dispatch.

    Two axon-runtime findings shape this design:
      * the per-lane table select runs in XLA as an exact one-hot float32
        einsum (HIGHEST precision; limb values < 2^16 are exact, exactly
        one nonzero term per sum) — doing it inside the pallas kernel cost
        ~27 ms/step in Mosaic relayouts;
      * once a process has performed any device->host read, every
        DEPENDENT dispatch waits a full ~30 ms tunnel round-trip before
        issue, so a 32-step python-driven fold chain costs ~1 s of pure
        latency.  Chains inside one compiled program are free.

    P: number of LIVE digit planes — scalars known < 2^(8P) (e.g. advice
    columns of bits/bytes/lookup limbs) fold only their live planes,
    cutting the per-step padd work NUM_WINDOWS/P-fold.  The caller is
    responsible for the bound (prover: per-column max before blinding,
    blinding rows split into a full-width tail fold).

    table_f: (3, W, 16, n) uint16 multiples (widened to f32 per row step);
    scalar_limbs (B, n, 16) plain limbs.
    Returns (B, P, 3, 16) per-digit-plane sums."""
    from .pallas_ec import (TILE, fold_add_any, fold_mixed, from_limb_major,
                            identity_lm)
    n = table_f.shape[-1]
    bsz = scalar_limbs.shape[0]
    rows = n // C
    G = P * bsz
    L = G * C
    lpad = -L % TILE
    acc0 = identity_lm(L + lpad)
    ones = jnp.ones((1, L + lpad), jnp.uint32)
    wrange = jnp.arange(TABLE_W, dtype=jnp.uint32)

    def body(r, acc):
        tab_c = jax.lax.dynamic_slice_in_dim(table_f, r * C, C, axis=3)
        sc = jax.lax.dynamic_slice_in_dim(scalar_limbs, r * C, C, axis=1)
        digs = _window_digits(sc)[:P].reshape(G, C)
        oh = (digs[:, None, :] == wrange[None, :, None]).astype(jnp.bfloat16)
        # the select runs as TWO bf16 MXU einsums over the table's 8-bit
        # halves: all operands are bf16-EXACT (entries <= 255, one-hot 0/1,
        # exactly one nonzero term per f32 accumulation), unlike a single
        # f32 pass over 16-bit limbs which needs a multi-pass HIGHEST
        # decomposition and a 2x-fatter one-hot tensor
        tlo = (tab_c & jnp.uint16(0xFF)).astype(jnp.bfloat16)
        thi = (tab_c >> 8).astype(jnp.bfloat16)
        slo = jnp.einsum("cwlk,gwk->clgk", tlo, oh,
                         preferred_element_type=jnp.float32)
        shi = jnp.einsum("cwlk,gwk->clgk", thi, oh,
                         preferred_element_type=jnp.float32)
        sel = (slo.astype(jnp.uint32)
               | (shi.astype(jnp.uint32) << 8)).reshape(3, NLIMB, L)
        if lpad:
            sel = jnp.pad(sel, ((0, 0), (0, 0), (0, lpad)))
        # digit 0 / padded bases select identity entries (z = 0) -> inert
        return fold_mixed(acc, sel, ones)

    acc = jax.lax.fori_loop(0, rows, body, acc0)
    acc = acc[:, :, :L]
    width = C
    while width > 1:
        half = width // 2
        a4 = acc.reshape(3, 16, G, width)
        acc = fold_add_any(a4[..., :half].reshape(3, 16, G * half),
                           a4[..., half:].reshape(3, 16, G * half))
        width = half
    out = from_limb_major(acc, (P, bsz))
    return jnp.transpose(out, (1, 0, 2, 3))


def _digit_partials_pallas(table_f, scalar_limbs, fold_width=None,
                           planes=NUM_WINDOWS):
    n = table_f.shape[-1]
    C = min(n, fold_width or _FOLD_WIDTH)
    return _partials_fused(table_f, scalar_limbs, C, planes)


@partial(jax.jit, donate_argnums=())
def _horner_device_w(partials):
    """(B, NUM_WINDOWS, 3, 16) -> (B, 3, 16): acc = 16*acc + partial[d],
    top digit plane down, on device."""
    from ..curves.jpoint import pdbl

    bsz = partials.shape[0]

    def body(i, acc):
        d = NUM_WINDOWS - 1 - i
        for _ in range(WINDOW_BITS):
            acc = pdbl(acc)
        return padd(acc, partials[:, d])

    return jax.lax.fori_loop(0, NUM_WINDOWS, body, identity_points((bsz,)))


def _wpartials_to_affine(partials) -> list:
    """(B, NUM_WINDOWS, 3, 16) device digit-plane sums -> B host affine."""
    if jax.default_backend() != "cpu":
        return device_to_affine(_horner_device_w(partials))
    host = device_to_affine(partials.reshape(-1, 3, NLIMB))
    out = []
    for b in range(partials.shape[0]):
        rows = host[b * NUM_WINDOWS:(b + 1) * NUM_WINDOWS]
        acc = (1, 1, 0)
        for p in reversed(rows):
            for _ in range(WINDOW_BITS):
                acc = G1.jac_double(acc)
            if p is not None:
                acc = G1.jac_add(acc, G1.to_jacobian(p))
        out.append(G1.from_jacobian(acc))
    return out


def _bit_partials(points, scalar_limbs, fold_width=None, shardings=None):
    """points: (n, 3, 16); scalar_limbs: (B, n, 16) plain (non-Montgomery)
    16-bit limbs.  Returns (B, 254, 3, 16): per-bit masked sums.

    shardings: optional (acc_sharding, pts_sharding, sc_sharding) triple of
    NamedShardings over the fold-lane (C) axis — the multi-chip path
    (parallel/msm.py) places the inputs and GSPMD partitions the same two
    step kernels across the mesh."""
    if shardings is None and _use_pallas():
        from .pallas_ec import to_limb_major
        return _bit_partials_pallas(to_limb_major(points), scalar_limbs,
                                    fold_width)
    n = points.shape[0]
    bsz = scalar_limbs.shape[0]
    C = min(n, fold_width or _FOLD_WIDTH)
    rows = n // C
    logc = C.bit_length() - 1
    # (rows, C, ...) layouts: row slicing on the unsharded leading axis
    pts_rows = points.reshape(rows, C, 3, points.shape[-1])
    sc_rows = jnp.moveaxis(
        scalar_limbs.reshape(bsz, rows, C, scalar_limbs.shape[-1]), 1, 0)
    acc = identity_points((SCALAR_BITS, bsz, C))
    if shardings is not None:
        acc_sh, pts_sh, sc_sh = shardings
        acc = jax.device_put(acc, acc_sh)
        pts_rows = jax.device_put(pts_rows, pts_sh)
        sc_rows = jax.device_put(sc_rows, sc_sh)
    for r in range(rows):
        acc = _fold_row_step(acc, pts_rows, sc_rows, r)
    for l in range(logc):
        acc = _fold_tail_step(acc, C >> (l + 1))
    # (254, B, C, 3, 16) -> (B, 254, 3, 16)
    return jnp.transpose(acc[:, :, 0], (1, 0, 2, 3))


def msm(points_device, scalars_batch: list[list[int]]) -> list:
    """MSM of the same base points against a batch of scalar vectors.

    points_device: (n, 3, 16) from jpoint.affine_to_device (n power of 2;
    pad with identity).  scalars_batch: B lists of python ints.
    Returns B host affine points.
    """
    n = points_device.shape[0]
    arrs = []
    for scalars in scalars_batch:
        s = [v % R for v in scalars] + [0] * (n - len(scalars))
        arrs.append(ints_to_limbs(s))
    limbs = jnp.asarray(np.stack(arrs))
    partials = _bit_partials(points_device, limbs)
    out = []
    for bi, aff in enumerate(_partials_to_affine(partials)):
        out.append(aff)
    return out


@partial(jax.jit, donate_argnums=())
def _horner_device(partials):
    """(B, 254, 3, 16) -> (B, 3, 16): acc = 2*acc + partial[b], top bit
    down, entirely on device (one pdbl+padd fori body — the host Horner it
    replaces cost ~0.5 s/batch of python EC math, dominating TPU runs)."""
    from ..curves.jpoint import pdbl

    bsz = partials.shape[0]

    def body(i, acc):
        b = SCALAR_BITS - 1 - i
        acc = pdbl(acc)
        return padd(acc, partials[:, b])

    return jax.lax.fori_loop(0, SCALAR_BITS, body,
                             identity_points((bsz,)))


def _partials_to_affine(partials) -> list:
    """(B, 254, 3, 16) device partial sums -> B host affine points.

    On TPU the Horner combine runs on device (host python EC math would
    dominate); on CPU the fori(pdbl+padd) body compiles pathologically
    slowly in XLA:CPU, so the combine stays host-side there."""
    if jax.default_backend() != "cpu":
        return device_to_affine(_horner_device(partials))
    host = device_to_affine(partials.reshape(-1, 3, NLIMB))
    bsz = partials.shape[0]
    out = []
    for b in range(bsz):
        rows = host[b * SCALAR_BITS:(b + 1) * SCALAR_BITS]
        acc = (1, 1, 0)
        for p in reversed(rows):
            acc = G1.jac_double(acc)
            if p is not None:
                acc = G1.jac_add(acc, G1.to_jacobian(p))
        out.append(G1.from_jacobian(acc))
    return out


class MSMContext:
    """Caches device-resident SRS bases (padded to a power of two) and,
    on the pallas path, their windowed multiple table (lazily built,
    stored (3, W, 16, n) uint16 — limbs are 16-bit, and f32 storage would
    double the dominant HBM resident of the prover).

    cache_tag: when set, the built table persists to
    .cache/msm_table_<tag>.npy — the device build costs ~220 s at n=2^15
    (254 wide doubling/add dispatches), while a disk load + host->device
    transfer is ~20 s.  The one-time save pays a slow device->host read."""

    def __init__(self, points: list, cache_tag: str | None = None):
        n = len(points)
        npad = 1 << (n - 1).bit_length() if n > 1 else 1
        pts = list(points) + [None] * (npad - n)
        self.n = n
        self.points = affine_to_device(pts)
        self._table = None
        self._cache_tag = cache_tag

    def _table_path(self):
        import os
        if self._cache_tag is None:
            return None
        d = os.environ.get("HALO2TPU_CACHE", os.path.join(
            os.path.dirname(__file__), "..", "..", ".cache"))
        return os.path.join(d, f"msm_table_{self._cache_tag}.npy")

    @property
    def table(self):
        if self._table is None:
            import os
            path = self._table_path()
            npad = self.points.shape[0]
            if path and os.path.exists(path):
                host = np.load(path, mmap_mode="r")
                if host.shape == (3, TABLE_W, NLIMB, npad):
                    self._table = jnp.asarray(np.ascontiguousarray(host))
                    return self._table
            from .pallas_ec import to_limb_major
            tab = precompute_window_table(to_limb_major(self.points))
            self._table = jax.jit(
                lambda t: t.reshape(3, TABLE_W, NLIMB, npad)
                .astype(jnp.uint16))(tab)
            if path:
                try:
                    np.save(path, np.asarray(self._table))
                except Exception:
                    pass   # cache is best-effort
        return self._table

    def partials(self, plain_limbs, planes: int = NUM_WINDOWS,
                 fold_width=None):
        """(B, npad, 16) plain scalar limbs (device) -> device partial sums
        ((B, planes, 3, 16) windowed or (B, 254, 3, 16) bit-serial).
        planes < NUM_WINDOWS: scalars bounded by 2^(8*planes) — the fold
        skips the all-zero digit planes (engine._commit's bucket path).
        No device->host transfer: batches accumulate device-side so a whole
        commit phase pays ONE read (finalize)."""
        if _use_pallas():
            return _digit_partials_pallas(self.table, plain_limbs,
                                          fold_width, planes)
        return _bit_partials(self.points, plain_limbs)

    def finalize(self, partials_batches: list) -> list:
        """Stacked per-batch partials -> host affine points (one read)."""
        stacked = partials_batches[0] if len(partials_batches) == 1 else \
            jnp.concatenate(partials_batches, axis=0)
        if _use_pallas():
            return _wpartials_to_affine(stacked)
        return _partials_to_affine(stacked)

    def commit_limbs(self, plain_limbs) -> list:
        """(B, npad, 16) plain scalar limbs (device) -> B host affine."""
        return self.finalize([self.partials(plain_limbs)])

    def commit_batch(self, scalar_vectors: list[list[int]]) -> list:
        npad = self.points.shape[0]
        arrs = []
        for scalars in scalar_vectors:
            s = [v % R for v in scalars] + [0] * (npad - len(scalars))
            arrs.append(ints_to_limbs(s))
        return self.commit_limbs(jnp.asarray(np.stack(arrs)))

    def commit(self, scalars: list[int]):
        return self.commit_batch([scalars])[0]
