"""Vectorized field arithmetic for JAX/TPU: 16-bit-limb Montgomery form.

TPU-first replacement for halo2curves' 4x64 Montgomery arithmetic (SURVEY
N1): TPU vector lanes have no 64-bit integer multiply, so field elements are
(..., 16) uint32 arrays holding 16-bit limbs (little-endian), values kept in
Montgomery form (a * 2^256 mod p).  16x16-bit products fit exactly in a
uint32 lane, and lazy-carry column sums stay under 2^22, so the whole CIOS
pipeline runs in native uint32 VPU ops.

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .bn254 import Q, R as FR_MOD

# Persistent XLA compilation cache: every kernel in the framework is
# shape-stable across runs, so warm processes skip the first-compile cost.
# The cache dir is suffixed with a hash of THIS machine's CPU features:
# XLA:CPU entries embed AOT code for the compiling machine's ISA, and
# loading an entry produced on a different host has caused hard SIGSEGVs
# mid-suite (cpu_aot_loader "machine type doesn't match" warnings).
def _machine_tag() -> str:
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:8]


# TPU (axon) entries are target-compiled for the TPU and safe to share
# across hosts — they keep the original dir (and its accumulated warm
# cache); CPU-backend runs (tests, scaling subprocesses) get the
# per-machine dir.
_IS_CPU = "cpu" in os.environ.get("JAX_PLATFORMS", "")
_CACHE_DIR = os.environ.get(
    "HALO2TPU_JAX_CACHE",
    os.path.join(os.path.dirname(__file__), "..", "..", ".cache",
                 f"jax-cpu-{_machine_tag()}" if _IS_CPU else "jax"))
# HALO2TPU_JAX_CACHE=off disables the persistent cache entirely: long
# XLA:CPU test sessions have segfaulted inside the cache's executable
# (de)serialization (jax compilation_cache.py get/put_executable_and_time)
# — the test suite (conftest.py) runs with the cache off.
if _CACHE_DIR != "off":
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

NLIMB = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(v: int) -> np.ndarray:
    return np.array([(v >> (LIMB_BITS * i)) & MASK for i in range(NLIMB)],
                    dtype=np.uint32)


def ints_to_limbs16(vals) -> np.ndarray:
    """list/array of python ints -> (n, 16) uint16 packed limbs (the wire
    format for host<->device transfers: half the bytes of the u32 compute
    layout — the axon tunnel is transfer-bound, so every from_ints/to_ints
    moves u16 and widens on the far side)."""
    buf = b"".join(int(v).to_bytes(32, "little") for v in vals)
    return np.frombuffer(buf, dtype="<u2").reshape(len(vals), NLIMB)


def ints_to_limbs(vals) -> np.ndarray:
    """list/array of python ints -> (n, 16) uint32 (via the bytes fast path:
    one to_bytes call per element instead of 16 shift/mask ops)."""
    return ints_to_limbs16(vals).astype(np.uint32)


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs)
    return sum(int(limbs[i]) << (LIMB_BITS * i) for i in range(NLIMB))


def limbs_to_ints(arr) -> list[int]:
    arr = np.ascontiguousarray(np.asarray(arr).reshape(-1, NLIMB).astype("<u2"))
    raw = arr.tobytes()
    return [int.from_bytes(raw[i * 32:(i + 1) * 32], "little")
            for i in range(arr.shape[0])]


class FieldSpec:
    """Per-modulus constants, precomputed host-side.

    Hashable by modulus so it can be a static jit argument (its device
    arrays bake into the compiled program as constants)."""

    def __hash__(self):
        return hash(self.p)

    def __eq__(self, other):
        return isinstance(other, FieldSpec) and self.p == other.p

    def __init__(self, p: int):
        self.p = p
        self.r = (1 << 256) % p          # Montgomery R
        self.r2 = self.r * self.r % p
        # -p^-1 mod 2^16
        self.p_inv_neg = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        # -p^-1 mod 2^256 (full-width Montgomery factor, SOS reduction)
        self.p_inv_full = jnp.asarray(
            int_to_limbs((-pow(p, -1, 1 << 256)) % (1 << 256)))
        self.p_limbs = jnp.asarray(int_to_limbs(p))
        self.r2_limbs = jnp.asarray(int_to_limbs(self.r2))
        self.one_plain = jnp.asarray(int_to_limbs(1))       # 1 (not Montgomery)
        self.one_mont = jnp.asarray(int_to_limbs(self.r))   # 1 in Montgomery form
        self.zero = jnp.zeros(NLIMB, dtype=jnp.uint32)

    # -- conversions -------------------------------------------------------
    def to_mont(self, a):
        return _jit_to_mont(self, a)

    def from_mont(self, a):
        return _jit_from_mont(self, a)

    def encode(self, vals) -> jax.Array:
        """python ints -> device array in Montgomery form (u16 wire)."""
        u16 = ints_to_limbs16([v % self.p for v in vals])
        return _jit_widen_to_mont(self, jnp.asarray(u16))

    def encode_packed(self, u16_arr) -> jax.Array:
        """(..., 16) uint16 plain limbs (host numpy) -> device Montgomery."""
        return _jit_widen_to_mont(self, jnp.asarray(u16_arr))

    def encode_narrow_stack(self, main_u16, tail_u16, split: int):
        """Columns of SMALL values on a 1/16-width wire: main_u16 (L, n)
        uint16 VALUES (rows >= split zeroed host-side), tail_u16
        (L, n-split, 16) full limbs for the tail rows (blinding).  Returns
        (L, n, 16) Montgomery."""
        return _jit_narrow_stack_to_mont(self, jnp.asarray(main_u16),
                                         jnp.asarray(tail_u16), split)

    def decode(self, arr) -> list[int]:
        plain = np.asarray(jax.device_get(_jit_from_mont_narrow(self, arr)))
        return limbs_to_ints(plain.astype("<u2"))


FQ = FieldSpec(Q)
FR = FieldSpec(FR_MOD)


def _carry_propagate_33(t):
    """Resolve a 33-column lazy accumulator (values < 2^22) into 17 limbs
    starting at column 16 (the post-reduction window)."""
    out = []
    carry = t[..., 16] * jnp.uint32(0)
    for k in range(16, 33):
        cur = t[..., k] + carry
        out.append(cur & MASK)
        carry = cur >> LIMB_BITS
    return jnp.stack(out, axis=-1), carry


def _cond_sub_p(spec: FieldSpec, limbs17):
    """limbs17: (..., 17) value in [0, 2p). Return canonical (..., 16)."""
    # r - p via two's complement: d = c + r_i + (0xffff - p_i), c0 = 1
    p = spec.p_limbs
    c = jnp.ones_like(limbs17[..., 0])
    diffs = []
    for i in range(NLIMB):
        d = c + limbs17[..., i] + (MASK - p[i])
        diffs.append(d & MASK)
        c = d >> LIMB_BITS
    # 17th limb participates: value < 2p < 2^257 so limb16 in {0,1}
    d16 = c + limbs17[..., 16] + MASK  # (MASK - 0) for p's 17th limb=0... p16=0
    borrow_free = (d16 >> LIMB_BITS) > 0  # carry out => r >= p
    sub = jnp.stack(diffs, axis=-1)
    return jnp.where(borrow_free[..., None], sub, limbs17[..., :16])


# Static gather index: b_shift[i, k] = b_ext[(k - i) % 33] where b_ext is b
# padded with 17 zero columns — every out-of-range (k - i) lands in the zero
# region.  One pad + one constant-index gather + one reduction per
# convolution: the only formulation found that is BOTH fast to compile
# (scatter-adds and pad-chains blow XLA up super-linearly) and near-minimal
# work (a one-hot matmul contraction costs 33x the useful MACs).
_CONV_IDX = jnp.asarray(
    np.fromfunction(lambda i, k: (k - i) % 33, (NLIMB, 33), dtype=np.int64)
    .astype(np.int32))


def _conv_cols(a, b, out_cols=33):
    """Lazy-carry column sums of the product a*b (little-endian limb
    convolution): returns (..., out_cols) with values < 16 * 2^16 < 2^21.

    b may be unbatched (16,) against a batched `a`: the gather then builds a
    tiny (16, out_cols) table and the product broadcasts.  NEVER broadcast a
    constant b to a's shape before calling — XLA constant-folds the giant
    batched gather/transpose at compile time (minutes per mul on XLA:CPU)."""
    zeros = jnp.zeros(b.shape[:-1] + (17,), dtype=b.dtype)
    b_ext = jnp.concatenate([b, zeros], axis=-1)
    idx = _CONV_IDX[:, :out_cols]
    b_shift = b_ext[..., idx]                       # (..., 16, out_cols)
    prod = a[..., :, None] * b_shift                # 32-bit exact
    lo = (prod & MASK).sum(axis=-2, dtype=jnp.uint32)
    hi = (prod >> LIMB_BITS).sum(axis=-2, dtype=jnp.uint32)
    # hi contributes one column up
    hi_shifted = jnp.concatenate(
        [jnp.zeros(hi.shape[:-1] + (1,), hi.dtype), hi[..., :-1]], axis=-1)
    return lo + hi_shifted


def _carry16(cols):
    """Sequential carry propagation of the first 16 columns: returns exact
    16 limbs and the carry out of column 15."""
    out = []
    carry = cols[..., 0] * jnp.uint32(0)
    for k in range(NLIMB):
        cur = cols[..., k] + carry
        out.append(cur & MASK)
        carry = cur >> LIMB_BITS
    return jnp.stack(out, axis=-1), carry


def _pallas_flat_ok(a, b) -> bool:
    """Trace-time gate for the pallas fast path: TPU backend, same-shape
    operands, enough lanes to amortize the kernel dispatch.  The XLA
    formulation below materializes (n, 16, 33) products in HBM; the pallas
    kernel keeps the whole SOS reduction in VMEM (~30x less traffic).
    Disable with HALO2TPU_NO_PALLAS_FIELD=1 (e.g. for GSPMD-partitioned
    multi-chip programs, which cannot partition a pallas_call)."""
    if os.environ.get("HALO2TPU_NO_PALLAS_FIELD") == "1":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if a.shape != b.shape or a.ndim < 2 or a.shape[-1] != NLIMB:
        return False
    rows = 1
    for s in a.shape[:-1]:
        rows *= s
    return rows >= 4096


@partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product a*b*R^-1 mod p (R=2^256), SOS formulation:
    three dense conv-matmuls plus short carry chains.  a, b: (..., 16)."""
    if _pallas_flat_ok(a, b):
        from ..ops.pallas_field import kc_for, mont_mul_flat
        return mont_mul_flat(kc_for(spec.p), a, b)
    T = _conv_cols(a, b)                                   # (..., 33)
    tl, _ = _carry16(T)                                    # exact low half
    # m = (T mod 2^256) * (-p^-1) mod 2^256: triangular contraction
    # (constants stay unbatched — see _conv_cols docstring)
    m_lazy = _conv_cols(tl, spec.p_inv_full, out_cols=NLIMB)
    m, _ = _carry16(m_lazy)
    # Z = T + m*p; low 256 bits vanish; result = Z >> 256 (< 2p)
    Z = T + _conv_cols(m, spec.p_limbs)
    _, z_carry = _carry16(Z)                               # carry into col 16
    out = []
    carry = z_carry
    for k in range(NLIMB, 33):
        cur = Z[..., k] + carry
        out.append(cur & MASK)
        carry = cur >> LIMB_BITS
    limbs17 = jnp.stack(out, axis=-1)
    return _cond_sub_p(spec, limbs17)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


@partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, a, b):
    s = a + b  # < 2^17 per limb
    out = []
    carry = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
    for i in range(NLIMB):
        cur = s[..., i] + carry
        out.append(cur & MASK)
        carry = cur >> LIMB_BITS
    limbs17 = jnp.stack(out + [carry], axis=-1)
    return _cond_sub_p(spec, limbs17)


@partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, a, b):
    """a - b mod p, inputs canonical (< p)."""
    # a + p - b via two's complement chain
    p = spec.p_limbs
    c = jnp.ones_like(a[..., 0])
    out = []
    for i in range(NLIMB):
        d = c + a[..., i] + p[i] + (MASK - b[..., i])
        out.append(d & MASK)
        c = d >> LIMB_BITS
    # value a + p - b lies in (0, 2p) < 2^256, so the final carry c is exactly
    # the +2^256 two's-complement artifact: drop it, 17th limb is 0
    limbs17 = jnp.stack(out + [jnp.zeros_like(c)], axis=-1)
    return _cond_sub_p(spec, limbs17)


@partial(jax.jit, static_argnums=0)
def neg(spec: FieldSpec, a):
    return sub(spec, jnp.zeros_like(a), a)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(mask, a, b):
    """mask (...,) bool: where(mask, a, b) over limb arrays."""
    return jnp.where(mask[..., None], a, b)


@partial(jax.jit, static_argnums=(0, 2))
def mont_pow(spec: FieldSpec, a, e: int):
    """a^e for a python-int exponent (fixed at trace time).

    Compiled as a fori_loop over the exponent bits (a constant bit vector)
    rather than an unrolled chain — a 254-bit exponent unrolled is a ~40k-op
    XLA graph that takes minutes to compile; the loop body is ~200 ops."""
    if e == 0:
        return jnp.broadcast_to(spec.one_mont, a.shape)
    nbits = e.bit_length()
    if nbits <= 16:  # small exponents: unrolled is cheaper at runtime
        result = jnp.broadcast_to(spec.one_mont, a.shape)
        base = a
        while e:
            if e & 1:
                result = mont_mul(spec, result, base)
            base = mont_sqr(spec, base)
            e >>= 1
        return result
    bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)

    def body(i, carry):
        result, base = carry
        result = select(bits[i] == 1, mont_mul(spec, result, base), result)
        base = mont_sqr(spec, base)
        return (result, base)

    result = jnp.broadcast_to(spec.one_mont, a.shape)
    result, _ = jax.lax.fori_loop(0, nbits, body, (result, a))
    return result


@partial(jax.jit, static_argnums=0)
def inv(spec: FieldSpec, a):
    """Fermat inversion a^(p-2); a must be nonzero."""
    return mont_pow(spec, a, spec.p - 2)


@partial(jax.jit, static_argnums=0)
def _jit_to_mont(spec, a):
    return mont_mul(spec, a, spec.r2_limbs)


@partial(jax.jit, static_argnums=0)
def _jit_from_mont(spec, a):
    return mont_mul(spec, a, spec.one_plain)


@partial(jax.jit, static_argnums=0)
def _jit_widen_to_mont(spec, a16):
    return mont_mul(spec, a16.astype(jnp.uint32), spec.r2_limbs)


@partial(jax.jit, static_argnums=0)
def _jit_from_mont_narrow(spec, a):
    return mont_mul(spec, a, spec.one_plain).astype(jnp.uint16)


@partial(jax.jit, static_argnums=(0, 3))
def _jit_narrow_stack_to_mont(spec, main_u16, tail_u16, split: int):
    """(L, n) u16 values + (L, n-split, 16) tail limbs -> (L, n, 16)
    Montgomery (values < 2^16 occupy limb 0 only)."""
    L, n = main_u16.shape
    limbs = jnp.zeros((L, n, NLIMB), jnp.uint32)
    limbs = limbs.at[:, :, 0].set(main_u16.astype(jnp.uint32))
    limbs = jax.lax.dynamic_update_slice(
        limbs, tail_u16.astype(jnp.uint32), (0, split, 0))
    return mont_mul(spec, limbs, spec.r2_limbs)


def _prefix_sum_mod(spec: FieldSpec, a):
    """Inclusive prefix sum mod p along axis 0 (Hillis-Steele add rounds)."""
    n = a.shape[0]
    idx = jnp.arange(n)
    x = a
    shift = 1
    while shift < n:
        rolled = jnp.roll(x, shift, axis=0)
        x = select(idx >= shift, add(spec, x, rolled), x)
        shift *= 2
    return x


@partial(jax.jit, static_argnums=0)
def suffix_sum_mod(spec: FieldSpec, a):
    """S[i] = sum_{j >= i} a[j] mod p over axis 0."""
    return jnp.flip(_prefix_sum_mod(spec, jnp.flip(a, axis=0)), axis=0)


def _prefix_prod(spec: FieldSpec, a):
    """Inclusive prefix product along axis 0 (Hillis-Steele: log2(n) rounds
    of full-width masked muls — n*log n work but only ~log n kernel launches,
    the right trade on TPU where lanes are cheap and graphs must stay small)."""
    n = a.shape[0]
    idx = jnp.arange(n)
    x = a
    shift = 1
    while shift < n:
        rolled = jnp.roll(x, shift, axis=0)
        x = select(idx >= shift, mont_mul(spec, x, rolled), x)
        shift *= 2
    return x


@partial(jax.jit, static_argnums=0)
def batch_inv_scan(spec: FieldSpec, a):
    """Batched inversion over the leading axis: prefix/suffix products +
    one Fermat inversion.  a: (n, 16), nonzero entries."""
    n = a.shape[0]
    prefix = _prefix_prod(spec, a)
    suffix = jnp.flip(_prefix_prod(spec, jnp.flip(a, axis=0)), axis=0)
    total_inv = inv(spec, prefix[-1])
    one = jnp.broadcast_to(spec.one_mont, (1, NLIMB))
    prefix_shift = jnp.concatenate([one, prefix[:n - 1]], axis=0)
    suffix_shift = jnp.concatenate([suffix[1:], one], axis=0)
    return mont_mul(spec, mont_mul(spec, prefix_shift, suffix_shift),
                    jnp.broadcast_to(total_inv, a.shape))
