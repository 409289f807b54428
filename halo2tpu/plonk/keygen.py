"""Keygen: build VerifyingKey / ProvingKey for a compiled circuit.

Equivalent of halo2's keygen_vk/keygen_pk (never invoked in the reference
repo's tests — SURVEY §0.1 — but required by its implied production pipeline
SURVEY §3.4 and by the on-chain verifier's vk memory, contract.sol:306-307).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..fields.bn254 import R, FR_DELTA, to_bytes_be
from ..fields.bn254 import R as FR_R
from ..ops.keccak import keccak256
from .circuit import Assignment, Circuit, Column, ConstraintSystem
from .domain import Domain, make_domain
from .srs import SRS


def _unpack_ints(u16_arr) -> list[int]:
    from ..fields.jfield import limbs_to_ints
    return limbs_to_ints(np.asarray(u16_arr))


@dataclass
class VerifyingKey:
    k: int
    n: int
    domain: Domain
    cs: ConstraintSystem
    fixed_commitments: list
    permutation_commitments: list  # sigma commitments, permutation-column order
    transcript_repr: int
    num_instance_rows: list[int]  # declared instance length per instance column

    def blinding_factors(self) -> int:
        return self.cs.blinding_factors()


@dataclass
class ProvingKey:
    """Proving key.  Fixed columns are stored in the n-domain Lagrange
    basis as packed (n, 16) uint16 plain-limb arrays; the permutation is
    stored as its COMPACT cell mapping (ncols, n, 2) int32 — sigma label
    columns (delta^j' * omega^i' per cell) are materialized on-engine at
    first use (engine.sigma_from_mapping), because computing ~ncols*n
    arbitrary-precision products on the host dominated wide-circuit keygen.
    Keygen never reads polynomial data back from the device (the TPU
    tunnel's device->host path is ~7 MB/s)."""
    vk: VerifyingKey
    fixed_values: list[np.ndarray]   # lagrange, (n, 16) uint16 plain limbs
    perm_mapping: np.ndarray         # (ncols, n, 2) int32 cell mapping
    config: object                   # circuit config (column handles)


def build_permutation_mapping(cs: ConstraintSystem, n: int,
                              copies) -> np.ndarray:
    """(ncols, n, 2) int32: cell (j, i) maps to (j', i').  Starts as the
    identity; each copy constraint merges cycles via the classic swap
    trick (sequential by construction — transpositions don't commute)."""
    cols = cs.permutation_columns
    ncols = len(cols)
    col_pos = {c: j for j, c in enumerate(cols)}
    mapping = np.empty((ncols, n, 2), dtype=np.int32)
    for j in range(ncols):
        mapping[j, :, 0] = j
        mapping[j, :, 1] = np.arange(n)
    for (ca, ra), (cb, rb) in copies:
        ja, jb = col_pos[ca], col_pos[cb]
        tmp = mapping[ja, ra].copy()
        mapping[ja, ra] = mapping[jb, rb]
        mapping[jb, rb] = tmp
    return mapping


def sigma_labels_host(mapping: np.ndarray, n: int) -> list[list[int]]:
    """Host (python-int) sigma label columns from a cell mapping — the
    golden path for the HostEngine and small circuits."""
    from ..fields.bn254 import fr_root_of_unity
    ncols = mapping.shape[0]
    omega = fr_root_of_unity(n.bit_length() - 1)
    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * omega % R
    deltas = [1] * ncols
    for j in range(1, ncols):
        deltas[j] = deltas[j - 1] * FR_DELTA % R
    sigmas = []
    for j in range(ncols):
        mj = mapping[j]
        sigmas.append([deltas[int(mj[i, 0])] * omega_pows[int(mj[i, 1])] % R
                       for i in range(n)])
    return sigmas


def keygen(circuit: Circuit, k: int, srs: SRS, engine=None, tracer=None):
    """engine=None uses host (python-int) polynomial ops; pass a
    plonk.engine JaxEngine to run the keygen NTTs/MSMs on device (required
    in practice for wide circuits — hundreds of fixed/sigma columns)."""
    from ..utils.trace import NULL
    tr = tracer or NULL
    cs = ConstraintSystem()
    config = circuit.configure(cs)
    n = 1 << k
    assert srs.n >= n, "SRS too small for circuit"
    assert cs.usable_rows(n) >= 1

    domain = make_domain(k, cs.degree())
    if isinstance(engine, str):
        from .engine import make_engine
        engine = make_engine(engine, domain, srs)

    # run synthesis once to extract fixed values + copy constraints
    with tr.phase("kg_synthesize"):
        asn = Assignment(cs, n)
        circuit.synthesize(config, asn)

    with tr.phase("kg_sigmas"):
        from ..fields.jfield import ints_to_limbs16
        fixed_values = [ints_to_limbs16([int(v) % FR_R for v in col])
                        for col in asn.fixed]
        perm_mapping = build_permutation_mapping(cs, n, asn.copies)

    if engine is None:
        fixed_commitments = [
            srs.commit_lagrange(_unpack_ints(col)) for col in fixed_values]
        sigma_commitments = [
            srs.commit_lagrange(col)
            for col in sigma_labels_host(perm_mapping, n)]
    else:
        with tr.phase("kg_encode"):
            fixed_dev = engine.from_packed_stack(fixed_values)
            sigma_dev = engine.sigma_from_mapping(perm_mapping)
        with tr.phase("kg_commit"):
            fixed_commitments = engine.commit_lagrange_batch(fixed_dev)
            sigma_commitments = engine.commit_lagrange_batch(sigma_dev)

    instances = circuit.instances()
    num_instance_rows = [len(col) for col in instances]

    # vk digest: canonical serialization -> keccak; role of halo2's
    # transcript_repr (absorbed first, contract.sol:227-228)
    h = bytearray()
    h += k.to_bytes(4, "big")
    h += cs.num_advice.to_bytes(4, "big")
    h += cs.num_fixed.to_bytes(4, "big")
    h += cs.num_instance.to_bytes(4, "big")
    for c in fixed_commitments + sigma_commitments:
        if c is None:
            h += b"\x00" * 64
        else:
            h += to_bytes_be(c[0]) + to_bytes_be(c[1])
    transcript_repr = int.from_bytes(keccak256(bytes(h)), "big") % R

    vk = VerifyingKey(
        k=k, n=n, domain=domain, cs=cs,
        fixed_commitments=fixed_commitments,
        permutation_commitments=sigma_commitments,
        transcript_repr=transcript_repr,
        num_instance_rows=num_instance_rows,
    )
    pk = ProvingKey(
        vk=vk,
        fixed_values=fixed_values,
        perm_mapping=perm_mapping,
        config=config,
    )
    return pk, vk


# -- checkpointing (SURVEY §5.4: the reference regenerates params per test;
# we persist them — real keygen at k>=15 is expensive) ------------------------

def save_proving_key(pk: ProvingKey, path: str) -> None:
    import pickle
    with open(path, "wb") as f:
        pickle.dump(pk, f)


def load_proving_key(path: str) -> ProvingKey:
    import pickle
    with open(path, "rb") as f:
        return pickle.load(f)


def cs_structure_digest(circuit: Circuit) -> str:
    """Cheap deterministic digest of a circuit's CONSTRAINT STRUCTURE
    (columns, gate expression trees incl. constants, lookups, permutation
    columns).  Guards keygen_cached against serving a stale pk after the
    circuit definition changes — the pickle has no other tie to the code
    that produced it."""
    cs = ConstraintSystem()
    circuit.configure(cs)
    toks: list[str] = []

    def walk(e):
        e.evaluate(
            constant=lambda c: toks.append(f"c{c};"),
            fixed=lambda q: toks.append(f"f{q.column_index}r{q.rotation};"),
            advice=lambda q: toks.append(f"a{q.column_index}r{q.rotation};"),
            instance=lambda q: toks.append(f"i{q.column_index}r{q.rotation};"),
            negate=lambda _: toks.append("n"),
            add=lambda *_: toks.append("s"),
            mul=lambda *_: toks.append("p"),
        )

    toks.append(f"cols{cs.num_advice},{cs.num_fixed},{cs.num_instance};")
    for g in cs.gates:
        for poly in g.polys:
            walk(poly)
        toks.append("|")
    for lk in cs.lookups:
        for a, b in lk.pairs:
            walk(a)
            walk(b)
        toks.append(f"L,b{getattr(lk, 'max_bits', None)};")
    for col in cs.permutation_columns:
        toks.append(f"{col.kind}{col.index},")
    # The pk also bakes in the SYNTHESIZE-level layout (cell placement,
    # copies, selector positions), which the configure-level walk above
    # cannot see — e.g. switching a circuit between static and dynamic
    # SHA-256 keeps the constraint system identical but changes every
    # fixed/permutation column.  Circuits expose the parameters that
    # determine their layout via layout_tag(); include it so a layout
    # change can never serve a stale pk (round-5 near-miss: the dynamic
    # SHA default collided with the static pk cache).
    tag = getattr(circuit, "layout_tag", None)
    toks.append(f"T{tag() if tag else ''};")
    return keccak256("".join(toks).encode()).hex()[:16]


def keygen_cached(circuit: Circuit, k: int, srs: SRS, cache_key: str,
                  engine=None, cache_dir: str | None = None, tracer=None):
    """keygen with on-disk pk/vk persistence, keyed by caller-supplied
    cache_key (circuit family + parameters) AND a digest of the circuit's
    constraint structure, so code changes can never serve a stale pk."""
    import os
    cache_dir = cache_dir or os.path.join(
        os.path.dirname(__file__), "..", "..", ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    # v3: packed-uint16 fixed columns + compact permutation mapping (older
    # pk_/pk2_ pickles are incompatible and intentionally not loaded)
    digest = cs_structure_digest(circuit)
    path = os.path.join(cache_dir, f"pk3_{cache_key}_{digest}_k{k}.pkl")
    if os.path.exists(path):
        pk = load_proving_key(path)
        return pk, pk.vk
    pk, vk = keygen(circuit, k, srs, engine=engine, tracer=tracer)
    save_proving_key(pk, path)
    return pk, vk
