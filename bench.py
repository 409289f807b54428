"""halo2tpu benchmark harness (BASELINE.md metric set).

Run on the real TPU chip: per-kernel throughput with speed-of-light bounds
derived from HBM bandwidth, full create_proof wall times, and (on CPU
meshes) 1->N device scaling efficiency for NTT/MSM.

Prints ONE parseable JSON line on stdout (last line):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: RSA-SHA256 (k=15, reference flagship, lib.rs:256-452) full
real-prover proof latency.  vs_baseline = reference CPU time (14.442 s,
/root/reference/README.md:19 — MockProver synthesis+check) divided by ours,
i.e. >1 means faster than the reference point.

Levels (env BENCH_LEVEL): "fast" = kernels + Square proof only;
"full" (default) = + composite Aadhaar proof + RSA-SHA256 k=15 real proof
+ MSM kernel + soak + scaling sweep; "all" = + nothing extra (kept for
compatibility).

Honesty metrics: `host_compare` times the SAME real prover pipeline on the
HostEngine (python-int golden path) at the same k for the Square and
Nullifier circuits — real-prover vs real-prover, complementing the
rsa `ref_mock_s` north star (which is MockProver satisfiability checking,
not real proving).
"""
from __future__ import annotations

import json
import os
import signal
import sys
import time
import traceback

import numpy as np

RESULTS: dict = {}
ERRORS: list[str] = []
SKIPPED: list[str] = []

_T0 = time.time()
# Hard wall-clock budget: sections are skipped (never killed mid-run) once
# the budget is spent, so the final JSON line ALWAYS prints.  The first run
# on a cold tunnel pays remote-compile latency (~1 min per pallas kernel
# variant); the persistent JAX cache (.cache/jax) makes reruns fast.
# The harness's `timeout` may be tighter than the requested budget (round-3
# lesson: killed at ~1100s with BENCH_BUDGET_S=2400 and captured nothing),
# so (a) the budget self-caps, (b) the cumulative JSON line re-prints after
# EVERY section (the last complete line stands), and (c) SIGTERM dumps the
# summary before dying.
_BUDGET_S = min(float(os.environ.get("BENCH_BUDGET_S", "2800")), 3000.0)


def _log(msg: str):
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _remaining() -> float:
    return _BUDGET_S - (time.time() - _T0)


def _have_time(need_s: float, what: str) -> bool:
    if _remaining() < need_s:
        SKIPPED.append(f"{what} (budget: {_remaining():.0f}s left, "
                       f"wanted {need_s:.0f}s)")
        _log(f"SKIP {what}: {_remaining():.0f}s left of {_BUDGET_S:.0f}s")
        return False
    return True

# v5e: ~819 GB/s HBM, 394 bf16 TFLOP/s. Field elements are 64 B (16xu32).
HBM_GBPS = float(os.environ.get("BENCH_HBM_GBPS", "819"))
ELEM_BYTES = 64

RSA_BASELINE_S = 14.442124258      # /root/reference/README.md:19
AADHAAR_TARGET_S = 2.0             # BASELINE.md target row


def _fixed_key():
    from halo2tpu.utils.rsa_native import load_fixed_key
    return load_fixed_key(os.path.join(os.path.dirname(__file__),
                                       "tests/golden/rsa_key_2048.json"))


# Cross-section state: engines are cached per DOMAIN (the extended-coset
# math bakes in the quotient degree, so RSA and composite need separate
# engines) — but the ~0.8 GB MSM window table is shared process-wide by
# the engine layer itself (_shared_msm_ctx).  Also holds pk/circuit
# handles for the soak.
STATE: dict = {}


def _shared_engine(domain, srs):
    from halo2tpu.plonk.engine import make_engine
    key = ("jax", domain.n, domain.extended_n)
    if key not in STATE:
        STATE[key] = make_engine("jax", domain, srs)
    return STATE[key]


def _bench(fn, *args, warmup=1, iters=8):
    """Per-call wall time of fn(*args), measured PIPELINED: issue `iters`
    dispatches, then one block_until_ready, divide.  On the axon tunnel a
    single dispatch+sync pays a flat ~29 ms RTT once the process has done
    any device->host read — per-sync timing would report that constant, not
    the kernel.  Pipelined timing matches how the prover actually runs
    (long dispatch chains between rare syncs)."""
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def bench_kernels():
    import jax
    import jax.numpy as jnp
    from halo2tpu.fields.bn254 import R, fr_root_of_unity
    from halo2tpu.fields.jfield import FR, mont_mul
    from halo2tpu.ops import ntt as jntt

    rng = np.random.default_rng(0)

    # --- mont_mul throughput ------------------------------------------------
    _log("kernels: mont_mul")
    n = 1 << 20
    a = FR.encode([int.from_bytes(rng.bytes(31), "big") % R for v in range(256)])
    a = jnp.tile(a, (n // 256, 1))
    b = jnp.roll(a, 1, axis=0)
    _ = np.asarray(a[0])   # enter the post-read dispatch regime (see _bench)
    t = _bench(lambda x, y: mont_mul(FR, x, y), a, b)
    # speed of light: 2 reads + 1 write of 64 B per element over HBM
    sol = HBM_GBPS * 1e9 / (3 * ELEM_BYTES)
    RESULTS["mont_mul"] = {
        "n": n, "s": round(t, 6), "melem_per_s": round(n / t / 1e6, 1),
        "sol_melem_per_s": round(sol / 1e6, 1),
        "sol_frac": round(n / t / sol, 3)}

    # --- NTT k=15..20 -------------------------------------------------------
    ntt_rows = {}
    for k in (15, 18, 20):
        if not _have_time(120, f"ntt k={k}"):
            break
        _log(f"kernels: ntt k={k}")
        nn = 1 << k
        plan = jntt.get_plan(nn, fr_root_of_unity(k))
        x = jnp.tile(a[:256], (nn // 256, 1))
        t = _bench(lambda v: jntt.ntt(plan, v), x)
        # each of logn stages streams n elems in + out, plus twiddle reads:
        # ~3 * n * 64 B per stage
        sol_t = k * 3 * nn * ELEM_BYTES / (HBM_GBPS * 1e9)
        ntt_rows[f"k{k}"] = {
            "s": round(t, 5), "sol_s": round(sol_t, 5),
            "sol_frac": round(sol_t / t, 3)}
        if k == 15:
            # the prover's regime: 128-column stacked transform
            C = 128
            xs = jnp.stack([x] * C, axis=1)
            ts = _bench(lambda v: jntt.ntt(plan, v), xs, iters=3)
            ntt_rows[f"k{k}_stack{C}"] = {
                "s_per_col": round(ts / C, 5),
                "sol_frac": round(sol_t / (ts / C), 3)}
    RESULTS["ntt"] = ntt_rows


def bench_msm_kernel():
    """MSM microbench at k=15 on the REAL SRS bases, via the shared
    engine's Lagrange context (the exact tables + fold kernels the prover
    uses — no second 190 s table build).  Reports the full 32-plane fold
    and the narrow 8-plane fold (bounded-value columns)."""
    import jax
    import jax.numpy as jnp
    from halo2tpu.fields.bn254 import R
    from halo2tpu.fields.jfield import ints_to_limbs
    from halo2tpu.plonk.domain import make_domain
    from halo2tpu.plonk.srs import setup

    nn = 1 << 15
    srs = setup(15)
    eng = _shared_engine(make_domain(15, 9), srs)
    ctx = eng._msm_lagrange
    rng = np.random.default_rng(0)
    B = eng.msm_batch
    t0 = time.perf_counter()
    _ = ctx.table
    jax.block_until_ready(_)
    table_s = time.perf_counter() - t0
    msm_rows = {"table_ready_s": round(table_s, 2)}
    for name, nbytes, planes in (("full", 31, 32), ("narrow8", 7, 8)):
        scal = [[int.from_bytes(rng.bytes(nbytes), "big") % R
                 for _ in range(nn)] for _ in range(B)]
        arrs = jnp.asarray(np.stack([ints_to_limbs(s) for s in scal]))
        # one warm pass (compile), then timed partials+finalize
        jax.block_until_ready(ctx.partials(arrs, planes=planes))
        t0 = time.perf_counter()
        parts = ctx.partials(arrs, planes=planes)
        jax.block_until_ready(parts)
        fold = time.perf_counter() - t0
        if planes != 32:
            parts = jnp.pad(parts, ((0, 0), (0, 32 - planes), (0, 0), (0, 0)))
        t0 = time.perf_counter()
        ctx.finalize([parts])
        fin = time.perf_counter() - t0
        msm_rows[name] = {
            "batch": B, "fold_s_per_msm": round(fold / B, 4),
            "finalize_s": round(fin, 3),
            "mpoints_per_s": round(B * nn / (fold + fin) / 1e6, 2)}
    RESULTS["msm"] = msm_rows


def bench_square_proof():
    from halo2tpu.circuits.signal import SquareCircuit
    from halo2tpu.plonk.keygen import keygen
    from halo2tpu.plonk.prover import create_proof
    from halo2tpu.plonk.srs import setup
    from halo2tpu.plonk.verifier import verify_proof

    from halo2tpu.plonk.engine import make_engine
    _log("square: setup + keygen")
    srs = setup(4)
    c = SquareCircuit(5)
    pk, vk = keygen(c, 4, srs)
    eng = make_engine("jax", vk.domain, srs)
    # warm (compile) + timed
    create_proof(pk, srs, c, c.instances(), rng_seed=42, engine=eng)
    t0 = time.perf_counter()
    proof = create_proof(pk, srs, c, c.instances(), rng_seed=42, engine=eng)
    t = time.perf_counter() - t0
    assert len(proof) == 0x0460
    t0 = time.perf_counter()
    ok = verify_proof(vk, srs, c.instances(), proof)
    tv = time.perf_counter() - t0
    assert ok
    RESULTS["square_proof"] = {
        "prove_s": round(t, 4), "verify_s": round(tv, 4),
        "ref_prove_s": 0.012089368, "proof_bytes": len(proof)}


def bench_rsa_proof():
    """Flagship: RSA-SHA256 k=15 real proof on the JAX engine.

    Headline = steady-state latency (2nd proof: pk cosets + kernels warm) —
    the production regime, where one pk proves many signatures.  The cold
    first proof (includes coset NTTs of ~100 fixed/sigma polys + compiles)
    is reported separately."""
    from halo2tpu.utils.trace import Tracer
    from halo2tpu.circuits.rsa_sha256 import RSASha256Circuit
    from halo2tpu.plonk.engine import make_engine
    from halo2tpu.plonk.keygen import keygen_cached
    from halo2tpu.plonk.prover import create_proof
    from halo2tpu.plonk.srs import setup
    from halo2tpu.plonk.verifier import verify_proof
    from halo2tpu.utils.rsa_native import generate_key, sign_pkcs1v15_sha256

    k = 15
    msg = bytes(range(256)) * 4      # 1024 B = reference MSG_LEN (lib.rs:264)
    key, n, e = _fixed_key()         # pinned: bench runs are reproducible
    sig = sign_pkcs1v15_sha256(key, msg)
    c = RSASha256Circuit(msg, n, sig)

    _log(f"rsa: srs setup k={k}")
    srs = setup(k)
    _log("rsa: keygen")
    t0 = time.perf_counter()
    pk, vk = keygen_cached(c, k, srs, cache_key="rsa_sha256_bench", engine="jax")
    kg = time.perf_counter() - t0

    eng = _shared_engine(vk.domain, srs)
    _log(f"rsa: cold proof (keygen took {kg:.1f}s)")
    t0 = time.perf_counter()
    create_proof(pk, srs, c, c.instances(), rng_seed=3, engine=eng)
    cold = time.perf_counter() - t0
    _log(f"rsa: warm proof (cold took {cold:.1f}s)")
    tr = Tracer("rsa_sha256_proof")
    t0 = time.perf_counter()
    proof = create_proof(pk, srs, c, c.instances(), rng_seed=4,
                         engine=eng, tracer=tr)
    t = time.perf_counter() - t0
    t0 = time.perf_counter()
    ok = verify_proof(vk, srs, c.instances(), proof)
    tv = time.perf_counter() - t0
    assert ok, "rsa proof failed local verification"
    STATE["rsa"] = (pk, vk, c, srs)
    RESULTS["rsa_sha256_proof"] = {
        "k": k, "msg_bytes": len(msg), "keygen_s": round(kg, 2),
        "cold_prove_s": round(cold, 3),
        "prove_s": round(t, 3), "verify_s": round(tv, 3),
        "ref_mock_s": RSA_BASELINE_S,
        "phases": {p: round(v, 3) for p, v in tr.phases.items()}}
    return t


def bench_composite_proof():
    """Composite Aadhaar circuit with the FULL 1137-byte golden QR vector
    (tests/golden/qr_msg.json = /root/reference/src/lib.rs:652-743):
    RSA-SHA256 over the first 700 bytes + extraction + reveal + nullifier
    + timestamp + signal in ONE proof (the reference's flagship flow,
    lib.rs:649-1053, realized as a single circuit)."""
    import json as _json
    from halo2tpu.circuits.aadhaar_qr import (
        AadhaarParams, AadhaarQRVerifierCircuit, AadhaarWitness)
    from halo2tpu.plonk.engine import make_engine
    from halo2tpu.plonk.keygen import keygen_cached
    from halo2tpu.plonk.prover import create_proof
    from halo2tpu.plonk.srs import setup
    from halo2tpu.plonk.verifier import verify_proof
    from halo2tpu.utils.rsa_native import generate_key, sign_pkcs1v15_sha256
    from halo2tpu.utils.trace import Tracer

    k = int(os.environ.get("BENCH_COMPOSITE_K", "15"))
    with open(os.path.join(os.path.dirname(__file__),
                           "tests/golden/qr_msg.json")) as f:
        qr = bytes(_json.load(f)["msg"])
    key, n, e = _fixed_key()         # pinned: bench runs are reproducible
    sig = sign_pkcs1v15_sha256(key, qr[:700])
    p = AadhaarParams(signed_len=700)
    w = AadhaarWitness(qr, n, sig, nullifier_seed=12345678,
                       signal_hash=4294967295)
    c = AadhaarQRVerifierCircuit(w, p)

    _log(f"composite: srs setup k={k}")
    srs = setup(k)
    _log("composite: keygen")
    t0 = time.perf_counter()
    pk, vk = keygen_cached(c, k, srs, cache_key="aadhaar_bench", engine="jax")
    kg = time.perf_counter() - t0
    eng = _shared_engine(vk.domain, srs)
    _log(f"composite: cold proof (keygen took {kg:.1f}s)")
    t0 = time.perf_counter()
    create_proof(pk, srs, c, c.instances(), rng_seed=5, engine=eng)
    cold = time.perf_counter() - t0
    _log(f"composite: warm proof (cold took {cold:.1f}s)")
    tr = Tracer("aadhaar_proof")
    t0 = time.perf_counter()
    proof = create_proof(pk, srs, c, c.instances(), rng_seed=6,
                         engine=eng, tracer=tr)
    t = time.perf_counter() - t0
    if not verify_proof(vk, srs, c.instances(), proof):
        # post-mortem artifact: the fixed key + rng seed make this exactly
        # reproducible — dump the bytes so a failure can be bisected
        with open(".cache/failed_composite_proof.bin", "wb") as f:
            f.write(proof)
        raise AssertionError("composite proof failed local verification "
                             "(proof dumped to .cache/)")
    STATE["composite"] = (pk, vk, c, srs)
    RESULTS["aadhaar_composite_proof"] = {
        "k": k, "qr_bytes": len(qr), "keygen_s": round(kg, 2),
        "cold_prove_s": round(cold, 3), "prove_s": round(t, 3),
        "target_s": AADHAAR_TARGET_S, "ref_mock_s": RSA_BASELINE_S,
        "phases": {p_: round(v, 3) for p_, v in tr.phases.items()}}
    return t


def bench_soak():
    """Determinism/soundness soak (VERDICT r4 #2): alternate RSA and
    composite proofs with fresh blinding seeds, verifying EVERY proof
    locally.  A single unverifiable proof fails the section (and dumps the
    bytes for bisection)."""
    from halo2tpu.plonk.prover import create_proof
    from halo2tpu.plonk.verifier import verify_proof
    n_runs = int(os.environ.get("BENCH_SOAK_N", "6"))
    targets = [t for t in ("rsa", "composite") if t in STATE]
    if not targets:
        SKIPPED.append("soak (no proved circuits in STATE)")
        return
    runs = 0
    times = []
    for i in range(n_runs):
        if runs and not _have_time(1.5 * max(times) if times else 60,
                                   f"soak run {i}"):
            break
        name = targets[i % len(targets)]
        pk, vk, c, srs = STATE[name]
        eng = _shared_engine(vk.domain, srs)
        seed = 1000 + i
        t0 = time.perf_counter()
        proof = create_proof(pk, srs, c, c.instances(), rng_seed=seed,
                             engine=eng)
        times.append(time.perf_counter() - t0)
        if not verify_proof(vk, srs, c.instances(), proof):
            with open(f".cache/failed_soak_{name}_{seed}.bin", "wb") as f:
                f.write(proof)
            RESULTS["soak"] = {"runs": runs, "failed": f"{name} seed={seed}"}
            raise AssertionError(f"soak: {name} proof seed={seed} failed "
                                 "local verification (dumped to .cache/)")
        runs += 1
        _log(f"soak {runs}/{n_runs}: {name} ok ({times[-1]:.1f}s)")
    RESULTS["soak"] = {"runs": runs, "all_verified": True,
                       "prove_s": [round(x, 2) for x in times]}


def bench_host_compare():
    """Real-prover vs real-prover at the same k (VERDICT r4 #8): the
    HostEngine (python-int golden path) against the JaxEngine on circuits
    small enough for host proving — Square (k=4) and Nullifier (k=11)."""
    from halo2tpu.circuits.signal import SquareCircuit
    from halo2tpu.circuits.nullifier import NullifierCircuit
    from halo2tpu.plonk.engine import make_engine
    from halo2tpu.plonk.keygen import keygen
    from halo2tpu.plonk.prover import create_proof
    from halo2tpu.plonk.srs import setup
    from halo2tpu.plonk.verifier import verify_proof

    rows = {}
    photo = bytes((i * 7 + 3) % 256 for i in range(124))
    for name, make in (
            ("square", lambda: (SquareCircuit(5), 4)),
            ("nullifier", lambda: (NullifierCircuit(12345678, photo), 10))):
        c, k = make()
        srs = setup(k)
        pk, vk = keygen(c, k, srs)
        host_eng = make_engine("host", vk.domain, srs)
        t0 = time.perf_counter()
        p1 = create_proof(pk, srs, c, c.instances(), rng_seed=9,
                          engine=host_eng)
        th = time.perf_counter() - t0
        jeng = make_engine("jax", vk.domain, srs)
        create_proof(pk, srs, c, c.instances(), rng_seed=9, engine=jeng)
        t0 = time.perf_counter()
        p2 = create_proof(pk, srs, c, c.instances(), rng_seed=9, engine=jeng)
        tj = time.perf_counter() - t0
        assert p1 == p2, f"{name}: host/jax proof bytes diverge"
        assert verify_proof(vk, srs, c.instances(), p1)
        rows[name] = {"k": k, "host_prove_s": round(th, 4),
                      "jax_prove_s": round(tj, 4), "byte_parity": True}
    RESULTS["host_compare"] = rows


def bench_scaling():
    """1->N device NTT/MSM scaling on a virtual CPU mesh (subprocess: the
    parent process has already pinned the TPU backend)."""
    import subprocess
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    # hard-bound the subprocess to the remaining budget: a cold XLA:CPU
    # compile sweep can take ~18 min and must not starve earlier sections'
    # re-emits (it runs LAST for the same reason)
    limit = max(120, min(900, int(_remaining()) - 30))
    out = subprocess.run(
        [sys.executable, "-m", "halo2tpu.parallel.scaling_report"],
        capture_output=True, text=True, timeout=limit, env=env)
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            RESULTS["scaling"] = json.loads(line)
            return
    raise RuntimeError(f"scaling report failed: {out.stderr[-500:]}")


def _summary_line() -> str:
    """Cumulative summary JSON from whatever RESULTS holds right now."""
    rsa = RESULTS.get("rsa_sha256_proof", {})
    if rsa.get("prove_s"):
        v = rsa["prove_s"]
        line = {"metric": "rsa_sha256_proof_latency", "value": round(v, 3),
                "unit": "s", "vs_baseline": round(RSA_BASELINE_S / v, 2)}
    else:
        sq = RESULTS.get("square_proof", {})
        val = sq.get("prove_s")
        line = {"metric": "square_proof_latency", "value": val, "unit": "s",
                "vs_baseline": (round(0.012089368 / val, 2) if val else None)}
    line["detail"] = RESULTS
    if SKIPPED:
        line["skipped"] = SKIPPED
    if ERRORS:
        line["errors"] = [e.splitlines()[-1] for e in ERRORS]
    return json.dumps(line)


def _emit():
    """Print the current cumulative summary line.  Called after every
    section so a mid-run kill still leaves a complete parseable last line."""
    print(_summary_line(), flush=True)


def _on_term(signum, frame):  # pragma: no cover - signal path
    _log(f"signal {signum}: dumping summary")
    _emit()
    sys.exit(1)


def main():
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    level = os.environ.get("BENCH_LEVEL", "full")
    import jax
    RESULTS["backend"] = jax.default_backend()
    RESULTS["device"] = str(jax.devices()[0])
    _log(f"backend={RESULTS['backend']} level={level} budget={_BUDGET_S:.0f}s")
    _emit()   # a parseable line exists from second zero, whatever happens

    # Order (VERDICT r4 #1): the never-captured composite number runs
    # FIRST among the proof sections; RSA follows and reuses the shared
    # engine (MSM tables + compiled kernels), so its cold cost is small.
    # The cumulative line re-prints after every section, so a harness kill
    # can only erase later sections.
    plan = [("kernels", bench_kernels, 60)]
    if level in ("full", "all"):
        plan.append(("composite", bench_composite_proof, 420))
        plan.append(("rsa", bench_rsa_proof, 150))
    plan.append(("square", bench_square_proof, 90))
    plan.append(("msm_kernel", bench_msm_kernel, 90))
    if level in ("full", "all"):
        plan.append(("soak", bench_soak, 200))
        plan.append(("host_compare", bench_host_compare, 120))
        plan.append(("scaling", bench_scaling, 300))

    for name, fn, need in plan:
        if not _have_time(need, name):
            _emit()
            continue
        # one retry: the axon remote-compile tunnel occasionally drops a
        # response mid-read (INTERNAL: response body closed) — transient
        for attempt in (1, 2):
            try:
                fn()
                break
            except Exception as e:
                ERRORS.append(f"{name} (attempt {attempt}): "
                              f"{type(e).__name__}: {str(e)[:300]}")
                _log(f"ERROR in {name} (attempt {attempt})")
                traceback.print_exc(limit=5)
                if not _have_time(need, f"{name} retry"):
                    break
        _emit()

    _log(f"done in {time.time() - _T0:.1f}s")
    _emit()


if __name__ == "__main__":
    main()
