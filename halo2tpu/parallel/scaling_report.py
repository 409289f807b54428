"""1 -> N device scaling report for the sharded NTT and MSM (BASELINE.md
scaling row; SURVEY §5.7-5.8).

Run standalone under a virtual CPU mesh (the in-tree substitute for a real
pod slice — real multi-chip hardware is exercised through the same
GSPMD/shard_map path):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m halo2tpu.parallel.scaling_report

Prints ONE JSON line:
    {"devices": [1,2,4,8], "ntt": {...}, "msm": {...}}
with per-device-count median step seconds and parallel efficiency
(t_1 / (N * t_N)).  bench.py shells out to this under BENCH_LEVEL=all.

Virtual CPU devices share the same host cores, so CPU-mesh "efficiency"
validates the sharding mechanics + collective layout, not absolute speedup.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _median_time(fn, iters=3, warmup=1):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def run_report(dev_counts=(1, 2, 4, 8), ntt_k=14, msm_n=1 << 10) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ..curves.jpoint import affine_to_device
    from ..curves import g1 as G1
    from ..fields.bn254 import G1_GEN, R, fr_root_of_unity
    from ..fields.jfield import FR, ints_to_limbs
    from .msm import sharded_bit_partials
    from .ntt import make_sharded_ntt

    devs = jax.devices()
    dev_counts = [d for d in dev_counts if d <= len(devs)]
    rng = np.random.default_rng(0)

    # shared inputs
    n = 1 << ntt_k
    n1 = n2 = 1 << (ntt_k // 2)
    omega = fr_root_of_unity(ntt_k)
    vals = [int.from_bytes(rng.bytes(31), "big") % R for _ in range(256)]
    x_mat = jnp.tile(
        jnp.asarray(ints_to_limbs([v * FR.r % R for v in vals])),
        (n // 256, 1)).reshape(n1, n2, 16)

    base = G1.scalar_mul(G1_GEN, 7)
    pts = [base]
    for _ in range(63):
        pts.append(G1.add(pts[-1], G1_GEN))
    pts = (pts * (msm_n // 64))[:msm_n]
    points = affine_to_device(pts)
    scalars = ints_to_limbs(
        [int.from_bytes(rng.bytes(31), "big") % R for _ in range(msm_n)]
    ).reshape(1, msm_n, 16).astype(np.uint32)
    scalars = jnp.asarray(scalars)

    report = {"devices": dev_counts, "backend": jax.default_backend(),
              "ntt": {}, "msm": {}}
    for nd in dev_counts:
        mesh = Mesh(np.array(devs[:nd]), ("shard",))
        ntt = make_sharded_ntt(mesh, n1, n2, omega)
        report["ntt"][str(nd)] = round(_median_time(lambda: ntt(x_mat)), 5)
        fw = 128
        run_msm = lambda: sharded_bit_partials(  # noqa: E731
            mesh, points, scalars, fold_width=fw)
        report["msm"][str(nd)] = round(_median_time(run_msm), 5)

    for key in ("ntt", "msm"):
        t1 = report[key].get("1")
        if t1:
            report[key + "_efficiency"] = {
                d: round(t1 / (int(d) * t), 3)
                for d, t in report[key].items()}
    return report


if __name__ == "__main__":
    ks = int(os.environ.get("SCALING_NTT_K", "14"))
    print(json.dumps(run_report(ntt_k=ks)))
    sys.stdout.flush()
