"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh (multi-chip sharding is
validated without TPU pod hardware, per SURVEY §4 test strategy); the real
TPU path is exercised by bench.py / __graft_entry__.py.

The ambient environment pins JAX_PLATFORMS=axon and injects a sitecustomize
(via PYTHONPATH) that registers the TPU PJRT plugin at interpreter start,
which locks XLA flag parsing before conftest can request 8 virtual CPU
devices.  So: re-exec pytest once with a scrubbed environment.
"""
import os
import sys

_NEEDS_REEXEC = (os.environ.get("HALO2TPU_TEST_REEXEC") != "1"
                 and "axon" in os.environ.get("JAX_PLATFORMS", ""))

def _cpu_test_flags(flags: str) -> str:
    if "host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    if "xla_backend_optimization_level" not in flags:
        # XLA:CPU compile time dominates the suite (field-arithmetic graphs
        # are huge); codegen quality is irrelevant for correctness tests
        flags += " --xla_backend_optimization_level=0"
    return flags


if not _NEEDS_REEXEC:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["XLA_FLAGS"] = _cpu_test_flags(os.environ.get("XLA_FLAGS", ""))
    # persistent-cache (de)serialization has segfaulted long XLA:CPU test
    # sessions (see fields/jfield.py); compile fresh in-suite instead
    os.environ.setdefault("HALO2TPU_JAX_CACHE", "off")


def _reexec(argv) -> "int":
    import subprocess
    env = dict(os.environ)
    env["HALO2TPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = _cpu_test_flags(env.get("XLA_FLAGS", ""))
    env.setdefault("HALO2TPU_JAX_CACHE", "off")
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and ".axon_site" not in p]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in pp:
        pp.insert(0, repo_root)
    env["PYTHONPATH"] = os.pathsep.join(pp)
    return subprocess.call(
        [sys.executable, "-m", "pytest"] + list(argv), env=env)


def pytest_configure(config):
    if _NEEDS_REEXEC:
        # Re-exec inside pytest_configure (not at import time) so we can
        # suspend pytest's fd-level capture first — otherwise the child's
        # output lands in the parent's capture tempfile and is discarded
        # when we os._exit.
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.suspend_global_capture(in_=True)
        rc = _reexec(config.invocation_params.args)
        os._exit(rc)
    config.addinivalue_line(
        "markers",
        "slow: XLA:CPU compile-heavy test (JaxEngine end-to-end); run with "
        "HALO2TPU_RUN_SLOW=1 — the TPU bench covers these paths on hardware")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    if os.environ.get("HALO2TPU_RUN_SLOW") == "1":
        return
    skip = _pytest.mark.skip(reason="slow (set HALO2TPU_RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
