"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh (multi-chip sharding is
validated without TPU pod hardware, per SURVEY §4 test strategy); the real
TPU path is exercised by bench.py / __graft_entry__.py.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
