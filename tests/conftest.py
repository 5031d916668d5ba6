"""Test harness: run all JAX tests on a virtual 8-device CPU mesh.

Multi-chip sharding (tests/test_parallel.py) needs several devices; real TPU
hardware is single-chip in CI, so tests force the CPU backend with 8 virtual
devices. Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
