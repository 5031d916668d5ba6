"""Test harness: run all JAX tests on a virtual 8-device CPU mesh.

Multi-chip sharding (tests/test_parallel.py) needs several devices; real TPU
hardware is single-chip in CI, so tests force the CPU backend with 8 virtual
devices. The environment may pin JAX_PLATFORMS (e.g. to a TPU relay) via
sitecustomize, so we must both set the env *and* override jax.config after
import — all before any backend is initialized.
"""

import os

if os.environ.get("HG_TEST_TPU", "") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running tests"
    )
    config.addinivalue_line(
        "markers",
        "needs_devices(n): skip when the active backend has fewer than n "
        "devices (e.g. the full suite on a single real TPU chip)",
    )


def pytest_collection_modifyitems(config, items):
    import jax
    import pytest

    # `slow` tests (multi-process pods, interpret-mode dense-capacity
    # kernel sweeps, multi-Mbp tiling) run in the TPU lane
    # (HG_TEST_TPU=1), on HG_TEST_SLOW=1, or via an explicit -m
    # expression; the default CPU lane skips them so `pytest tests/ -q`
    # stays a <15-min iteration loop (r4 verdict item 7)
    run_slow = (
        os.environ.get("HG_TEST_TPU") == "1"
        or os.environ.get("HG_TEST_SLOW") == "1"
        or bool(config.getoption("-m"))
    )
    have = jax.device_count()
    for item in items:
        m = item.get_closest_marker("needs_devices")
        if m and have < m.args[0]:
            item.add_marker(pytest.mark.skip(
                reason=f"needs {m.args[0]} devices, backend has {have}"
            ))
        if not run_slow and item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.skip(
                reason="slow lane: set HG_TEST_SLOW=1 / HG_TEST_TPU=1 "
                       "or pass -m slow"
            ))
