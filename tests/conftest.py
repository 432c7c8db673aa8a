"""Test environment: CPU backend with 8 virtual devices.

Numerics iterate on the CPU backend (SURVEY.md §9 "Emulated-TPU compile
times"); the 8 virtual devices make the Z-sharded path testable without a
TPU slice (standard JAX trick, SURVEY.md §6 tier 4).

Note: this machine's sitecustomize registers the emulated-TPU ("axon") PJRT
plugin and forces jax_platforms at interpreter start, so setting
JAX_PLATFORMS in the environment is NOT enough — we must override the jax
config after import (and set XLA_FLAGS before the CPU backend initializes).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()


# The monolithic one-process run (`pytest tests/`) used to segfault inside
# XLA CPU compilation after ~156 tests: every jitted function's compiled
# executable stays alive in jax's global pjit/Pallas caches, and several
# hundred accumulated CPU executables eventually die in
# backend_compile_and_load (VERDICT.md r2 weak #1). Dropping the caches at
# module boundaries keeps the live-executable population bounded by one
# module's working set; recompiles across modules cost seconds on CPU.
# tests/run_all.sh (one process per module) remains the belt-and-braces CI
# entry point.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_live_xla_executables():
    yield
    jax.clear_caches()
