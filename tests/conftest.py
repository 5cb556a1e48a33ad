"""Test harness config.

The suite runs on CPU with 8 virtual devices (the distributed tests exercise
shard_map/all-to-all logic without a pod — SURVEY.md §4.4). Pallas kernels run
in interpreter mode on CPU; the same tests run compiled on a real TPU when one
is present and TPUSORT_TEST_TPU=1 is set.
"""

import os
import sys

# Must be set before jax import. FORCE cpu (not setdefault): the session env
# may carry JAX_PLATFORMS=axon (the TPU tunnel), and initializing that backend
# from every test process is slow — and hangs the whole suite in
# make_c_api_client when the tunnel is down. Hardware runs opt in explicitly.
if os.environ.get("TPUSORT_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("TPUSORT_TEST_TPU") != "1":
    # The env var alone is not enough: the image's sitecustomize registers
    # the axon PJRT plugin at interpreter start and switches jax_platforms
    # to "axon,cpu"; a config.update here (before any backend init) wins,
    # keeping the suite off the tunnel entirely.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)  # 64-bit keys are first-class here.

import pytest  # noqa: E402


# Fast representative lane (VERDICT r4 #8a: the full suite exceeds 40 min on
# the CPU sandbox; CI needs a <5 min gate). Module wall-times measured
# 2026-08-20 on this sandbox; keep the sum under ~250 s.
_SMOKE_MODULES = {
    "test_twiddle",        # 11 s — key-ordering bijections, the correctness root
    "test_docs_truth",     # 7 s — pinned config/docs constants
    "test_sort_oracle",    # 60 s — end-to-end sort vs numpy oracles
    "test_operators",      # 18 s — one test per operator family
    "test_tiles",          # 14 s — in-row rank/sort kernel math
    "test_thrust_layer",   # 48 s — L5 API surface
    "test_dsort",          # 90 s — distributed sort on the CPU-8 mesh
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "smoke: fast representative lane (`pytest -m smoke`, <5 min on CPU)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.purebasename in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """The full suite in one process segfaulted (~60% in) with hundreds of
    cached executables across 8 virtual devices; per-module cache clearing
    bounds the growth (the halves always passed in isolation)."""
    yield
    jax.clear_caches()
