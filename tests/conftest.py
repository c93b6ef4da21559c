"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run without TPU hardware (mirrors the reference's PseudoCluster approach,
fe/fe-core/src/test/java/com/starrocks/pseudocluster/PseudoCluster.java).

Note: the axon sitecustomize pins JAX_PLATFORMS=axon, so the platform must be
overridden programmatically before first backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# No persistent XLA cache under tests: XLA:CPU caches AOT machine code whose
# feature-set check is unreliable (the loader itself warns about SIGILL on
# mismatch, and pseudo-features like +prefer-no-scatter false-positive even
# same-machine); the r2 suite segfault stack pointed into exactly that
# backend_compile_and_load path. CPU compiles are fast; cache off = hermetic.
os.environ.setdefault("STARROCKS_TPU_COMPILE_CACHE", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402
import numpy as np  # noqa: E402

from starrocks_tpu.io import tpch  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_state():
    """The full suite compiles ~hundreds of distinct XLA:CPU modules in one
    process; past a few hundred the accumulated compile state reproducibly
    segfaults inside backend_compile_and_load (jaxlib 0.9.0, XLA:CPU).
    Dropping compiled executables between test modules bounds that state
    (pytest.ini's xdist workers bound it further per process). Module-scoped
    so intra-module jit reuse (the warm-path tests) is untouched;
    cross-module recompiles are cheap on CPU."""
    import gc
    yield
    jax.clear_caches()
    gc.collect()


# modules that alone compile hundreds of distinct modules (a whole benchmark
# suite per file): clear per TEST, or a single worker process can cross the
# jaxlib compile-state segfault threshold mid-file
_HEAVY_MODULES = {"test_tpcds", "test_distributed", "test_tpch_suite",
                  "test_stream", "test_ssb", "test_sql_tpch"}


@pytest.fixture(autouse=True)
def _bound_compile_state_heavy(request):
    yield
    if getattr(request.module, "__name__", "") in _HEAVY_MODULES:
        import gc
        jax.clear_caches()
        gc.collect()


@pytest.fixture(scope="session")
def tpch_raw():
    return tpch.generate(sf=0.01)


@pytest.fixture(scope="session")
def tpch_tables(tpch_raw):
    return tpch.to_tables(tpch_raw)


@pytest.fixture(scope="session")
def tpch_frames(tpch_raw):
    return tpch.to_pandas(tpch_raw)
