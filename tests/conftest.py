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

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402
import numpy as np  # noqa: E402

from starrocks_tpu.io import tpch  # noqa: E402


@pytest.fixture(scope="session")
def tpch_raw():
    return tpch.generate(sf=0.01)


@pytest.fixture(scope="session")
def tpch_tables(tpch_raw):
    return tpch.to_tables(tpch_raw)


@pytest.fixture(scope="session")
def tpch_frames(tpch_raw):
    return tpch.to_pandas(tpch_raw)
