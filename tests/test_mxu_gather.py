"""MXU one-hot gather kernel (ops/mxu_gather.py) — bit-exactness of u64
lane movement vs numpy, in pallas interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from starrocks_tpu.ops import mxu_gather


@pytest.mark.parametrize("m,n,k", [(8, 64, 1), (100, 3000, 2),
                                   (4096, 5000, 16), (5000, 2000, 3)])
def test_gather_lanes_exact(m, n, k):
    rng = np.random.default_rng(m + n + k)
    tbl = rng.integers(0, 1 << 63, (m, k)).astype(np.uint64)
    tbl |= rng.integers(0, 2, (m, k)).astype(np.uint64) << np.uint64(63)
    idx = rng.integers(0, m, n).astype(np.int32)
    got = np.asarray(mxu_gather.gather_lanes(
        jnp.asarray(tbl), jnp.asarray(idx), interpret=True))
    np.testing.assert_array_equal(got, tbl[idx, :])


def test_availability_probe_cpu():
    # interpret-mode probe path must succeed on CPU without engaging the
    # production gather (column._MXU_GATHER stays False on CPU)
    from starrocks_tpu.column import column
    assert column._MXU_GATHER is False
    assert mxu_gather.mxu_gather_available() in (True, False)
