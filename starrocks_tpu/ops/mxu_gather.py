"""MXU one-hot gather: T[idx] as a Pallas blocked matmul.

XLA lowers a 1-D gather on TPU to ~15ns per index regardless of table size
(measured on v5e: 8M indices = ~125ms even from a 1k-row table) — the
engine's dimension-table joins carry columns through exactly such gathers.
For SMALL tables the MXU is the faster path: build a (TILE_N, TILE_M)
one-hot of the indices in VMEM (never materialized to HBM) and multiply by
the table. bf16 one-hot x bf16 8-bit limbs -> f32 accumulation is exact
(each one-hot row has a single 1; limb values <= 255 are exact in bf16),
so arbitrary u64 lanes move bit-exactly: a u64 lane becomes 8 limb columns,
and the 128-wide MXU tile carries LANES_PER_CALL = 16 lanes per matmul.

Cost model: 2*N*M*128 flops -> at ~200 TF bf16 a gather of 8M indices from
a 4096-row table is ~45ms for SIXTEEN u64 lanes, vs ~125ms per lane for
the XLA gather. The win grows linearly as M shrinks (~5ms at M=512).

The reference has no analog (CPU gathers are cheap); this is pure
TPU-shaped redesign (SURVEY §7 design stance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256          # output rows per grid step (larger tiles measured
#                       no faster but 5-25x slower to Mosaic-compile)
TILE_M = 2048         # table rows per accumulation step
LIMBS = 8             # 8-bit limbs per u64 lane
LANES_PER_CALL = 128 // LIMBS   # u64 lanes one matmul carries
MAX_M = 8192          # tables larger than this use the plain XLA gather


def _kernel(idx_ref, tbl_ref, out_ref, *, tm):
    j = pl.program_id(1)
    # TRANSPOSED one-hot (tm, TILE_N): indices live along the LANE dim
    # (the (TILE_N, 1) layout left every vector op 1-lane wide); the MXU
    # contracts over dim 0 of both operands natively.
    rows = j * tm + jax.lax.broadcasted_iota(
        jnp.int32, (tm, TILE_N), 0)
    oht = (idx_ref[0] == rows).astype(jnp.bfloat16)  # (1,TILE_N) bcast
    part = jax.lax.dot_general(
        oht, tbl_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = part

    @pl.when(j != 0)
    def _():
        out_ref[:] = out_ref[:] + part


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_lanes(tbl: jnp.ndarray, idx: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """tbl: (M, k) uint64 lanes, k <= LANES_PER_CALL; idx: (N,) int32 in
    [0, M). Returns (N, k) uint64 == tbl[idx, :], computed on the MXU."""
    m, k = tbl.shape
    n = idx.shape[0]
    assert k <= LANES_PER_CALL
    tm = max(512, min(TILE_M, 1 << max(m - 1, 1).bit_length()))
    # u64 lane -> 8 bf16 limb columns (values 0..255, exact in bf16)
    shifts = jnp.arange(LIMBS, dtype=jnp.uint64) * 8
    limbs = ((tbl[:, :, None] >> shifts[None, None, :])
             & jnp.uint64(0xFF)).astype(jnp.bfloat16)
    limbs = limbs.reshape(m, k * LIMBS)
    # pad table rows to a TILE_M multiple, limb columns to 128
    mp = -(-m // tm) * tm
    limbs = jnp.pad(limbs, ((0, mp - m), (0, 128 - k * LIMBS)))
    npad = -(-n // TILE_N) * TILE_N
    idx2 = jnp.pad(idx.astype(jnp.int32), (0, npad - n),
                   constant_values=-1).reshape(npad // TILE_N, 1, TILE_N)

    out = pl.pallas_call(
        functools.partial(_kernel, tm=tm),
        grid=(npad // TILE_N, mp // tm),
        in_specs=[
            pl.BlockSpec((1, 1, TILE_N), lambda i, j: (i, j * 0, j * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 128), lambda i, j: (j, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 128), lambda i, j: (i, j * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 128), jnp.float32),
        interpret=interpret,
    )(idx2, limbs)

    # recombine limbs lane-by-lane ((n, k) u64 temps, OR-chained so XLA
    # fuses one pass — a (n, k, 8) u64 intermediate would be 8x the output)
    w = out[:n, :k * LIMBS]
    res = jnp.zeros((n, k), jnp.uint64)
    for l in range(LIMBS):
        res = res | (w[:, l::LIMBS].astype(jnp.uint32).astype(jnp.uint64)
                     << jnp.uint64(8 * l))
    return res


_MXU_OK: dict = {}


def mxu_gather_available() -> bool:
    """One-time probe: does the pallas kernel compile+run on this backend?
    (CPU runs it in interpret mode for tests; unknown backends fall back.)"""
    import numpy as np
    key = "ok"
    if key not in _MXU_OK:
        try:
            with jax.ensure_compile_time_eval():
                t = jnp.arange(16, dtype=jnp.uint64).reshape(8, 2)
                r = np.asarray(gather_lanes(
                    t, jnp.asarray([3, 1, 7], jnp.int32),
                    interpret=jax.default_backend() == "cpu"))
                _MXU_OK[key] = bool(
                    (r == np.asarray(t)[[3, 1, 7], :]).all())
        except Exception:
            _MXU_OK[key] = False
    return _MXU_OK[key]
