"""FLOAT64 bit access that survives backends without 64-bit float bitcasts.

Sort-key normalization (ops/fast_sort.py) and single-transfer result packing
(column._pack_to_bytes) both need the raw bits of float64 columns. On CPU
(and most TPU runtimes) `lax.bitcast_convert_type(f64, u64)` is the obvious
way. Some TPU AOT compile paths, however, reject EVERY bitcast involving
64-bit *float* element types ("While rewriting computation to not contain
X64 element types ... not implemented: bitcast-convert"), while 32-bit
bitcasts and 64-bit *integer* bitcasts compile fine — on those backends f64
is emulated as a (hi, lo) float32 pair (~48-bit effective mantissa, float32
exponent range; values are rounded to that grid at upload already).

This module probes the backend ONCE (a tiny throwaway compile) and then
serves both consumers:

- `order_u64(x)`  -> uint64 codes whose unsigned ascending order equals the
  total order of the stored float values (NULL handling is the caller's).
- `split_pair(x)` -> (hi, lo) float32 arrays with hi64 + lo64 == stored x;
  32-bit bitcasts then move them as bytes. Exact for every finite stored
  value with |x| >= ~2e-31; below that the emulated subtraction flushes the
  subnormal lo component to zero and values resolve to hi (24-bit) precision
  (measured on v5e via the axon remote-compile helper; the stored pair keeps
  the subnormal, arithmetic cannot read it back).

The probe runs at package import (starrocks_tpu/__init__) and wraps its
body in jax.ensure_compile_time_eval(): invoking a jit on concrete arrays
from INSIDE another trace raises in jax 0.9, and the except clause would
silently select the (lossy on real-f64 backends) pair fallback — observed
as ~1e-15-relative perturbation of gathered float columns under pytest.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_F64_BITCAST_OK: Optional[bool] = None


def f64_bitcast_ok() -> bool:
    """Does this backend compile a float64 -> uint64 bitcast? Probed once
    per process with a throwaway 8-element module (one relay round trip on
    remote-compile backends); any failure selects the pair fallback."""
    global _F64_BITCAST_OK
    if _F64_BITCAST_OK is None:
        try:
            with jax.ensure_compile_time_eval():
                np.asarray(jax.lax.bitcast_convert_type(
                    jnp.zeros((8,), jnp.float64), jnp.uint64))
            _F64_BITCAST_OK = True
        except Exception:
            _F64_BITCAST_OK = False
    return _F64_BITCAST_OK


def split_pair(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """float64 array -> (hi, lo) float32 arrays, hi64 + lo64 == stored x
    (see module docstring for the tiny-value caveat). Non-finite x gets
    lo = 0 so hi alone carries the inf/nan."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    lo = jnp.where(jnp.isfinite(x), lo, jnp.float32(0))
    return hi, lo


def merge_pair_np(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """Host-side inverse of split_pair (numpy float64)."""
    r = hi.astype(np.float64) + lo.astype(np.float64)
    z = (hi == 0) & (lo == 0)
    if z.any():  # keep the sign of zero (hi carries it; the add loses -0.0)
        r = np.where(z, np.copysign(0.0, hi.astype(np.float64)), r)
    return r


def _o32(f: jnp.ndarray) -> jnp.ndarray:
    """float32 -> uint32 total-order code (IEEE sign-magnitude flip);
    both zeros map to one code so equal values always compare equal."""
    u = jax.lax.bitcast_convert_type(f, jnp.uint32)
    neg = (u >> jnp.uint32(31)) != 0
    c = jnp.where(neg, ~u, u | jnp.uint32(0x80000000))
    return jnp.where(f == 0, jnp.uint32(0x80000000), c)


def order_u64(x: jnp.ndarray) -> jnp.ndarray:
    """float64 array -> uint64 codes, unsigned ascending == value order."""
    if f64_bitcast_ok():
        bu = jax.lax.bitcast_convert_type(
            x.astype(jnp.float64), jnp.uint64)
        msb = jnp.uint64(1 << 63)
        neg = (bu & msb) != 0
        return jnp.where(neg, ~bu, bu | msb)
    hi, lo = split_pair(x)
    return ((_o32(hi).astype(jnp.uint64) << jnp.uint64(32))
            | _o32(lo).astype(jnp.uint64))
