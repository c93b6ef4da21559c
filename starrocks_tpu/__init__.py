"""starrocks_tpu — a TPU-native vectorized SQL query-execution engine.

Functionally modeled on StarRocks' C++ backend (reference: /root/reference,
see SURVEY.md), re-designed from scratch for TPU hardware:

- Columnar data lives as fixed-shape JAX device arrays (the analog of
  StarRocks `Chunk`/`Column`, be/src/column/chunk.h:50, column.h:41).
- Strings are dictionary-encoded to int32 codes at load time (the analog of
  StarRocks' global low-cardinality dict optimization,
  be/src/runtime/global_dict/), so every kernel operates on fixed-width ints.
- Decimals are fixed-point int64 (TPC-H decimals are scale<=2), giving exact
  arithmetic; wide sums use dual-limb int64 accumulation.
- Operators (filter / hash aggregate / hash join / sort) are pure functions
  over Table pytrees, compiled by XLA; filters produce selection *masks*
  rather than compacting (static shapes), compaction happens only at result
  extraction or before shuffle.
- Distribution is SPMD: tables hash-partitioned over a jax.sharding.Mesh,
  shuffle = lax.all_to_all / psum_scatter inside shard_map (the analog of the
  bRPC exchange, be/src/exec/pipeline/exchange/exchange_sink_operator.cpp:492).
"""

import os

import jax

# Exact integer/decimal arithmetic needs int64; TPC-H aggregates need the
# headroom. TPU emulates int64 with 2x int32 ops; hot paths drop to int32
# where value ranges allow.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: query plans recompile only on shape/plan
# changes across processes (the analog of the reference's prepared-fragment
# reuse; TPU XLA compiles are seconds-scale, so this matters for latency).
#
# The cache directory is keyed by a host fingerprint (machine arch + CPU
# feature flags): XLA:CPU caches AOT machine code, and loading artifacts
# compiled on a host with different vector features is undefined behavior —
# the loader itself warns "could lead to execution errors such as SIGILL",
# and a stale cross-machine cache reproducibly segfaulted the test suite
# inside backend_compile_and_load.


def _machine_tag() -> str:
    import hashlib
    import platform
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = line
                    break
    except OSError:
        pass
    raw = platform.machine() + ":" + feats
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


def _cache_subdir() -> str:
    """TPU executables are device code — portable across hosts with the
    same jax/libtpu, so they key by backend+version and live IN THE REPO
    (committed): a fresh container starts with every benchmark module
    already compiled, the analog of the reference shipping prepared
    fragments. XLA:CPU artifacts are host machine code (the SIGILL hazard
    above), so CPU keeps the per-host tag."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        return f"tpu-{jax.__version__}"
    return _machine_tag()


_IN_REPO_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache")
_cache_dir = os.environ.get("STARROCKS_TPU_COMPILE_CACHE", "")
if not _cache_dir:
    _sub = _cache_subdir()
    _cache_dir = (_IN_REPO_CACHE if _sub.startswith("tpu-") else
                  os.path.join(os.path.expanduser("~"), ".cache",
                               "starrocks_tpu_xla"))
if _cache_dir != "0":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_cache_dir, _cache_subdir()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Resolve the float64-bitcast capability probe BEFORE any engine tracing:
# the probe compiles a tiny throwaway module, which must happen outside jit
# (ops/float_bits.py docstring).
from starrocks_tpu.ops import float_bits as _float_bits  # noqa: E402

_float_bits.f64_bitcast_ok()

# Probe the MXU one-hot gather kernel (TPU backends only: on CPU the
# pallas kernel would need interpret mode, slower than the plain gather).
if jax.default_backend() not in ("cpu",):
    try:
        from starrocks_tpu.ops import mxu_gather as _mxu_gather
        from starrocks_tpu.column import column as _column

        _column._MXU_GATHER = _mxu_gather.mxu_gather_available()
    except Exception:
        pass

__version__ = "0.1.0"
