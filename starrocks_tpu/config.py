"""Configuration: static engine config + per-session variables.

Analog of StarRocks' three-level config split (SURVEY.md §5):
  - static BE config   (be/src/common/config.h CONF_* registry)
  - runtime-mutable    (CONF_m*, settable via HTTP update_config)
  - per-session vars   (fe/.../qe/SessionVariable.java, shipped to BE)

Here: EngineConfig is process-wide (mutable at runtime via `set_config`),
SessionVariables hang off a Session and thread into the planner/executor.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class EngineConfig:
    # hash table sizing
    capacity_growth_factor: int = 4        # multiplier on overflow retry
    max_capacity_retries: int = 8
    # join
    default_join_fanout: int = 16
    # shuffle
    shuffle_bucket_headroom: float = 2.0   # per-dest capacity multiplier
    # bench/timing
    relay_roundtrip_ms: float = 30.0
    # whole-query warm path: once capacities converge, run the plan as ONE
    # jitted module (pipeline_driver.cpp:246 hot-loop analog) instead of
    # one module per operator — first-order win through a
    # dispatch-latency-bound device link
    enable_whole_query_jit: bool = True
    # small-source row gathers as MXU one-hot matmuls (ops/mxu_gather.py);
    # engaged only on backends where the pallas kernel probes OK
    enable_mxu_gather: bool = True
    # adaptive compaction (eager mode): shrink a table's static shape when a
    # filter proved selective. Costs one live-count readback + one device
    # pass; pays when downstream operators are heavy.
    enable_compaction: bool = True
    compaction_min_rows: int = 1 << 17     # never compact smaller inputs
    compaction_floor: int = 1 << 13        # smallest compacted shape
    # runtime filters (build-side min-max pushed to the probe input,
    # RuntimeMembershipFilter analog, be/src/exprs/runtime_filter.h:1093)
    enable_runtime_filters: bool = True
    # result cache (the query-cache analog, be/src/exec/query_cache/
    # cache_operator.h:42 — whole-result granularity here: immutable
    # bulk-loaded tables make table-version keys exact)
    enable_result_cache: bool = True
    result_cache_max_entries: int = 256
    # admission control: queries beyond this many run concurrently queue at
    # the session front door (the coordinator's query-queue analog,
    # fe/.../qe/scheduler/slot/SlotManager — concurrency slots, not memory
    # slots: device memory is capacity-planned per query here)
    max_concurrent_queries: int = 4
    admission_timeout_s: float = 300.0
    # adaptive DOP (P14 / the reference's group-execution analog,
    # fe/.../qe/scheduler + pipeline adaptive DOP): a mesh-backed session
    # routes a query to SINGLE-chip execution when the bytes it scans fall
    # below this threshold — per-op collective latency dominates tiny
    # queries. 0 disables (default: distributed tests must exercise the
    # mesh path regardless of table size).
    adaptive_dop_min_bytes: int = 0
    # --- distributed execution (parallel/dist.py) ---
    # builds whose GLOBAL row count (shard rows x ndev) exceeds this are
    # hash-shuffled on the join keys instead of broadcast (P4 vs P5; the
    # FE's broadcast-vs-shuffle cost gate, HashJoinCostModel.java)
    dist_broadcast_threshold_rows: int = 1 << 20
    # two-phase aggregates whose per-device partial row count exceeds this
    # use the ppermute-ring shuffle with per-step merge (P12 overlap +
    # bounded memory: never materializes the full shuffled partial table)
    dist_ring_agg_threshold_rows: int = 1 << 22
    # ORDER BY without LIMIT over more global rows than this uses the
    # range-partitioned distributed sort (sample -> splitters -> all_to_all
    # -> local sort) instead of local-sort + gather + final sort
    dist_range_sort_threshold_rows: int = 1 << 16
    # ANALYZE heavy-hitter fraction above which a shuffle join gets salted
    skew_hot_key_fraction: float = 0.3
    # two-phase agg passthrough (aggregator.cpp:770 analog): when estimated
    # groups >= this fraction of global input rows, the local pre-agg won't
    # reduce — shuffle raw rows and aggregate once instead
    dist_preagg_passthrough_ratio: float = 0.5
    # bloom runtime filter (bit array pushed to the probe side,
    # exec/plan.py _rf_kernel; RuntimeMembershipFilter analog)
    enable_bloom_rf: bool = True
    bloom_rf_min_probe_rows: int = 1 << 15  # probe sizes worth the two passes
    bloom_rf_bits_per_key: int = 8          # ~5% fp at k=2 — cheap, resident
    # --- out-of-core streaming (exec/stream.py) ---
    # rows per host->HBM block when a HostTable streams through operators
    stream_block_rows: int = 1 << 21
    # a streamed-build join whose build side exceeds this many rows runs as
    # a radix-PARTITIONED join (P10): both sides hash-partition on the join
    # keys host-side, partitions process one at a time (spiller.h:144
    # partitioned-spill analog — host RAM is the disk tier)
    ooc_partition_build_rows: int = 1 << 22


CONFIG = EngineConfig()


def set_config(**kw):
    """Runtime-mutable config update (update_config_action analog)."""
    for k, v in kw.items():
        if not hasattr(CONFIG, k):
            raise KeyError(f"unknown config {k!r}")
        setattr(CONFIG, k, v)


@dataclasses.dataclass
class SessionVariables:
    """Per-session knobs threaded into planning/execution."""
    enable_distributed: bool = False
    join_fanout: Optional[int] = None      # override default_join_fanout
    broadcast_threshold_rows: int = 1 << 20  # build sides under this broadcast
    est_group_multiplier: float = 1.0      # scale planner group estimates
    query_timeout_s: Optional[float] = None

    def get_fanout(self) -> int:
        return self.join_fanout or CONFIG.default_join_fanout
