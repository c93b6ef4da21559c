"""Multi-host distributed runtime (SURVEY M7).

Analog of the reference's cross-node deployment: the FE coordinator
deploying fragments to N BEs over thrift (Deployer.deployFragments,
fe/.../qe/scheduler/Deployer.java:107) plus the bRPC data plane. Here the
control plane is `jax.distributed` (one process per host, a coordinator at
process 0) and the data plane is XLA collectives over ICI/DCN — the same
`shard_map` SPMD programs of parallel/dist.py run unchanged over a GLOBAL
mesh spanning every host's devices.

Launch model (mirrors the reference's "start one BE per node, point them at
the FE"): run the SAME Python program on every host with
  initialize(coordinator_address="host0:port",
             num_processes=N, process_id=this_host_index)
then build the global mesh and place tables. Queries are stateless; failure
recovery = rerun the query on the surviving mesh (SURVEY §5's fail-retry
model; heartbeating is jax.distributed's liveness layer).

Testing: a 2-process CPU-device PseudoCluster (tests/test_multihost.py,
scripts/multihost_worker.py) — the process-level analog of the reference's
in-JVM PseudoCluster (fe/.../pseudocluster/PseudoCluster.java).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.parallel import dist as D
from starrocks_tpu.parallel.dist import AXIS, DistTable


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               local_device_count: Optional[int] = None) -> None:
    """Join the cluster (every host calls this before first backend use)."""
    kw = {}
    if local_device_count is not None:
        kw["local_device_count"] = local_device_count
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def global_mesh() -> Mesh:
    """1-D mesh over every device of every process (ICI within a host/slice,
    DCN across — XLA routes the collectives)."""
    return Mesh(np.array(jax.devices()), (AXIS,))


def place_tables_global(
    tables: dict[str, Table],
    mesh: Mesh,
    partitioning: dict[str, object],
    host_rows: Optional[dict] = None,
) -> dict[str, DistTable]:
    """Multi-host analog of dist.place_tables: build GLOBAL sharded arrays
    via make_array_from_callback. Every process must call this with the same
    (deterministically generated/loaded) host data — each process only
    materializes the row ranges its own devices hold; the callback slices
    per-shard, so a host never uploads another host's rows."""
    ndev = mesh.devices.size
    out = {}
    for name, t in tables.items():
        spec = partitioning.get(name, None)
        host = _to_host(t)
        if spec == "replicated":
            sharding = NamedSharding(mesh, P())
            gt = _make_global(host, sharding, host["__rows__"])
            out[name] = DistTable(gt, None, replicated=True)
        else:
            part = _partition_host(host, spec, ndev)
            sharding = NamedSharding(mesh, P(AXIS))
            gt = _make_global(part, sharding, part["__rows__"])
            out[name] = DistTable(gt, spec, replicated=False)
    return out


def _to_host(t: Table) -> dict:
    cols = {}
    for n, c in t.columns.items():
        cols[n] = (np.asarray(c.data),
                   None if c.valid is None else np.asarray(c.valid),
                   c.dtype, c.dict_id)
    live = np.ones((t.nrows,), bool) if t.live is None else np.asarray(t.live)
    return {"__cols__": cols, "__live__": live, "__rows__": t.nrows}


def _partition_host(host: dict, keys, ndev: int) -> dict:
    """Same layout as dist.partition_table, computed entirely on host."""
    from starrocks_tpu.ops import hashing
    import jax.numpy as jnp
    n = host["__rows__"]
    if keys:
        # hash on device once is wasteful here; reuse the engine hash by
        # evaluating it on a host->device roundtrip of just the key columns
        kcols = [Column(jnp.asarray(host["__cols__"][k][0]),
                        None if host["__cols__"][k][1] is None
                        else jnp.asarray(host["__cols__"][k][1]),
                        host["__cols__"][k][2], host["__cols__"][k][3])
                 for k in keys]
        h = np.asarray(hashing.hash_columns(kcols, seed=0x5151))
        dest = (h % np.uint64(ndev)).astype(np.int64)
    else:
        dest = np.arange(n) % ndev
    order = np.argsort(dest, kind="stable")
    counts = np.bincount(dest, minlength=ndev)
    per = int(counts.max()) if n else 1
    idx = np.full((ndev, per), -1, np.int64)
    starts = np.zeros(ndev + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for d in range(ndev):
        idx[d, : counts[d]] = order[starts[d]:starts[d + 1]]
    flat = idx.reshape(-1)
    ok = flat >= 0
    safe = np.where(ok, flat, 0)
    cols = {}
    for name, (data, valid, dt_, did) in host["__cols__"].items():
        cols[name] = (data[safe], None if valid is None else valid[safe],
                      dt_, did)
    live = host["__live__"][safe] & ok
    return {"__cols__": cols, "__live__": live, "__rows__": ndev * per}


def _make_global(host: dict, sharding, nrows: int) -> Table:
    def arr(a):
        return jax.make_array_from_callback(
            (nrows,) + a.shape[1:], sharding, lambda idx: a[idx])
    cols = {}
    for name, (data, valid, dt_, did) in host["__cols__"].items():
        cols[name] = Column(arr(data),
                            None if valid is None else arr(valid), dt_, did)
    return Table(columns=cols, live=arr(host["__live__"]))


def dist_execute(plan, dist_tables, mesh, max_retries: int = 8) -> Table:
    """Multi-host query execution: exactly dist.dist_execute (the SPMD
    program is process-count-agnostic) with replicate_result=True, so every
    PROCESS holds the full result and can read it locally (a sharded result
    would not be fully addressable from any single host)."""
    return D.dist_execute(plan, dist_tables, mesh, max_retries=max_retries,
                          replicate_result=True)


def run_with_recovery(build_plan, tables, partitioning, meshes,
                      execute=None) -> Table:
    """Whole-query fail-retry (SURVEY §5 failure model): queries are
    stateless, so when execution on a mesh fails (a lost host/device
    surfaces as a runtime error on the first collective), the coordinator
    re-places the tables on the next (surviving, usually smaller) mesh and
    reruns the query from scratch — the analog of the reference's
    HeartbeatMgr evicting a dead BE + the coordinator cancelling and
    redeploying the query (fe/.../system/HeartbeatMgr.java:84,
    qe/DefaultCoordinator cancel/retry).

    build_plan: callable returning a FRESH plan (plan objects carry
    per-mesh jit/capacity caches). meshes: primary first, fallbacks after.

    Only infrastructure-class failures retry (jax runtime/XLA errors — the
    shape a lost device or wedged collective surfaces as). Deterministic
    failures (planner bugs, bad SQL, capacity non-convergence RuntimeError)
    re-raise immediately: re-running those on a smaller mesh would only bury
    the root cause under a misleading "failed on every mesh".
    """
    import logging
    execute = execute or D.dist_execute
    last = None
    retryable = (jax.errors.JaxRuntimeError,)
    from starrocks_tpu.utils import failpoint
    for mesh in meshes:
        try:
            failpoint.hit("multihost.place_tables")
            dtabs = D.place_tables(tables, mesh, partitioning)
            return execute(build_plan(), dtabs, mesh)
        except retryable as e:
            logging.getLogger(__name__).warning(
                "query failed on %d-device mesh (%s: %s); retrying on the "
                "next mesh", mesh.devices.size, type(e).__name__,
                str(e)[:200])
            last = e
            continue
    raise RuntimeError("query failed on every mesh") from last
