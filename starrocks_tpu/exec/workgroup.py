"""Resource groups: multi-tenant admission with per-group quotas.

Analog of the reference's workgroups / resource groups
(be/src/exec/workgroup/work_group.h; FE DDL + classifiers in
fe/fe-core/src/main/java/com/starrocks/catalog/ResourceGroup.java and
ResourceGroupClassifier.java): named groups carry a concurrency limit, a
memory quota, and a per-query ("big query") memory cap; classifiers route
each query to a group by user and query type.

TPU-first reduction of the knobs: the reference's cpu_core_limit shapes a
worker-thread scheduler that has no analog here (one chip runs one fused
module at a time; XLA owns intra-chip parallelism), so the enforced levers
are the ones that matter on this runtime — `concurrency_limit` (per-group
admission semaphore, layered under the process-wide gate),
`mem_limit_bytes` (a MemTracker child of the process tracker, charged with
each admitted query's static plan estimate), and `big_query_mem_bytes`
(rejects a single over-sized query outright, the reference's
big_query_mem_limit). Enforcement happens at admission: with whole-query
compiled modules the plan's working set is a static quantity, so failing
before dispatch replaces the reference's mid-flight cancellation.
"""

from __future__ import annotations

import dataclasses
import re
import threading
from typing import Optional

from starrocks_tpu.utils.memtracker import (MemLimitExceeded, MemTracker,
                                            process_tracker)


@dataclasses.dataclass
class ResourceGroup:
    name: str
    concurrency_limit: Optional[int] = None
    mem_limit_bytes: Optional[int] = None
    big_query_mem_bytes: Optional[int] = None
    users: tuple = ()                # classifier: exact user names
    query_types: tuple = ()          # classifier: "select" | "insert" | "ddl"

    def matches(self, user: Optional[str], query_type: str) -> int:
        """Classifier specificity score; -1 = no match (ResourceGroup
        Classifier.java weighs user > query_type)."""
        score = 0
        if self.users:
            if user not in self.users:
                return -1
            score += 2
        if self.query_types:
            if query_type not in self.query_types:
                return -1
            score += 1
        return score


class _GroupState:
    def __init__(self, group: ResourceGroup, parent: MemTracker):
        self.group = group
        self.sem = (threading.BoundedSemaphore(group.concurrency_limit)
                    if group.concurrency_limit else None)
        self.tracker = parent.child(f"group:{group.name}",
                                    group.mem_limit_bytes)
        self.running = 0
        self._rlock = threading.Lock()   # guards the `running` gauge

    def bump(self, delta: int) -> None:
        with self._rlock:
            self.running += delta


class WorkGroupManager:
    """Registry + admission. One per process (the reference's
    WorkGroupManager singleton, work_group.h)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._groups: dict[str, _GroupState] = {}

    def create(self, group: ResourceGroup, replace: bool = False,
               if_not_exists: bool = False) -> None:
        """Register a group. Duplicate names raise unless `if_not_exists`
        (no-op) or `replace` (swap). A replaced group's tracker is closed so
        its reservation leaves the process tracker; in-flight admissions
        hold a reference to the old _GroupState and release against it
        harmlessly (release on a closed tracker is a no-op decrement)."""
        with self._lock:
            old = self._groups.get(group.name)
            if old is not None:
                if if_not_exists:
                    return
                if not replace:
                    raise ValueError(f"resource group {group.name!r} exists")
            self._groups[group.name] = _GroupState(group, process_tracker())
        if old is not None:
            old.tracker.close()

    def drop(self, name: str) -> None:
        with self._lock:
            st = self._groups.pop(name, None)
        if st is not None:
            st.tracker.close()

    def get(self, name: str) -> Optional[ResourceGroup]:
        with self._lock:
            st = self._groups.get(name)
            return st.group if st else None

    def list(self) -> list:
        with self._lock:
            return [st.group for st in self._groups.values()]

    def classify(self, user: Optional[str], query_type: str
                 ) -> Optional[str]:
        """Most specific matching group's name (None = ungoverned)."""
        best, best_score = None, -1
        with self._lock:
            items = [(name, st.group) for name, st in self._groups.items()]
        for name, group in items:
            s = group.matches(user, query_type)
            if s > best_score:
                best, best_score = name, s
        return best if best_score >= 0 else None

    def admit(self, name: Optional[str], est_bytes: int,
              timeout_s: float = 30.0) -> "_Admission":
        """Admission token for a query charged `est_bytes` against the
        group's quota; raises on big-query rejection, concurrency timeout,
        or group-memory exhaustion. The group state is snapshotted under
        the manager lock; the (possibly long) semaphore wait happens
        outside it."""
        with self._lock:
            st = self._groups.get(name) if name is not None else None
        if st is None:
            return _Admission(None, 0)
        g = st.group
        if g.big_query_mem_bytes is not None \
                and est_bytes > g.big_query_mem_bytes:
            from starrocks_tpu.utils.metrics import REGISTRY
            REGISTRY.inc("wg_big_query_rejected_total")
            raise MemLimitExceeded(
                f"query estimate {est_bytes} exceeds group {g.name!r} "
                f"big_query_mem_bytes={g.big_query_mem_bytes}")
        if st.sem is not None and not st.sem.acquire(timeout=timeout_s):
            from starrocks_tpu.utils.metrics import REGISTRY
            REGISTRY.inc("wg_concurrency_rejected_total")
            raise RuntimeError(
                f"resource group {g.name!r}: >{g.concurrency_limit} "
                f"queries in flight for {timeout_s}s")
        try:
            st.tracker.consume(est_bytes)
        except MemLimitExceeded:
            if st.sem is not None:
                st.sem.release()
            from starrocks_tpu.utils.metrics import REGISTRY
            REGISTRY.inc("wg_mem_rejected_total")
            raise
        st.bump(1)
        return _Admission(st, est_bytes)


class _Admission:
    def __init__(self, state: Optional[_GroupState], est_bytes: int):
        self._state = state
        self._bytes = est_bytes

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        st = self._state
        if st is not None:
            st.tracker.release(self._bytes)
            if st.sem is not None:
                st.sem.release()
            st.bump(-1)
        return False


MANAGER = WorkGroupManager()


def plan_mem_estimate(plan, tables: dict) -> int:
    """Static working-set estimate for admission: bytes of every base table
    the plan scans (an upper bound on resident inputs; operator outputs are
    bounded by the same order under the engine's capacity model)."""
    from starrocks_tpu.exec.plan import Scan
    total, seen = 0, set()
    for node in plan.walk():
        if isinstance(node, Scan) and node.table not in seen:
            seen.add(node.table)
            t = tables.get(node.table)
            if t is None:
                continue
            cols = (t.columns.values() if node.columns is None
                    else [t.columns[c] for c in node.columns
                          if c in t.columns])
            for c in cols:
                total += c.data.size * c.data.dtype.itemsize
                if c.valid is not None:
                    total += c.valid.size
    return total


# -- DDL front-end -----------------------------------------------------------

_CREATE = re.compile(
    r"(?is)^create\s+resource\s+group\s+(if\s+not\s+exists\s+)?(\w+)"
    r"(?:\s+to\s*\(([^)]*)\))?\s*with\s*\(([^)]*)\)$")
_DROP = re.compile(r"(?is)^drop\s+resource\s+group\s+(?:if\s+exists\s+)?(\w+)$")
_SHOW = re.compile(r"(?is)^show\s+resource\s+groups?$")


def _kv(body: str) -> dict:
    out = {}
    for part in body.split(","):
        part = part.strip()
        if not part:
            continue
        k, _, v = part.partition("=")
        out[k.strip().strip("'\"").lower()] = v.strip().strip("'\"")
    return out


def match_ddl(text: str):
    """('create', ResourceGroup, if_not_exists) | ('drop', name) |
    ('show',) | None."""
    s = text.strip().rstrip(";")
    m = _CREATE.match(s)
    if m:
        ine = m.group(1) is not None
        name, cls_body, props = m.group(2), m.group(3) or "", m.group(4)
        cls = _kv(cls_body)
        kv = _kv(props)
        users = tuple(u.strip() for u in cls.get("user", "").split("|")
                      if u.strip())
        qtypes = tuple(q.strip().lower()
                       for q in cls.get("query_type", "").split("|")
                       if q.strip())
        g = ResourceGroup(
            name=name,
            concurrency_limit=(int(kv["concurrency_limit"])
                               if "concurrency_limit" in kv else None),
            mem_limit_bytes=(int(float(kv["mem_limit_bytes"]))
                             if "mem_limit_bytes" in kv else None),
            big_query_mem_bytes=(int(float(kv["big_query_mem_bytes"]))
                                 if "big_query_mem_bytes" in kv else None),
            users=users, query_types=qtypes)
        return ("create", g, ine)
    m = _DROP.match(s)
    if m:
        return ("drop", m.group(1))
    if _SHOW.match(s):
        return ("show",)
    return None
