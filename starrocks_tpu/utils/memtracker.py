"""Hierarchical memory tracker with limit enforcement.

Analog of the reference's MemTracker tree (be/src/runtime/mem_tracker.h:122:
process -> query pool -> query -> operator, each level with an optional
limit; consumption propagates to ancestors and the first over-limit level
fails the allocation).

TPU-first reduction: device arrays have static shapes, so a query's working
set is knowable from the plan rather than sampled from an allocator hook.
Trackers here account those static footprints — table residency at the
process level, per-query estimates at admission, per-operator output
footprints during profiled execution — and enforce limits by failing the
query BEFORE it dispatches (the reference cancels mid-flight; with
whole-query compiled modules, pre-admission is the only sound cancellation
point)."""

from __future__ import annotations

import threading
from typing import Optional


class MemLimitExceeded(RuntimeError):
    pass


class MemTracker:
    """A node in the tracker tree. consume()/release() propagate to the
    root; consume() raises MemLimitExceeded if any ancestor would exceed
    its limit (and rolls back the partial consumption)."""

    def __init__(self, label: str, limit_bytes: Optional[int] = None,
                 parent: Optional["MemTracker"] = None):
        self.label = label
        self.limit = limit_bytes
        self.parent = parent
        self.children: list[MemTracker] = []
        self.consumption = 0
        self.peak = 0
        self._lock = threading.Lock() if parent is None else parent._lock
        if parent is not None:
            parent.children.append(self)

    def child(self, label: str, limit_bytes: Optional[int] = None
              ) -> "MemTracker":
        return MemTracker(label, limit_bytes, parent=self)

    def _chain(self):
        node = self
        while node is not None:
            yield node
            node = node.parent

    def consume(self, nbytes: int) -> None:
        if nbytes <= 0:
            return
        with self._lock:
            for node in self._chain():
                if node.limit is not None \
                        and node.consumption + nbytes > node.limit:
                    raise MemLimitExceeded(
                        f"mem limit exceeded at {node.label!r}: "
                        f"{node.consumption + nbytes} > limit {node.limit} "
                        f"(requested {nbytes})")
            for node in self._chain():
                node.consumption += nbytes
                node.peak = max(node.peak, node.consumption)

    def try_consume(self, nbytes: int) -> bool:
        try:
            self.consume(nbytes)
            return True
        except MemLimitExceeded:
            return False

    def release(self, nbytes: int) -> None:
        if nbytes <= 0:
            return
        with self._lock:
            for node in self._chain():
                node.consumption = max(0, node.consumption - nbytes)

    def close(self) -> None:
        """Release everything this subtree still holds and detach. The
        tracker stays usable as a standalone node: late release()/consume()
        calls from admissions that still hold a reference (e.g. a resource
        group replaced mid-query) only touch this orphan, never the
        ancestors it already settled with."""
        with self._lock:
            held = self.consumption
            node = self.parent
            while node is not None:
                node.consumption = max(0, node.consumption - held)
                node = node.parent
            self.consumption = 0
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
        self.parent = None

    def render(self, indent: int = 0) -> str:
        lim = f"/{self.limit / 1e6:.0f}MB" if self.limit is not None else ""
        lines = [f"{'  ' * indent}{self.label}: "
                 f"{self.consumption / 1e6:.2f}MB{lim} "
                 f"(peak {self.peak / 1e6:.2f}MB)"]
        for c in self.children:
            lines.append(c.render(indent + 1))
        return "\n".join(lines)


_PROCESS: Optional[MemTracker] = None


def process_tracker() -> MemTracker:
    """Root of the process tree; limit from CONFIG.process_mem_limit_bytes
    (None = unlimited, the reference's mem_limit=90% default needs a real
    allocator to be meaningful under the relay)."""
    global _PROCESS
    if _PROCESS is None:
        from starrocks_tpu.config import CONFIG
        _PROCESS = MemTracker(
            "process", getattr(CONFIG, "process_mem_limit_bytes", None))
    return _PROCESS


def reset_process_tracker() -> None:
    global _PROCESS
    _PROCESS = None
