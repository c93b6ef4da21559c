"""Failpoint registry — deterministic fault injection for tests.

Analog of the reference's libfiu-style failpoints compiled into the BE
(be/src/util/failpoint/fail_point.h:16,91, toggled at runtime over RPC)
and of PseudoBackend's injectable failure rates
(fe/.../pseudocluster/PseudoBackend.java:231-232). Here: named host-side
trigger points in the executor/coordinator call `hit(name)`; an armed
failpoint raises its configured exception on the chosen occurrence(s).

Arming is programmatic (`activate`) or environment-keyed at import:
  STARROCKS_TPU_FAILPOINTS="exec.op.HashJoin:nth=2:times=1:exc=runtime"
(comma-separated list; `nth` = first triggering call number, 1-based;
`times` = how many consecutive calls raise; `exc` = runtime|jax|value).

Instrumented sites (grow as needed):
  exec.op.<NodeType>      every eager kernel dispatch of that plan node
  dist.execute            each distributed execution attempt (pre-dispatch)
  multihost.place_tables  table placement on a mesh
"""

from __future__ import annotations

import dataclasses
import os
import threading
from typing import Callable, Optional


class FailpointError(RuntimeError):
    """Default injected failure class."""


def _exc_factory(kind: str) -> Callable[[str], BaseException]:
    if kind == "jax":
        import jax
        return lambda name: jax.errors.JaxRuntimeError(
            f"failpoint {name!r} injected device failure")
    if kind == "value":
        return lambda name: ValueError(f"failpoint {name!r} injected")
    return lambda name: FailpointError(f"failpoint {name!r} injected")


@dataclasses.dataclass
class _Point:
    nth: int = 1          # first call (1-based) that raises
    times: int = 1        # how many consecutive calls raise
    count: int = 0        # calls seen so far
    exc: Callable[[str], BaseException] = dataclasses.field(
        default_factory=lambda: _exc_factory("runtime"))


_lock = threading.Lock()
_points: dict[str, _Point] = {}


def activate(name: str, nth: int = 1, times: int = 1,
             exc: Optional[Callable[[str], BaseException]] = None) -> None:
    """Arm `name`: calls nth .. nth+times-1 to hit(name) raise."""
    with _lock:
        _points[name] = _Point(nth=nth, times=times,
                               exc=exc or _exc_factory("runtime"))


def deactivate(name: str) -> None:
    with _lock:
        _points.pop(name, None)


def clear() -> None:
    with _lock:
        _points.clear()


def active() -> dict[str, tuple[int, int, int]]:
    """Snapshot for introspection: name -> (nth, times, count)."""
    with _lock:
        return {n: (p.nth, p.times, p.count) for n, p in _points.items()}


def hit(name: str) -> None:
    """Trigger point. No-op (one dict lookup) unless `name` is armed."""
    if not _points:          # fast path: nothing armed anywhere
        return
    with _lock:
        p = _points.get(name)
        if p is None:
            return
        p.count += 1
        fire = p.nth <= p.count < p.nth + p.times
        exhausted = p.count >= p.nth + p.times - 1
        if exhausted:
            _points.pop(name, None)
    if fire:
        raise p.exc(name)


def _load_env() -> None:
    spec = os.environ.get("STARROCKS_TPU_FAILPOINTS", "")
    for entry in filter(None, (s.strip() for s in spec.split(","))):
        parts = entry.split(":")
        name, opts = parts[0], parts[1:]
        kw: dict = {}
        exc_kind = "runtime"
        for o in opts:
            k, _, v = o.partition("=")
            if k == "exc":
                exc_kind = v
            elif k in ("nth", "times"):
                kw[k] = int(v)
        activate(name, exc=_exc_factory(exc_kind), **kw)


_load_env()
