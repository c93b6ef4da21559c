"""Metrics registry + audit log + Prometheus-format endpoint.

Analog of StarRocks' MetricRegistry (be/src/util/metrics.h:61), the
Prometheus text endpoint (be/src/http/action/metrics_action.cpp) and the FE
audit log (fe/.../qe/AuditLogBuilder.java).
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Optional


class MetricRegistry:
    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict[str, float] = {}
        self._gauges: dict[str, float] = {}

    def inc(self, name: str, value: float = 1.0):
        with self._lock:
            self._counters[name] = self._counters.get(name, 0.0) + value

    def set_gauge(self, name: str, value: float):
        with self._lock:
            self._gauges[name] = value

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            return {**self._counters, **self._gauges}

    def prometheus_text(self) -> str:
        lines = []
        with self._lock:
            for name, v in sorted(self._counters.items()):
                lines.append(f"# TYPE starrocks_tpu_{name} counter")
                lines.append(f"starrocks_tpu_{name} {v}")
            for name, v in sorted(self._gauges.items()):
                lines.append(f"# TYPE starrocks_tpu_{name} gauge")
                lines.append(f"starrocks_tpu_{name} {v}")
        return "\n".join(lines) + "\n"


REGISTRY = MetricRegistry()


@dataclasses.dataclass
class AuditRecord:
    ts: float
    sql: str
    wall_ms: float
    rows: int
    ok: bool
    error: Optional[str] = None


class AuditLog:
    def __init__(self, capacity: int = 10_000):
        self._lock = threading.Lock()
        self._records: list[AuditRecord] = []
        self._capacity = capacity

    def record(self, rec: AuditRecord):
        with self._lock:
            self._records.append(rec)
            if len(self._records) > self._capacity:
                self._records = self._records[-self._capacity:]

    def tail(self, n: int = 100) -> list[AuditRecord]:
        with self._lock:
            return list(self._records[-n:])


AUDIT = AuditLog()


def serve_metrics(port: int = 18030, registry: MetricRegistry = REGISTRY,
                  session=None):
    """Start a background HTTP server exposing /metrics (Prometheus text),
    /audit (JSON tail), and — when a Session is given — POST /api/query
    (SQL in the body, JSON rows out: the REST query front door, the analog
    of the reference's HTTP actions next to its MySQL port). Returns the
    server (call .shutdown() to stop)."""
    import http.server
    import json

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            if not self.path.startswith("/api/query") or session is None:
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            sql = self.rfile.read(n).decode("utf-8", "replace")
            try:
                df = session.sql(sql)
                body = json.dumps({
                    "columns": [str(c) for c in df.columns],
                    "rows": json.loads(
                        df.to_json(orient="values", date_format="iso")),
                }).encode()
                code = 200
            except Exception as e:   # surface the engine error as JSON
                body = json.dumps({"error": f"{type(e).__name__}: {e}"}
                                  ).encode()
                code = 400
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/metrics"):
                body = registry.prometheus_text().encode()
                ctype = "text/plain; version=0.0.4"
            elif self.path.startswith("/audit"):
                body = json.dumps([dataclasses.asdict(r) for r in AUDIT.tail()]).encode()
                ctype = "application/json"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


def device_memory_gauges() -> dict:
    """Device memory accounting (the MemTracker hierarchy analog,
    be/src/runtime/mem_tracker.h:122 — static shapes make per-query usage a
    compile-time quantity; this reports the allocator's live view)."""
    import jax
    out = {}
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:                                    # noqa: BLE001
        stats = None
    if stats:
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                out[f"device_{k}"] = float(stats[k])
                REGISTRY.set_gauge(f"device_{k}", float(stats[k]))
    return out


def table_bytes(tables: dict) -> float:
    """Static footprint of registered tables (columns are device arrays of
    known dtype/shape — the 'process mem tracker' level of the hierarchy;
    the axon relay device exposes no allocator stats, so this is the
    host-visible ground truth)."""
    total = 0
    for t in tables.values():
        for c in t.columns.values():
            total += c.data.size * c.data.dtype.itemsize
            if c.valid is not None:
                total += c.valid.size
        live = getattr(t, "live", None)   # HostTable has no live mask
        if live is not None:
            total += live.size
    REGISTRY.set_gauge("tables_bytes", float(total))
    return float(total)
