"""Arrow Flight front door.

Analog of the reference's Arrow Flight SQL endpoint
(be/src/service/service_be/arrow_flight_sql_service.h, result path
be/src/service/arrow_flight/...): clients submit SQL and stream the result
back as Arrow record batches — the zero-copy path for bulk result return
(vs row-encoded MySQL packets).

Protocol shape (simplified Flight-SQL):
- `get_flight_info(descriptor)` with the SQL UTF-8 encoded either as the
  command payload or as a single path element -> FlightInfo carrying the
  REAL output schema (derived by tracing the cached plan with
  jax.eval_shape — no execution, no device work) and a ticket that is the
  SQL itself.
- `do_action("prepare", sql)` -> handle; `get_flight_info`/`do_get` accept
  `prepared:<handle>` (the CommandStatementQuery/prepared-statement shape
  of the reference's Flight SQL endpoint, arrow_flight_sql_service.h).
- `do_get(ticket)` executes the query on the Session and streams the
  result table, cast to the advertised schema.
- `do_action("register_parquet", "name=path")` side door for bulk load.
"""

from __future__ import annotations

import itertools
import threading

import pyarrow as pa
import pyarrow.flight as flight


def _arrow_type(dtype):
    """Engine DataType -> the arrow type its pandas decoding produces
    (Column.to_numpy: strings decode to utf8 objects, decimals to float64,
    dates to datetime64[D])."""
    from starrocks_tpu.column.dtypes import TypeKind
    if dtype.is_string:
        return pa.string()
    if dtype.is_decimal:
        return pa.float64()
    k = dtype.kind
    if k is TypeKind.DATE:
        return pa.date32()
    if k is TypeKind.FLOAT64:
        return pa.float64()
    if k is TypeKind.INT32:
        return pa.int32()
    if k is TypeKind.BOOL:
        return pa.bool_()
    return pa.int64()


def plan_arrow_schema(plan, tables) -> pa.Schema:
    """Output schema of a plan WITHOUT executing it: jax.eval_shape traces
    the whole program to abstract values; the Column pytree's static dtype
    metadata survives, so names + engine types fall out. The reference's
    Flight SQL endpoint likewise returns real schemas at get_flight_info
    time (be/src/service/service_be/arrow_flight_sql_service.h)."""
    import jax

    from starrocks_tpu.exec.plan import ExecContext

    out = jax.eval_shape(lambda tabs: plan.run(ExecContext(tabs, {})),
                         tables)
    return pa.schema([
        pa.field(name, _arrow_type(col.dtype))
        for name, col in out.columns.items()])


class EngineFlightServer(flight.FlightServerBase):
    def __init__(self, session, location: str = "grpc://127.0.0.1:0"):
        super().__init__(location)
        self.session = session
        self._lock = threading.Lock()   # Session is not thread-safe
        self._prepared: dict[str, str] = {}
        self._handle_counter = itertools.count(1)

    # -- helpers -------------------------------------------------------------
    def _sql_of(self, descriptor: flight.FlightDescriptor) -> str:
        if descriptor.command:
            return self._resolve(descriptor.command.decode("utf-8"))
        if descriptor.path:
            return self._resolve(descriptor.path[0].decode("utf-8"))
        raise flight.FlightServerError("descriptor carries no SQL")

    def _resolve(self, text: str) -> str:
        if text.startswith("prepared:"):
            handle = text[len("prepared:"):]
            sql = self._prepared.get(handle)
            if sql is None:
                raise flight.FlightServerError(
                    f"unknown prepared handle {handle!r}")
            return sql
        return text

    def _schema_of(self, sql: str):
        """Real output schema at info time; None when the plan cannot be
        abstractly traced (host-finalized nodes, e.g. group_concat)."""
        try:
            with self._lock:
                plan = self.session.plan(sql)
                return plan_arrow_schema(plan, self.session.tables)
        except Exception:
            return None

    def _run(self, sql: str, schema=None) -> pa.Table:
        with self._lock:
            df = self.session.sql(sql)
        if schema is not None:
            try:
                return pa.Table.from_pandas(df, schema=schema,
                                            preserve_index=False)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                pass
        return pa.Table.from_pandas(df, preserve_index=False)

    # -- Flight API ----------------------------------------------------------
    def get_flight_info(self, context, descriptor):
        sql = self._sql_of(descriptor)
        schema = self._schema_of(sql)   # also surfaces syntax errors here
        ticket = flight.Ticket(sql.encode("utf-8"))
        endpoint = flight.FlightEndpoint(ticket, [])
        return flight.FlightInfo(schema if schema is not None
                                 else pa.schema([]),
                                 descriptor, [endpoint], -1, -1)

    def get_schema(self, context, descriptor):
        sql = self._sql_of(descriptor)
        schema = self._schema_of(sql)
        return flight.SchemaResult(schema if schema is not None
                                   else pa.schema([]))

    def do_get(self, context, ticket):
        sql = self._resolve(ticket.ticket.decode("utf-8"))
        return flight.RecordBatchStream(
            self._run(sql, schema=self._schema_of(sql)))

    def do_action(self, context, action):
        if action.type == "register_parquet":
            name, path = action.body.to_pybytes().decode("utf-8").split("=", 1)
            with self._lock:
                self.session.load_parquet(name, path)
            return iter([flight.Result(b"ok")])
        if action.type == "prepare":
            sql = action.body.to_pybytes().decode("utf-8")
            with self._lock:
                self.session.plan(sql)          # validate + cache the plan
            handle = str(next(self._handle_counter))
            self._prepared[handle] = sql
            return iter([flight.Result(handle.encode("utf-8"))])
        if action.type == "close_prepared":
            self._prepared.pop(
                action.body.to_pybytes().decode("utf-8"), None)
            return iter([flight.Result(b"ok")])
        if action.type == "sql":   # fire-and-forget DDL
            with self._lock:
                self.session.sql(action.body.to_pybytes().decode("utf-8"))
            return iter([flight.Result(b"ok")])
        raise flight.FlightServerError(f"unknown action {action.type!r}")

    def list_flights(self, context, criteria):
        for name, t in self.session.tables.items():
            desc = flight.FlightDescriptor.for_path(name.encode())
            schema = pa.schema([
                pa.field(c, _arrow_type(col.dtype))
                for c, col in t.columns.items()])
            yield flight.FlightInfo(schema, desc, [],
                                    getattr(t, "nrows", -1), -1)


def serve(session, port: int = 0) -> EngineFlightServer:
    """Start a Flight server on a background thread; returns the server
    (server.port gives the bound port)."""
    server = EngineFlightServer(session, f"grpc://127.0.0.1:{port}")
    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    return server
