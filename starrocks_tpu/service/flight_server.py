"""Arrow Flight front door.

Analog of the reference's Arrow Flight SQL endpoint
(be/src/service/service_be/arrow_flight_sql_service.h, result path
be/src/service/arrow_flight/...): clients submit SQL and stream the result
back as Arrow record batches — the zero-copy path for bulk result return
(vs row-encoded MySQL packets).

Protocol shape (simplified Flight-SQL):
- `get_flight_info(descriptor)` with the SQL UTF-8 encoded either as the
  command payload or as a single path element -> FlightInfo carrying a
  ticket that is the SQL itself.
- `do_get(ticket)` executes the query on the Session and streams the
  result table.
- `do_action("register_parquet", "name=path")` side door for bulk load.
"""

from __future__ import annotations

import threading

import pyarrow as pa
import pyarrow.flight as flight


class EngineFlightServer(flight.FlightServerBase):
    def __init__(self, session, location: str = "grpc://127.0.0.1:0"):
        super().__init__(location)
        self.session = session
        self._lock = threading.Lock()   # Session is not thread-safe

    # -- helpers -------------------------------------------------------------
    def _sql_of(self, descriptor: flight.FlightDescriptor) -> str:
        if descriptor.command:
            return descriptor.command.decode("utf-8")
        if descriptor.path:
            return descriptor.path[0].decode("utf-8")
        raise flight.FlightServerError("descriptor carries no SQL")

    def _run(self, sql: str) -> pa.Table:
        with self._lock:
            df = self.session.sql(sql)
        return pa.Table.from_pandas(df, preserve_index=False)

    # -- Flight API ----------------------------------------------------------
    def get_flight_info(self, context, descriptor):
        sql = self._sql_of(descriptor)
        # plan (cached) to surface syntax errors at info time, like the
        # reference's prepare step
        with self._lock:
            self.session.plan(sql)
        ticket = flight.Ticket(sql.encode("utf-8"))
        endpoint = flight.FlightEndpoint(ticket, [])
        # schema is only known after execution for this engine; advertise
        # an empty schema (clients learn the real one from the stream)
        return flight.FlightInfo(pa.schema([]), descriptor, [endpoint], -1, -1)

    def do_get(self, context, ticket):
        sql = ticket.ticket.decode("utf-8")
        return flight.RecordBatchStream(self._run(sql))

    def do_action(self, context, action):
        if action.type == "register_parquet":
            name, path = action.body.to_pybytes().decode("utf-8").split("=", 1)
            with self._lock:
                self.session.load_parquet(name, path)
            return iter([flight.Result(b"ok")])
        if action.type == "sql":   # fire-and-forget DDL
            with self._lock:
                self.session.sql(action.body.to_pybytes().decode("utf-8"))
            return iter([flight.Result(b"ok")])
        raise flight.FlightServerError(f"unknown action {action.type!r}")

    def list_flights(self, context, criteria):
        for name in self.session.tables:
            desc = flight.FlightDescriptor.for_path(name.encode())
            yield flight.FlightInfo(pa.schema([]), desc, [], -1, -1)


def serve(session, port: int = 0) -> EngineFlightServer:
    """Start a Flight server on a background thread; returns the server
    (server.port gives the bound port)."""
    server = EngineFlightServer(session, f"grpc://127.0.0.1:{port}")
    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    return server
