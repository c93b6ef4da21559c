"""Protocol front doors: how external clients reach the engine.

The reference exposes three: the MySQL wire protocol (fe/.../mysql/
MysqlServer.java:55), HTTP REST (fe/.../http), and Arrow Flight SQL
(be/src/service/service_be/arrow_flight_sql_service.h). The TPU engine
mirrors all three host-side: `mysql_server` (wire protocol over a Session),
`flight_server` (pyarrow.flight), and the metrics/audit HTTP endpoints in
utils/metrics.py.
"""
