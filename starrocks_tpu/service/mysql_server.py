"""MySQL wire-protocol front door.

Analog of the reference FE's MysqlServer (fe/.../mysql/MysqlServer.java:55,
accept loop), MysqlProto (handshake/auth), ConnectProcessor.handleQuery
(fe/.../qe/ConnectProcessor.java:315, COM_QUERY dispatch) and
MysqlResultWriter row encoding (be/src/runtime/mysql_result_writer.cpp).

Implements the text protocol subset a standard client needs to run queries:
- HandshakeV10 -> HandshakeResponse41 (auth is accepted unconditionally —
  the engine is single-tenant; the reference's RBAC is out of scope)
- COM_QUERY -> column-definition packets + text-encoded row packets
- COM_PING / COM_INIT_DB / COM_QUIT

Numbers/dates are rendered as their canonical text form (the text protocol
sends every value as a length-encoded string regardless of column type).
"""

from __future__ import annotations

import socket
import struct
import threading

import numpy as np
import pandas as pd

# mysql_com.h constants
CLIENT_PROTOCOL_41 = 0x00000200
CLIENT_SECURE_CONNECTION = 0x00008000
CLIENT_PLUGIN_AUTH = 0x00080000
SERVER_STATUS_AUTOCOMMIT = 0x0002

COM_QUIT, COM_INIT_DB, COM_QUERY, COM_PING = 0x01, 0x02, 0x03, 0x0E

# column types (mysql_com.h enum_field_types)
T_DOUBLE, T_LONGLONG, T_DATE, T_NEWDECIMAL, T_VAR_STRING = 5, 8, 10, 246, 253


def _lenenc_int(n: int) -> bytes:
    if n < 251:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def _lenenc_str(s: bytes) -> bytes:
    return _lenenc_int(len(s)) + s


class _Conn:
    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.seq = 0

    def send(self, payload: bytes):
        self.sock.sendall(struct.pack("<I", len(payload))[:3]
                          + bytes([self.seq & 0xFF]) + payload)
        self.seq += 1

    def recv(self) -> bytes:
        hdr = self._read(4)
        n = int.from_bytes(hdr[:3], "little")
        self.seq = (hdr[3] + 1) & 0xFF
        return self._read(n)

    def _read(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("peer closed")
            buf += chunk
        return buf

    # -- canned packets -----------------------------------------------------
    def ok(self, affected=0, status=SERVER_STATUS_AUTOCOMMIT):
        self.send(b"\x00" + _lenenc_int(affected) + _lenenc_int(0)
                  + struct.pack("<HH", status, 0))

    def err(self, msg: str, errno=1064, state=b"42000"):
        self.send(b"\xff" + struct.pack("<H", errno) + b"#" + state
                  + msg.encode("utf-8")[:400])

    def eof(self, status=SERVER_STATUS_AUTOCOMMIT):
        self.send(b"\xfe" + struct.pack("<HH", 0, status))


def _col_type(s: pd.Series) -> int:
    k = s.dtype.kind
    if k in "iu":
        return T_LONGLONG
    if k == "f":
        return T_DOUBLE
    if k == "M":
        return T_DATE
    return T_VAR_STRING


def _col_def(name: str, ctype: int) -> bytes:
    return (_lenenc_str(b"def") + _lenenc_str(b"") + _lenenc_str(b"")
            + _lenenc_str(b"") + _lenenc_str(name.encode("utf-8"))
            + _lenenc_str(b"") + b"\x0c"
            + struct.pack("<HIBHB", 33, 255, ctype, 0, 31) + b"\x00\x00")


def _cell(v) -> bytes:
    if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
        return b"\xfb"
    if isinstance(v, (np.datetime64, pd.Timestamp)):
        return _lenenc_str(pd.Timestamp(v).strftime("%Y-%m-%d").encode())
    if isinstance(v, (float, np.floating)):
        return _lenenc_str(repr(float(v)).encode())
    return _lenenc_str(str(v).encode("utf-8"))


class MysqlServer:
    """Accept loop on a background thread; one handler thread per client
    (the reference runs an NIO accept loop + ConnectScheduler the same way)."""

    def __init__(self, session, host="127.0.0.1", port=0):
        self.session = session
        self._lock = threading.Lock()
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(16)
        self.port = self._listener.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def shutdown(self):
        self._stop = True
        try:
            self._listener.close()
        except OSError:
            pass

    def _accept_loop(self):
        while not self._stop:
            try:
                sock, _ = self._listener.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(sock,),
                             daemon=True).start()

    # -- per-connection ------------------------------------------------------
    def _handle(self, sock: socket.socket):
        conn = _Conn(sock)
        try:
            self._handshake(conn)
            while True:
                conn.seq = 0
                pkt = conn.recv()
                cmd = pkt[0]
                if cmd == COM_QUIT:
                    return
                if cmd in (COM_PING, COM_INIT_DB):
                    conn.ok()
                    continue
                if cmd == COM_QUERY:
                    self._query(conn, pkt[1:].decode("utf-8"))
                    continue
                conn.err(f"unsupported command {cmd:#x}", errno=1047)
        except (ConnectionError, OSError):
            pass
        finally:
            sock.close()

    def _handshake(self, conn: _Conn):
        caps = (CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION
                | CLIENT_PLUGIN_AUTH)
        nonce = b"abcdefgh" + b"ijklmnopqrst"      # 8 + 12 auth plugin data
        pkt = (b"\x0a" + b"8.0.33-starrocks-tpu\x00"
               + struct.pack("<I", 1)
               + nonce[:8] + b"\x00"
               + struct.pack("<H", caps & 0xFFFF)
               + bytes([33])                        # utf8 charset
               + struct.pack("<H", SERVER_STATUS_AUTOCOMMIT)
               + struct.pack("<H", caps >> 16)
               + bytes([len(nonce) + 1])
               + b"\x00" * 10
               + nonce[8:] + b"\x00"
               + b"mysql_native_password\x00")
        conn.send(pkt)
        conn.recv()           # HandshakeResponse41 — accept any credentials
        conn.ok()

    def _query(self, conn: _Conn, sql: str):
        sql = sql.strip().rstrip(";")
        low = sql.lower()
        # session chatter standard clients emit
        if low.startswith(("set ", "use ")) or low in ("commit", "rollback"):
            conn.ok()
            return
        try:
            with self._lock:
                df = self.session.sql(sql)
        except Exception as e:                      # noqa: BLE001
            conn.err(str(e))
            return
        if df.shape[1] == 0:                        # DDL
            conn.ok()
            return
        conn.send(_lenenc_int(df.shape[1]))
        for name in df.columns:
            conn.send(_col_def(str(name), _col_type(df[name])))
        conn.eof()
        for row in df.itertuples(index=False):
            conn.send(b"".join(_cell(v) for v in row))
        conn.eof()


def serve(session, host="127.0.0.1", port=0) -> MysqlServer:
    return MysqlServer(session, host, port).start()
