"""Wire-protocol parity: a client speaking the reference's protocol
(reactive_db_python_client ClientSync framing + envelopes) runs the
usage_example flow against our server (usage_example.rs:7-52)."""

import json
import socket
import struct
import threading
import uuid

import pytest

from reactivedb_spark import Engine
from reactivedb_spark.networking import ReactiveDBServer


class RefStyleClient:
    """Minimal reimplementation of the reference Python client's wire
    behavior (client.py:18-28) for testing — u32 BE length + JSON."""

    def __init__(self, host, port):
        self.sock = socket.create_connection((host, port))

    def _send(self, obj):
        body = json.dumps(obj).encode()
        self.sock.sendall(struct.pack(">I", len(body)) + body)

    def _recv(self):
        header = self.sock.recv(4, socket.MSG_WAITALL)
        (size,) = struct.unpack(">I", header)
        buf = b""
        while len(buf) < size:
            buf += self.sock.recv(size - len(buf))
        return json.loads(buf.decode())

    def request(self, query):
        rid = str(uuid.uuid4())
        self._send({"Query": {"request_id": rid, "query": query}})
        resp = self._recv()
        assert resp["RequestResponse"]["request_id"] == rid
        return resp["RequestResponse"]["response"]

    def insert(self, table, entry):
        tagged = {}
        for k, v in entry.items():
            if isinstance(v, int):
                tagged[k] = {"Integer": v}
            elif isinstance(v, str):
                tagged[k] = {"Str": v}
        return self.request({"InsertData": {"table": table, "entry": tagged}})

    def find_one(self, table, column, key):
        kv = {"Integer": key} if isinstance(key, int) else {"Str": key}
        return self.request({"FindOne": {"table": table, "column": column, "key": kv}})

    def less_than(self, table, column, key):
        return self.request({"LessThan": {"table": table, "column": column,
                                          "key": {"Integer": key}}})

    def start_listen(self, table, event):
        self._send({"StartListen": {"table_name": table, "event": event}})

    def recv_event(self):
        return self._recv()


USERS_CFG = {
    "tables": [
        {"Source": {"name": "users", "columns": {"name": "Str", "age": "Integer"}}},
        {"Source": {"name": "grades", "columns": {"name": "Str", "grade": "Integer"}}},
        {"Derived": {"name": "unionTest",
                     "transform_definition": {"UnionTransform": {
                         "tables_and_foreign_keys": [["users", "name"], ["grades", "name"]]}}}},
        {"Derived": {"name": "aggregationTest",
                     "transform_definition": {"AggregationTransform": {
                         "source_table": "grades", "aggregated_column": "name",
                         "functions": ["count ~ memo.count + 1.0",
                                       "sum ~ memo.sum + grade",
                                       "average ~ memo.sum/memo.count"]}}}},
    ]
}


@pytest.fixture()
def server(spark, workspace):
    eng = Engine(spark, USERS_CFG, workspace=workspace)
    srv = ReactiveDBServer(eng).start()
    yield srv
    srv.shutdown()


class TestWireProtocol:
    def test_usage_example_flow(self, server):
        c = RefStyleClient(server.host, server.port)
        r = c.insert("users", {"name": "Alex", "age": 22})
        assert "Ok" in r["ManyResults"]
        # insert response includes cascaded derived-table writes (quirk #12)
        tables_touched = r["ManyResults"]["Ok"]
        assert any("matchingKey" in e for e in tables_touched)

        c.insert("grades", {"name": "Alex", "grade": 95})
        one = c.find_one("unionTest", "matchingKey", "Alex")
        entry = one["OneResult"]["Ok"]
        assert entry["age"] == {"Integer": 22}
        assert entry["grade"] == {"Integer": 95}
        assert "_entryId" in entry and "ID" in entry["_entryId"]

        agg = c.find_one("aggregationTest", "aggregatedColumn", "Alex")
        a = agg["OneResult"]["Ok"]
        assert a["sum"] == {"Integer": 95}
        assert a["count"]["Decimal"].startswith("1")

    def test_less_than_and_errors(self, server):
        c = RefStyleClient(server.host, server.port)
        for i in range(5):
            c.insert("grades", {"name": f"u{i}", "grade": i * 10})
        r = c.less_than("grades", "grade", 20)
        rows = r["ManyResults"]["Ok"]
        assert [e["grade"]["Integer"] for e in rows] == [0, 10]  # strict <, ascending
        bad = c.find_one("nope", "x", 1)
        assert "Err" in bad["NoResult"]

    def test_listen_push(self, server):
        listener = RefStyleClient(server.host, server.port)
        listener.start_listen("unionTest", "Insert")
        events = []
        done = threading.Event()

        def pump():
            events.append(listener.recv_event())
            done.set()

        threading.Thread(target=pump, daemon=True).start()
        writer = RefStyleClient(server.host, server.port)
        writer.insert("users", {"name": "Zoe", "age": 30})
        assert done.wait(timeout=60), "no event received"
        ev = events[0]["Event"]
        assert ev["table_name"] == "unionTest" and ev["event"] == "Insert"
        # reference envelope: one Event per commit, ManyResults(Ok([entries]))
        # (listener_hook.rs:74-79)
        entries = ev["value"]["ManyResults"]["Ok"]
        assert len(entries) == 1
        assert entries[0]["matchingKey"] == {"Str": "Zoe"}


class TestWireRobustnessFuzz:
    """VERDICT r11 #5: the server must survive garbage without dying or
    hanging the accept loop — truncated frames, oversized u32 lengths,
    invalid JSON, malformed envelopes, unknown Query variants, mid-frame
    disconnects. Contract: error response (or clean connection drop for
    unresyncable streams), and a subsequent well-formed request always
    answers."""

    @staticmethod
    def _well_formed_still_answers(server):
        c = RefStyleClient(server.host, server.port)
        r = c.find_one("users", "age", 1)
        assert "OneResult" in r
        c.sock.close()

    def test_invalid_json_gets_error_and_connection_survives(self, server):
        s = socket.create_connection((server.host, server.port))
        for garbage in (b"not json at all", b"{truncated", b"\xff\xfe\x00"):
            s.sendall(struct.pack(">I", len(garbage)) + garbage)
            resp = _recv_frame(s)
            assert "Err" in resp["RequestResponse"]["response"]["NoResult"]
        # SAME connection still answers a well-formed request after garbage
        body = json.dumps({"Query": {"request_id": "r1", "query": {
            "FindOne": {"table": "users", "column": "age",
                        "key": {"Integer": 1}}}}}).encode()
        s.sendall(struct.pack(">I", len(body)) + body)
        resp = _recv_frame(s)
        assert resp["RequestResponse"]["request_id"] == "r1"
        s.close()

    def test_oversized_length_is_refused_then_dropped(self, server):
        s = socket.create_connection((server.host, server.port))
        s.sendall(struct.pack(">I", 0xFFFFFFFF))
        resp = _recv_frame(s)
        assert "exceeds cap" in str(resp)
        # the connection is dropped (no resync possible) — read EOF
        assert s.recv(4) == b""
        s.close()
        self._well_formed_still_answers(server)

    def test_mid_frame_disconnect_and_truncated_header(self, server):
        # header only, then disconnect
        s = socket.create_connection((server.host, server.port))
        s.sendall(struct.pack(">I", 100))
        s.close()
        # partial header, then disconnect
        s = socket.create_connection((server.host, server.port))
        s.sendall(b"\x00\x00")
        s.close()
        # partial body, then disconnect
        s = socket.create_connection((server.host, server.port))
        s.sendall(struct.pack(">I", 50) + b'{"Query": {')
        s.close()
        self._well_formed_still_answers(server)

    def test_malformed_envelopes_get_error_responses(self, server):
        s = socket.create_connection((server.host, server.port))
        cases = [
            "[1, 2, 3]",                       # non-object request
            '"just a string"',
            "42",
            "null",
            '{"Nonsense": {}}',                # unknown envelope
            '{"Query": 7}',                    # non-object Query body
            '{"Query": {}}',                   # missing query field
            '{"Query": {"request_id": "x", "query": null}}',
            '{"Query": {"request_id": "x", "query": {"Frobnicate": {}}}}',
            '{"Query": {"request_id": "x", "query": {"FindOne": {}}}}',
            '{"Query": {"request_id": "x", "query": {"FindOne": '
            '{"table": "users", "column": "age", "key": {"Bad": 1}}}}}',
            '{"StartListen": {}}',             # missing fields
            '{"StartListen": 5}',
        ]
        for raw in cases:
            body = raw.encode()
            s.sendall(struct.pack(">I", len(body)) + body)
            resp = _recv_frame(s)
            response = resp["RequestResponse"]["response"]
            assert "Err" in response.get("NoResult", {}), (raw, resp)
        # connection survived all of it
        body = json.dumps({"Query": {"request_id": "ok", "query": {
            "FindOne": {"table": "users", "column": "age",
                        "key": {"Integer": 1}}}}}).encode()
        s.sendall(struct.pack(">I", len(body)) + body)
        resp = _recv_frame(s)
        assert resp["RequestResponse"]["request_id"] == "ok"
        s.close()

    def test_stalled_mid_frame_connections_are_reaped(self, server):
        """VERDICT r12 #6: a valid length prefix followed by silence must
        not hold a handler thread forever. N stalled clients each get an
        error frame + close within the stall bound, and a fresh
        well-formed request still answers."""
        server.stall_timeout = 0.8
        stalled = []
        for i in range(8):
            s = socket.create_connection((server.host, server.port))
            s.sendall(struct.pack(">I", 100))  # declare 100 bytes...
            if i % 2:
                s.sendall(b'{"Qu')  # ...optionally start the body
            stalled.append(s)
        for s in stalled:
            s.settimeout(10)
            msg = _recv_frame(s)  # best-effort error before the drop
            assert "stalled mid-frame" in str(msg)
            assert s.recv(1) == b"", "stalled connection was not closed"
            s.close()
        self._well_formed_still_answers(server)

    def test_partial_header_stall_is_reaped(self, server):
        server.stall_timeout = 0.8
        s = socket.create_connection((server.host, server.port))
        s.sendall(b"\x00\x00")  # 2 of 4 header bytes, then silence
        s.settimeout(10)
        msg = _recv_frame(s)
        assert "stalled mid-frame" in str(msg)
        assert s.recv(1) == b""
        s.close()
        self._well_formed_still_answers(server)

    def test_idle_between_frames_is_never_reaped(self, server):
        """Listen subscribers sit silent for the connection's life; only
        MID-frame silence is a protocol violation."""
        import time

        server.stall_timeout = 0.5
        c = RefStyleClient(server.host, server.port)
        r = c.find_one("users", "age", 1)
        assert "OneResult" in r
        time.sleep(1.6)  # 3× the stall bound, between frames
        r = c.find_one("users", "age", 1)
        assert "OneResult" in r
        c.sock.close()

    def test_random_byte_fuzz_never_kills_the_server(self, server):
        import random

        rng = random.Random(0xBEEF)
        for _i in range(40):
            s = socket.create_connection((server.host, server.port))
            n = rng.randrange(0, 64)
            blob = bytes(rng.randrange(256) for _ in range(n))
            try:
                s.sendall(blob)
            except OSError:
                pass
            s.close()
        self._well_formed_still_answers(server)


def _recv_frame(sock):
    header = sock.recv(4, socket.MSG_WAITALL)
    assert len(header) == 4
    (size,) = struct.unpack(">I", header)
    buf = b""
    while len(buf) < size:
        chunk = sock.recv(size - len(buf))
        assert chunk, "connection closed mid-frame"
        buf += chunk
    return json.loads(buf.decode())
