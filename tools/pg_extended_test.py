#!/usr/bin/env python3
"""Extended-protocol conformance probe against the graft PG server:
Parse/Describe/Bind/Execute/Sync (named statement, $n params), the
error-then-sync skip state machine, Close, and CancelRequest.

Usage: python3 tools/pg_extended_test.py [port]
"""
import socket
import struct
import sys
import time


def msg(typ, payload):
    return typ + struct.pack(">i", len(payload) + 4) + payload


def cstr(s):
    return s.encode() + b"\0"


class Conn:
    def __init__(self, port):
        self.s = socket.create_connection(("127.0.0.1", port))
        body = struct.pack(">i", 196608) + cstr("user") + cstr("tester") + \
            cstr("database") + cstr("main") + b"\0"
        self.s.sendall(struct.pack(">i", len(body) + 4) + body)
        self.buf = b""
        self.key = None
        while True:
            t, p = self.read()
            if t == b"K":
                self.key = struct.unpack(">ii", p)
            if t == b"Z":
                break

    def read(self):
        while len(self.buf) < 5:
            self.buf += self.s.recv(65536)
        t = self.buf[:1]
        (ln,) = struct.unpack(">i", self.buf[1:5])
        while len(self.buf) < 1 + ln:
            self.buf += self.s.recv(65536)
        payload = self.buf[5:1 + ln]
        self.buf = self.buf[1 + ln:]
        return t, payload

    def send(self, *msgs):
        self.s.sendall(b"".join(msgs))

    def drain_until_ready(self):
        out = []
        while True:
            t, p = self.read()
            out.append((t, p))
            if t == b"Z":
                return out


def types_of(msgs):
    return "".join(t.decode() for t, _ in msgs)


def main(port):
    c = Conn(port)
    failures = []

    # 1. named Parse/Describe/Bind/Execute/Sync with $1 param
    c.send(
        msg(b"P", cstr("s1") + cstr("select n_name from nation where n_nationkey = $1") + struct.pack(">h", 0)),
        msg(b"D", b"S" + cstr("s1")),
        msg(b"B", cstr("") + cstr("s1") + struct.pack(">h", 0) + struct.pack(">h", 1)
            + struct.pack(">i", 1) + b"3" + struct.pack(">h", 0)),
        msg(b"E", cstr("") + struct.pack(">i", 0)),
        msg(b"S", b""))
    seq = c.drain_until_ready()
    kinds = types_of(seq)
    # expect: 1 t T 2 D C Z
    ok = kinds == "1tT2DCZ"
    datarows = [p for t, p in seq if t == b"D"]
    val = datarows[0].split(b"\0")[0][6:] if datarows else b""
    print(("PASS" if ok else "FAIL") + f" extended flow: {kinds} row={val}")
    if not ok:
        failures.append("flow")

    # 2. error then skip-until-sync
    c.send(
        msg(b"P", cstr("") + cstr("select * from nosuch_table") + struct.pack(">h", 0)),
        msg(b"B", cstr("") + cstr("") + struct.pack(">hhh", 0, 0, 0)),
        msg(b"E", cstr("") + struct.pack(">i", 0)),
        msg(b"S", b""))
    seq = c.drain_until_ready()
    kinds = types_of(seq)
    ok = kinds.startswith("E") and kinds.endswith("Z") and "2" not in kinds
    print(("PASS" if ok else "FAIL") + f" error-skip: {kinds}")
    if not ok:
        failures.append("error-skip")

    # 3. server recovered: simple query still works
    c.send(msg(b"Q", cstr("select 42 as v")))
    seq = c.drain_until_ready()
    kinds = types_of(seq)
    ok = "T" in kinds and "D" in kinds and "C" in kinds
    print(("PASS" if ok else "FAIL") + f" recover: {kinds}")
    if not ok:
        failures.append("recover")

    # 4. Close statement
    c.send(msg(b"C", b"S" + cstr("s1")), msg(b"S", b""))
    seq = c.drain_until_ready()
    kinds = types_of(seq)
    ok = kinds == "3Z"
    print(("PASS" if ok else "FAIL") + f" close: {kinds}")
    if not ok:
        failures.append("close")

    # 5. per-connection TEMP namespace through the EXTENDED protocol
    # (r14): Parse/Describe must resolve a temp view created on this
    # connection (the old bare-spark Describe path couldn't see the
    # mangled name), and a second connection must NOT see it.
    c.send(msg(b"Q", cstr("create temp view ext_tns as select 11 as y")))
    c.drain_until_ready()
    c.send(
        msg(b"P", cstr("st") + cstr("select y from ext_tns") + struct.pack(">h", 0)),
        msg(b"D", b"S" + cstr("st")),
        msg(b"B", cstr("") + cstr("st") + struct.pack(">hhh", 0, 0, 0)),
        msg(b"E", cstr("") + struct.pack(">i", 0)),
        msg(b"S", b""))
    seq = c.drain_until_ready()
    kinds = types_of(seq)
    datarows = [p for t, p in seq if t == b"D"]
    # DataRow: int16 ncols, int32 len, value bytes — single-column here
    val = datarows[0][6:] if datarows else b""
    ok = kinds == "1tT2DCZ" and val == b"11"
    print(("PASS" if ok else "FAIL") + f" temp-ext flow: {kinds} row={val}")
    if not ok:
        failures.append("temp-ext")
    c2 = Conn(port)
    c2.send(msg(b"Q", cstr("select y from ext_tns")))
    seq2 = c2.drain_until_ready()
    ok = "E" in types_of(seq2)  # other conn: not found
    print(("PASS" if ok else "FAIL") + f" temp-ext private: {types_of(seq2)}")
    if not ok:
        failures.append("temp-ext-private")
    c2.s.close()
    c.send(msg(b"C", b"S" + cstr("st")), msg(b"S", b""))
    c.drain_until_ready()
    c.send(msg(b"Q", cstr("drop view ext_tns")))
    c.drain_until_ready()

    # 6. CancelRequest: fire a slow query, cancel from a second conn
    # data-independent and reliably minutes-long uncancelled
    slow = "select sum(id) from range(20000000000)"
    c.send(msg(b"Q", cstr(slow)))
    time.sleep(1.0)
    s2 = socket.create_connection(("127.0.0.1", port))
    body = struct.pack(">iii", 16, 80877102, 0)[:8] + struct.pack(">ii", *c.key)
    s2.sendall(struct.pack(">i", 16) + struct.pack(">i", 80877102) + struct.pack(">ii", *c.key))
    s2.close()
    t0 = time.time()
    seq = c.drain_until_ready()
    dt = time.time() - t0
    kinds = types_of(seq)
    cancelled = "E" in kinds
    print(("PASS" if cancelled else "FAIL") + f" cancel: {kinds} after {dt:.1f}s")
    if not cancelled:
        failures.append("cancel")

    print("FAILURES:" + ",".join(failures) if failures else "ALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 5433))
