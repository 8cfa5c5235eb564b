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

    # 5b. BINARY result formats (r15b): Bind with result-format 1 — the
    # pgx-default path. One query covering every binary codec family:
    # int4/int8/float8/bool/text/numeric/date/timestamp/text[]; decode
    # each cell with the PG wire layouts and compare exact values.
    sql_bin = ("select 7 as i4, cast(40000000000 as bigint) as i8, "
               "cast(2.5 as double) as f8, true as b, 'hi' as s, "
               "cast(-1234.56 as decimal(10,2)) as num, "
               "date '2024-03-15' as d, "
               "timestamp '2024-03-15 12:30:45' as ts, "
               "array('a', 'b,c') as arr")
    c.send(
        msg(b"P", cstr("sb") + cstr(sql_bin) + struct.pack(">h", 0)),
        msg(b"B", cstr("") + cstr("sb") + struct.pack(">h", 0) + struct.pack(">h", 0)
            + struct.pack(">h", 1) + struct.pack(">h", 1)),  # 1 result fmt: binary
        msg(b"D", b"P" + cstr("")),
        msg(b"E", cstr("") + struct.pack(">i", 0)),
        msg(b"S", b""))
    seq = c.drain_until_ready()
    row = next((p for t, p in seq if t == b"D"), None)
    rowdesc = next((p for t, p in seq if t == b"T"), None)
    ok = row is not None and rowdesc is not None
    if ok:
        # RowDescription format fields must echo the requested binary
        ncols = struct.unpack(">h", rowdesc[:2])[0]
        off, fmts_seen = 2, []
        for _ in range(ncols):
            end = rowdesc.index(b"\0", off)
            fmts_seen.append(struct.unpack(">h", rowdesc[end + 17:end + 19])[0])
            off = end + 19
        ok = all(f == 1 for f in fmts_seen)
        # decode DataRow cells
        cells, off = [], 2
        n = struct.unpack(">h", row[:2])[0]
        for _ in range(n):
            ln = struct.unpack(">i", row[off:off + 4])[0]
            off += 4
            cells.append(None if ln < 0 else row[off:off + ln])
            off += ln if ln > 0 else 0
        i4 = struct.unpack(">i", cells[0])[0]
        i8 = struct.unpack(">q", cells[1])[0]
        f8 = struct.unpack(">d", cells[2])[0]
        bv = cells[3] == b"\x01"
        sv = cells[4].decode()
        nd, w, sign, dscale = struct.unpack(">hhhh", cells[5][:8])
        digits = [struct.unpack(">h", cells[5][8 + 2 * k:10 + 2 * k])[0] for k in range(nd)]
        numv = sum(d * (10000 ** (w - k)) for k, d in enumerate(digits))
        if sign == 0x4000:
            numv = -numv
        import datetime
        dv = datetime.date(2000, 1, 1) + datetime.timedelta(days=struct.unpack(">i", cells[6])[0])
        tsv = datetime.datetime(2000, 1, 1) + datetime.timedelta(
            microseconds=struct.unpack(">q", cells[7])[0])
        a = cells[8]
        ndim, hasnull, eloid, alen, lb = struct.unpack(">iiiii", a[:20])
        aoff, elems = 20, []
        for _ in range(alen):
            eln = struct.unpack(">i", a[aoff:aoff + 4])[0]
            aoff += 4
            elems.append(a[aoff:aoff + eln].decode())
            aoff += eln
        ok = ok and i4 == 7 and i8 == 40000000000 and f8 == 2.5 and bv \
            and sv == "hi" and abs(numv - (-1234.56)) < 1e-9 and str(dv) == "2024-03-15" \
            and str(tsv) == "2024-03-15 12:30:45" and ndim == 1 and eloid == 25 \
            and elems == ["a", "b,c"]
    print(("PASS" if ok else "FAIL") + " binary result formats")
    if not ok:
        failures.append("binary-results")
    c.send(msg(b"C", b"S" + cstr("sb")), msg(b"S", b""))
    c.drain_until_ready()

    # 5c. BINARY param values with declared OIDs (r15b): pgx declares
    # param OIDs at Parse and sends binary — a float8 is 8 bytes like
    # an int8, only the OID disambiguates. $1 float8=2.5, $2 date=
    # 2000-01-02 (day 1 of the PG epoch), $3 numeric=-12.75.
    c.send(
        msg(b"P", cstr("sp") + cstr("select $1 * 2 as v, $2 as d, $3 as n")
            + struct.pack(">h", 3) + struct.pack(">iii", 701, 1082, 1700)),
        msg(b"B", cstr("") + cstr("sp")
            + struct.pack(">h", 1) + struct.pack(">h", 1)     # all params binary
            + struct.pack(">h", 3)
            + struct.pack(">i", 8) + struct.pack(">d", 2.5)
            + struct.pack(">i", 4) + struct.pack(">i", 1)
            + struct.pack(">i", 12) + struct.pack(">hhhh", 2, 0, 0x4000, 2)
            + struct.pack(">hh", 12, 7500)
            + struct.pack(">h", 0)),                          # results: text
        msg(b"E", cstr("") + struct.pack(">i", 0)),
        msg(b"S", b""))
    seq = c.drain_until_ready()
    row = next((p for t, p in seq if t == b"D"), None)
    ok = row is not None
    if ok:
        cells, off = [], 2
        n = struct.unpack(">h", row[:2])[0]
        for _ in range(n):
            ln = struct.unpack(">i", row[off:off + 4])[0]
            off += 4
            cells.append(None if ln < 0 else row[off:off + ln].decode())
            off += max(0, ln)
        ok = cells[0] == "5.0" and cells[1] == "2000-01-02" and cells[2] == "-12.75"
        if not ok:
            print(f"  binary-param cells: {cells}")
    print(("PASS" if ok else "FAIL") + " binary param values by declared OID")
    if not ok:
        failures.append("binary-params")
    c.send(msg(b"C", b"S" + cstr("sp")), msg(b"S", b""))
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
