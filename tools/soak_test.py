#!/usr/bin/env python3
"""Many-connection soak (VERDICT r14 Next #2): the reference's bar is
"concurrent read and write query from multiple clients" (README.md:27);
everything concurrent before r15 was 2-3 connections. This drives
16-32 TRUE-PARALLEL clients for minutes across every surface at once:

  - per-connection TEMP namespace churn (same-named temp tables/views/
    sequences on every client — privacy asserted on every read)
  - transactions on client-private persistent tables (committed-row
    accounting: the invariant tolerates serialization aborts because
    each client writes only its own key range)
  - rename dances (ALTER RENAME + rename-back, sometimes transactional)
  - COPY FROM STDIN (the CopyIn wire path) into temp AND persistent
    targets
  - ClickHouse HTTP clients on the pooled executor (per-request temp
    release asserted: request 2 must NOT see request 1's temp table)
  - cancels: a long query killed via CancelRequest using the conn's
    BackendKeyData; the connection must survive and stay correct

Invariant screens at exit: every client's private row count matches its
committed-insert tally; no __tmpc leak in information_schema; no soak
temp object visible to a fresh connection; the server still answers.
A watchdog fails the run if any client makes no progress for 90 s
(deadlock screen for the sorted-lock discipline at high fan-in).

Usage: python3 tools/soak_test.py [pg_port] [ch_port] [n_clients]
                                  [seconds] [seed]
"""
import random
import struct
import sys
import threading
import time
import urllib.request
import urllib.parse

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
from txn_fuzz import PgSession, _msg, _cstr  # noqa: E402


class SoakSession(PgSession):
    """PgSession + BackendKeyData capture + CopyIn support."""

    def __init__(self, port, user="soak"):
        self.key = None
        super().__init__(port, user)

    def _drain(self):
        msgs = super()._drain()
        for t, p in msgs:
            if t == b"K" and len(p) >= 8:
                self.key = struct.unpack(">ii", p[:8])
        return msgs

    def copy_in(self, sql, lines):
        """COPY … FROM STDIN over the simple protocol: Q → G(CopyIn),
        then CopyData/CopyDone, then CommandComplete + Z."""
        self.s.sendall(_msg(b"Q", _cstr(sql)))
        # read until CopyInResponse or error
        err = None
        while True:
            t, p = self._read()
            if t == b"G":
                break
            if t == b"E":
                fields = {c[:1]: c[1:] for c in p.split(b"\0") if c}
                err = fields.get(b"M", b"?").decode("utf-8", "replace")
            if t == b"Z":
                return err or "no CopyInResponse"
        data = ("\n".join(lines) + "\n").encode()
        self.s.sendall(_msg(b"d", data))
        self.s.sendall(_msg(b"c", b""))
        for t, p in iter(self._read, None):
            if t == b"E":
                fields = {c[:1]: c[1:] for c in p.split(b"\0") if c}
                err = fields.get(b"M", b"?").decode("utf-8", "replace")
            if t == b"Z":
                return err

    def cancel(self, port):
        if not self.key:
            return
        import socket as _s
        c = _s.create_connection(("127.0.0.1", port))
        # CancelRequest: int32 len=16, int32 code, int32 pid, int32 secret
        c.sendall(struct.pack(">iiii", 16, 80877102, self.key[0], self.key[1]))
        c.close()


class Client(threading.Thread):
    def __init__(self, cid, pg_port, seed, stop_at, stats):
        super().__init__(daemon=True)
        self.cid = cid
        self.pg_port = pg_port
        self.r = random.Random(seed * 1000 + cid)
        self.stop_at = stop_at
        self.stats = stats
        self.errors = []
        self.committed = 0          # rows durably inserted into my range
        self.next_k = cid * 10_000_000
        self.ops = 0
        self.last_progress = time.time()

    def fail(self, msg):
        self.errors.append(f"[c{self.cid}] {msg}")

    def expect_ok(self, s, sql):
        rows, err, _ = s.query(sql)
        if err:
            self.fail(f"{sql[:80]} -> {err[:120]}")
        return rows

    # ---- actions -------------------------------------------------
    def act_temp(self, s):
        r = self.r
        s.query("create temp table if not exists soak_tmp (k int, tag int)")
        n = r.randint(1, 5)
        vals = ", ".join(f"({i}, {self.cid})" for i in range(n))
        self.expect_ok(s, f"insert into soak_tmp values {vals}")
        rows, err, _ = s.query("select distinct tag from soak_tmp")
        if err:
            return self.fail(f"temp read: {err[:120]}")
        tags = {t for t in rows}
        if tags - {str(self.cid)}:
            self.fail(f"TEMP LEAK: saw tags {tags}")
        if r.random() < 0.5:
            s.query("create or replace temp view soak_v as "
                    "select count(*) as n, max(tag) as t from soak_tmp")
            rows, err, _ = s.query("select t from soak_v")
            if not err and rows and rows[0] not in ("", str(self.cid)):
                self.fail(f"TEMP VIEW LEAK: {rows[0]}")
        if r.random() < 0.3:
            s.query("drop table soak_tmp")
        if r.random() < 0.1:
            s.query("discard all")

    def act_txn(self, s):
        r = self.r
        t = f"main.soak_c{self.cid}"
        n = r.randint(1, 4)
        ks = [self.next_k + i for i in range(n)]
        self.next_k += n
        vals = ", ".join(f"({k}, {self.cid})" for k in ks)
        if r.random() < 0.5:
            _, err, _ = s.query(f"insert into {t} values {vals}")
            if err:
                return self.fail(f"autocommit insert: {err[:120]}")
            self.committed += n
            return
        _, err, _ = s.query("begin")
        if err:
            return self.fail(f"begin: {err[:120]}")
        _, err, _ = s.query(f"insert into {t} values {vals}")
        if err:
            s.query("rollback")
            return self.fail(f"txn insert: {err[:120]}")
        # in-txn visibility of my own write
        rows, err, _ = s.query(f"select count(*) from {t}")
        if not err and rows and int(rows[0]) < n:
            self.fail(f"txn self-visibility: {rows[0]} < {n}")
        if r.random() < 0.7:
            _, err, _ = s.query("commit")
            if err is None:
                self.committed += n
            # a serialization abort is acceptable behavior, not a find:
            # the rows just don't count
        else:
            s.query("rollback")

    def act_rename(self, s):
        t = f"main.soak_c{self.cid}"
        tmp = f"main.soak_c{self.cid}_r"
        if self.r.random() < 0.3:
            for sql in ("begin", f"alter table {t} rename to {tmp}",
                        f"alter table {tmp} rename to {t}", "commit"):
                _, err, _ = s.query(sql)
                if err:
                    s.query("rollback")
                    return self.fail(f"txn rename: {sql[:50]} -> {err[:120]}")
        else:
            _, e1, _ = s.query(f"alter table {t} rename to {tmp}")
            if e1:
                return self.fail(f"rename: {e1[:120]}")
            _, e2, _ = s.query(f"alter table {tmp} rename to {t}")
            if e2:
                return self.fail(f"rename-back: {e2[:120]}")

    def act_copy(self, s):
        r = self.r
        n = r.randint(2, 6)
        if r.random() < 0.5:
            s.query("create temp table if not exists soak_cp (k int, tag int)")
            err = s.copy_in("copy soak_cp from stdin with csv",
                            [f"{i},{self.cid}" for i in range(n)])
            if err:
                return self.fail(f"copy temp: {err[:120]}")
            rows, e2, _ = s.query("select distinct tag from soak_cp")
            if not e2 and {t for t in rows} - {str(self.cid)}:
                self.fail("COPY TEMP LEAK")
        else:
            t = f"main.soak_c{self.cid}"
            ks = [self.next_k + i for i in range(n)]
            self.next_k += n
            err = s.copy_in(f"copy {t} from stdin with csv",
                            [f"{k},{self.cid}" for k in ks])
            if err:
                return self.fail(f"copy persistent: {err[:120]}")
            self.committed += n

    def act_read(self, s):
        sqls = [
            "select count(*) from lineitem where l_quantity > 25",
            "select n_name, count(*) from nation group by n_name order by 1 limit 3",
            "select table_name from information_schema.tables "
            "where table_name like 'soak%' and table_name like '%tmpc%'",
        ]
        sql = self.r.choice(sqls)
        rows = self.expect_ok(s, sql)
        if sql.startswith("select table_name") and rows:
            self.fail(f"mangled temp visible in catalog: {rows[:3]}")

    def act_macro(self, s):
        # one SHARED persistent macro name churned by every client
        # (CREATE OR REPLACE races on the engine's macro map): a call
        # must always see SOME client's definition — x + cid with cid
        # in range. Temp macro and session variable are private by the
        # namespace mangle; any foreign value is a leak.
        r = self.r
        a = r.randint(1, 9)
        s.query(f"create or replace macro soak_m(x) as x + {self.cid}")
        rows, err, _ = s.query(f"select soak_m({a})")
        if err:
            return self.fail(f"macro call: {err[:120]}")
        if rows and not (a <= int(rows[0]) <= a + 100):
            self.fail(f"macro result out of range: {rows[0]}")
        s.query(f"create or replace temp macro soak_tm(x) as x * 1000 + {self.cid}")
        rows, err, _ = s.query("select soak_tm(2)")
        if not err and rows and rows[0] != str(2000 + self.cid):
            self.fail(f"TEMP MACRO LEAK: {rows[0]}")
        s.query(f"set variable soak_var = {self.cid}")
        rows, err, _ = s.query("select getvariable('soak_var')")
        if not err and rows and rows[0] != str(self.cid):
            self.fail(f"VARIABLE LEAK: {rows[0]}")

    def act_cancel(self, s):
        # fire a long query, cancel it from the side, verify the conn
        # survives and still computes correctly
        done = {}

        def run():
            done["r"] = s.query(
                "select count(*) from range(3000000000) where id % 7 = 0")
        th = threading.Thread(target=run, daemon=True)
        th.start()
        time.sleep(0.2)
        s.cancel(self.pg_port)
        th.join(timeout=30)
        if th.is_alive():
            return self.fail("cancel: query thread stuck >30s")
        rows = self.expect_ok(s, "select 41 + 1")
        if rows is not None and rows != ["42"]:
            self.fail(f"post-cancel conn broken: {rows}")

    # ---- main loop -----------------------------------------------
    def run(self):
        try:
            s = SoakSession(self.pg_port, user=f"soak{self.cid}")
        except Exception as e:
            return self.fail(f"connect: {e}")
        self.expect_ok(
            s, f"create table if not exists main.soak_c{self.cid} "
               "(k int primary key, tag int) using parquet")
        acts = ([self.act_temp] * 4 + [self.act_txn] * 5 +
                [self.act_rename] * 1 + [self.act_copy] * 2 +
                [self.act_read] * 2 + [self.act_macro] * 2)
        while time.time() < self.stop_at and len(self.errors) < 5:
            a = self.r.choice(acts)
            try:
                a(s)
            except Exception as e:
                self.fail(f"{a.__name__}: {type(e).__name__} {e}")
                break
            self.ops += 1
            self.last_progress = time.time()
            if self.ops % 50 == 0 and self.r.random() < 0.3:
                self.act_cancel(s)
        # final accounting on MY private table
        rows, err, _ = s.query(f"select count(*) from main.soak_c{self.cid}")
        if err:
            self.fail(f"final count: {err[:120]}")
        elif int(rows[0]) != self.committed:
            self.fail(f"ACCOUNTING: table has {rows[0]}, committed {self.committed}")
        s.query(f"drop table main.soak_c{self.cid}")
        s.close()
        self.stats[self.cid] = self.ops


class ChClient(threading.Thread):
    """Stateless HTTP client against the CH endpoint's pooled threads:
    per-request temp-release is the invariant (r14 ChServer:77)."""

    def __init__(self, cid, ch_port, stop_at, stats):
        super().__init__(daemon=True)
        self.cid = cid
        self.ch_port = ch_port
        self.stop_at = stop_at
        self.stats = stats
        self.errors = []
        self.ops = 0
        self.last_progress = time.time()

    def q(self, sql, data=None):
        url = f"http://127.0.0.1:{self.ch_port}/?query=" + urllib.parse.quote(sql)
        req = urllib.request.Request(url, data=data, method="POST")
        import base64
        req.add_header("Authorization", "Basic " +
                       base64.b64encode(b"soak:soakpw").decode())
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.read().decode()

    def run(self):
        while time.time() < self.stop_at and len(self.errors) < 5:
            try:
                out = self.q("select 40 + 2")
                if out.strip() != "42":
                    self.errors.append(f"[ch{self.cid}] select: {out[:80]}")
                # a temp table created in THIS request must be invisible
                # to the NEXT request even on the same pooled thread
                self.q("create temp table soak_ch (k int)")
                try:
                    leak = self.q("select count(*) from soak_ch")
                    self.errors.append(f"[ch{self.cid}] CH TEMP LEAK: {leak[:60]}")
                except Exception:
                    pass  # TABLE_OR_VIEW_NOT_FOUND is the correct outcome
                self.ops += 1
                self.last_progress = time.time()
            except Exception as e:
                self.errors.append(f"[ch{self.cid}] {type(e).__name__} {e}")
                break
        self.stats[f"ch{self.cid}"] = self.ops


def main():
    pg = int(sys.argv[1]) if len(sys.argv) > 1 else 5433
    ch = int(sys.argv[2]) if len(sys.argv) > 2 else 8124
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    secs = int(sys.argv[4]) if len(sys.argv) > 4 else 120
    seed = int(sys.argv[5]) if len(sys.argv) > 5 else 151515
    stop_at = time.time() + secs
    stats = {}
    # CH HTTP requires basic auth against the engine's user registry
    boot = SoakSession(pg, user="soakboot")
    boot.query("create user soak with password 'soakpw'")
    boot.close()
    pgs = [Client(i, pg, seed, stop_at, stats) for i in range(n - 4)]
    chs = [ChClient(i, ch, stop_at, stats) for i in range(4)]
    clients = pgs + chs
    for c in clients:
        c.start()
    # watchdog: no client may stall >90s while the run is live
    stalled = []
    while any(c.is_alive() for c in clients):
        time.sleep(5)
        now = time.time()
        for c in clients:
            if c.is_alive() and now - c.last_progress > 90:
                stalled.append(f"client {getattr(c, 'cid', '?')} stalled "
                               f"{now - c.last_progress:.0f}s (ops={c.ops})")
        if stalled:
            break
        if now > stop_at + 120:
            stalled.append("clients failed to wind down within 120s of stop")
            break
    for c in clients:
        c.join(timeout=30)

    errors = [e for c in clients for e in c.errors] + stalled
    # post-run screens on a fresh connection
    try:
        s = SoakSession(pg, user="soakpost")
        rows, err, _ = s.query(
            "select table_name from information_schema.tables "
            "where table_name like '%tmpc%' or table_name like 'soak_c%'")
        if err:
            errors.append(f"post catalog: {err[:120]}")
        elif rows:
            errors.append(f"post catalog leftovers: {rows[:5]}")
        rows, err, _ = s.query("select count(*) from nation")
        if err or rows != ["25"]:
            errors.append(f"post sanity: {rows} {err}")
        s.close()
    except Exception as e:
        errors.append(f"post connect: {e}")

    total_ops = sum(stats.values())
    print(f"soak: {n} clients, {secs}s, {total_ops} ops "
          f"({', '.join(f'{k}:{v}' for k, v in sorted(stats.items(), key=str))})")
    if errors:
        print(f"soak: {len(errors)} FINDINGS")
        for e in errors[:40]:
            print("  " + e)
        sys.exit(1)
    print("soak: 0 findings")


if __name__ == "__main__":
    main()
