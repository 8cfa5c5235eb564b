#!/usr/bin/env python3
"""Transaction differential fuzzer: random BEGIN/DML/COMMIT/ROLLBACK
scripts replayed statement-by-statement on ONE persistent server
connection and on an embedded DuckDB connection (DuckDB's explicit
transactions follow the same PG semantics the server implements:
statement error aborts the block, COMMIT of an aborted block acts as
ROLLBACK). After every statement the fuzzer compares (a) ok/fail
status, (b) the table contents as the transaction's own connection
sees them, and (c) with some probability the contents as a SECOND
connection sees them (isolation: base state until COMMIT — DuckDB
side uses a cursor, which has an independent transaction context).

A second mode fuzzes two interleaved server transactions against two
CONCURRENT DuckDB cursors replaying the identical statement sequence —
a true differential against the reference engine's row-level MVCC
(since r12 the engine commutes disjoint-key rewrites the same way).
Serialization-class failures on either side only mark the schedule
divergent (conflict TIMING differs by design: DuckDB conflicts at
statement time, the engine at read/COMMIT time, and the engine is more
conservative for unattributable rewrites); cleanly-committed schedules
are compared statement-by-statement and on final content.

A third mode races parent-deletes against child-appends under a
FOREIGN KEY and asserts the committed state never contains orphans.

A fourth mode (r14) fires TRUE-PARALLEL threads: a non-txn CREATE
TABLE AS racing a COMMIT that publishes a rename chain or swap cycle
onto the same name — invariant-checked (the window the r13b
CREATE-lock closed; DuckDB has no equivalent window to differential
against).

Usage: python3 tools/txn_fuzz.py [port] [n_scripts] [seed]
"""
import random
import re
import socket
import struct
import sys
import time

import duckdb

from dialect_probe import run_duck, norm


# ------------------------------------------------- persistent PG client

def _msg(typ, payload):
    return typ + struct.pack(">i", len(payload) + 4) + payload


def _cstr(s):
    return s.encode() + b"\0"


class PgSession:
    """Minimal simple-query client over one persistent connection."""

    def __init__(self, port, user="txnfuzz"):
        self.s = socket.create_connection(("127.0.0.1", port))
        body = struct.pack(">i", 196608) + _cstr("user") + _cstr(user) + \
            _cstr("database") + _cstr("main") + b"\0"
        self.s.sendall(struct.pack(">i", len(body) + 4) + body)
        self.buf = b""
        self._drain()

    def _read(self):
        while len(self.buf) < 5:
            d = self.s.recv(65536)
            if not d:
                raise ConnectionError("server closed")
            self.buf += d
        t = self.buf[:1]
        (ln,) = struct.unpack(">i", self.buf[1:5])
        while len(self.buf) < 1 + ln:
            self.buf += self.s.recv(65536)
        payload = self.buf[5:1 + ln]
        self.buf = self.buf[1 + ln:]
        return t, payload

    def _drain(self):
        msgs = []
        while True:
            t, p = self._read()
            msgs.append((t, p))
            if t == b"Z":
                return msgs

    def query(self, sql):
        """Returns (rows_as_pipe_joined_text, err, txn_status)."""
        self.s.sendall(_msg(b"Q", _cstr(sql)))
        rows, err, status = [], None, "I"
        for t, p in self._drain():
            if t == b"D":
                (n,) = struct.unpack(">h", p[:2])
                off, cells = 2, []
                for _ in range(n):
                    (l,) = struct.unpack(">i", p[off:off + 4])
                    off += 4
                    if l == -1:
                        cells.append("")
                    else:
                        cells.append(p[off:off + l].decode("utf-8", "replace"))
                        off += l
                rows.append("|".join(cells))
            elif t == b"E":
                fields = {c[:1]: c[1:] for c in p.split(b"\0") if c}
                err = fields.get(b"M", b"?").decode("utf-8", "replace")
            elif t == b"Z":
                status = p[:1].decode()
        return (None, err, status) if err else (rows, None, status)

    def close(self):
        try:
            self.s.sendall(_msg(b"X", b""))
            self.s.close()
        except Exception:
            pass


# ------------------------------------------------------------ generator

VALS = lambda r: str(r.randint(0, 30))


def gen_events(r, tname, n_ops, vname=None, aux=None):
    """Yield (sql, kind) where kind tags txn boundaries for the driver.
    Tracks txn state so BEGIN-in-txn / COMMIT-outside are never emitted
    (DuckDB errors on those where PG only warns — a declared, boring
    divergence)."""
    events = []
    in_txn = False
    deleted_in_txn = False   # see ON CONFLICT note below
    renamed_in_txn = False   # see RENAME note below

    for _ in range(n_ops):
        roll = r.random()
        if not in_txn and roll < 0.30:
            events.append(("BEGIN", "begin"))
            in_txn = True
            deleted_in_txn = False
            renamed_in_txn = False
        elif in_txn and roll < 0.25:
            events.append((r.choice(["COMMIT", "ROLLBACK"]), "end"))
            in_txn = False
            deleted_in_txn = False
            renamed_in_txn = False
        elif aux and roll < 0.40:
            # transactional DDL surface: CREATE/DROP/ALTER/INSERT/SELECT
            # on an aux table, differentially vs DuckDB's transactional
            # DDL. Double-creates / missing-table reads/drops fail on
            # BOTH sides (only the ok/fail bit is compared). DROP inside
            # a txn is transactional since r11, ALTER (except RENAME TO)
            # since r12 — DuckDB's semantics, so both fuzz
            # differentially. The create candidates alternate between a
            # PRIMARY-KEY and a bare variant, and the tiny insert range
            # forces PK collisions: if a drop-then-recreate ROLLBACK
            # loses (or a COMMIT fails to install) the right
            # registration, a later duplicate insert's ok/fail bit
            # diverges from DuckDB — the class the r11 judge probe
            # caught, now asserted on every script.
            # RENAME (r12b, transactional): the aux table flips between
            # its two names; reads/writes of both spellings, drops via
            # the new name, and rename-backs all run differentially vs
            # DuckDB. One declared engine limitation is screened at
            # GENERATION time (like the ON CONFLICT case): re-creating
            # a name renamed AWAY in the SAME txn is rejected here but
            # allowed by DuckDB, so CREATE {aux} candidates are withheld
            # once a rename was emitted inside the open txn.
            # transactional VIEW DDL (r12b) fuzzes differentially too;
            # one more screened divergence: an in-txn view READ after a
            # same-txn RENAME of its base diverges by design (DuckDB
            # late-binds and errors; the engine's substitution serves
            # the creation-time binding) — skip those reads.
            cands = ([f"CREATE TABLE {aux} (x INTEGER PRIMARY KEY)",
                      f"CREATE TABLE {aux} (x INTEGER)"]
                     if not (in_txn and renamed_in_txn) else []) + \
                    ([f"SELECT count(*) FROM {aux}_v"]
                     if not (in_txn and renamed_in_txn) else []) + \
                    [f"INSERT INTO {aux} VALUES ({r.randint(0, 4)})",
                     f"INSERT INTO {aux} VALUES ({r.randint(0, 4)})",
                     f"INSERT INTO {aux}_r VALUES ({r.randint(0, 4)})",
                     f"SELECT count(*) FROM {aux}",
                     f"SELECT * FROM {aux} ORDER BY 1",
                     f"SELECT count(*) FROM {aux}_r",
                     f"SELECT count(*) FROM {aux}_s",
                     f"ALTER TABLE {aux} ADD COLUMN y INTEGER",
                     f"ALTER TABLE {aux} DROP COLUMN y",
                     f"ALTER TABLE {aux} RENAME TO {aux}_r",
                     f"ALTER TABLE {aux}_r RENAME TO {aux}",
                     # third name (r13): random walks over three
                     # spellings generate CHAINS — a name freed by one
                     # rename and retaken by another inside the txn
                     f"ALTER TABLE {aux} RENAME TO {aux}_s",
                     f"ALTER TABLE {aux}_s RENAME TO {aux}",
                     f"ALTER TABLE {aux}_r RENAME TO {aux}_s",
                     f"ALTER TABLE {aux}_s RENAME TO {aux}_r",
                     f"CREATE VIEW {aux}_v AS SELECT * FROM {aux}",
                     f"DROP VIEW {aux}_v",
                     f"DROP TABLE {aux}",
                     f"DROP TABLE {aux}_r",
                     f"DROP TABLE {aux}_s",
                     # transactional schema DDL (r13): CREATE rolls back
                     # (compensated), DROP is an empty-only staged
                     # intent — both differential vs DuckDB's
                     # transactional catalog
                     f"CREATE SCHEMA {aux}sch",
                     f"DROP SCHEMA {aux}sch",
                     f"CREATE TABLE {aux}sch.st (x INTEGER)",
                     f"DROP TABLE {aux}sch.st",
                     f"SELECT count(*) FROM {aux}sch.st"] + \
                    ([
                     # per-connection TEMP objects (r14): DDL only
                     # OUTSIDE a txn (declared auto-commit vs DuckDB's
                     # transactional temp DDL — the ROLLBACK ok/fail bit
                     # would diverge by design); temp DML and reads fuzz
                     # differentially ANY time, in- and out-of-txn (the
                     # overlay machinery applies to the mangled table
                     # like any other)
                     f"CREATE TEMP TABLE {aux}t (x INTEGER)",
                     f"CREATE TEMP VIEW {aux}tv AS SELECT * FROM {aux}t",
                     f"DROP TABLE {aux}t",
                     f"DROP VIEW {aux}tv"] if not in_txn else []) + \
                    [f"INSERT INTO {aux}t VALUES ({r.randint(0, 4)})",
                     f"SELECT count(*) FROM {aux}t",
                     f"SELECT count(*) FROM {aux}tv",
                     f"UPDATE {aux}t SET x = x + 1",
                     f"DELETE FROM {aux}t WHERE x = {r.randint(0, 4)}"]
            # r13b: chains AND pure cycles are both supported — every
            # rename candidate (including cycle-closers over the three
            # spellings) fuzzes differentially vs DuckDB
            sql = r.choice(cands)
            if in_txn and "RENAME" in sql:
                renamed_in_txn = True
            events.append((sql, "dml"))
        else:
            op = r.random()
            if op < 0.40:
                rows = ", ".join(
                    f"({VALS(r)}, {VALS(r)}, '{r.choice('abcde')}')"
                    for _ in range(r.randint(1, 3)))
                sql = f"INSERT INTO {tname} VALUES {rows}"
                # ON CONFLICT after an in-txn DELETE hits DuckDB's
                # documented ART limitation SILENTLY: the deleted key
                # still registers as a conflict, so DO NOTHING skips a
                # row the overlay (correctly, PG-semantically) inserts.
                # The plain-INSERT variant of the same collision errors
                # with the "known index limitations" hint and is
                # screened by text; this silent variant must be avoided
                # at generation time.
                if r.random() < 0.3 and not (in_txn and deleted_in_txn):
                    sql += " ON CONFLICT (id) " + r.choice(
                        ["DO NOTHING", "DO UPDATE SET a = excluded.a"])
                events.append((sql, "dml"))
            elif op < 0.60:
                pred = r.choice(["id % 2 = 0", f"id > {r.randint(0, 25)}",
                                 f"id = {r.randint(0, 30)}"])
                sv = "NULL" if r.random() < 0.15 else VALS(r)
                events.append(
                    (f"UPDATE {tname} SET a = {sv} WHERE {pred}", "dml"))
            elif op < 0.75:
                pred = r.choice([f"id % 3 = {r.randint(0, 2)}",
                                 f"id > {r.randint(5, 28)}"])
                events.append((f"DELETE FROM {tname} WHERE {pred}", "dml"))
                if in_txn:
                    deleted_in_txn = True
            elif op < 0.85:
                # deliberate error: PK dup (no ON CONFLICT) or CHECK bust.
                # The subquery randomly reads THROUGH THE VIEW — in-txn
                # view reads must see the staged overlay (r9 judge find)
                src = vname if (vname and r.random() < 0.5) else tname
                events.append((r.choice([
                    f"INSERT INTO {tname} SELECT id, a, b FROM {tname} "
                    f"WHERE id = (SELECT min(id) FROM {src})",
                    f"UPDATE {tname} SET a = 999 WHERE id = "
                    f"(SELECT max(id) FROM {src})",  # busts CHECK (a<100)
                ]), "dml"))
            else:
                src = vname if (vname and r.random() < 0.5) else tname
                events.append((f"SELECT count(*) FROM {src}", "dml"))
    if in_txn:
        events.append((r.choice(["COMMIT", "ROLLBACK"]), "end"))
    return events


# ------------------------------------------------------- differential

def canon_pg(rows):
    return norm(rows)


def canon_duck(rows):
    return norm(rows)


def differential_scripts(port, n_scripts, r, finds):
    ok = 0
    for si in range(n_scripts):
        tname = f"tx_{r.randint(0, 10**9)}_{si}"
        ddl = (f"CREATE TABLE {tname} (id INTEGER PRIMARY KEY, "
               f"a INTEGER CHECK (a < 100), b VARCHAR)")
        seed_rows = ", ".join(
            f"({i}, {r.randint(0, 40)}, '{r.choice('abc')}')"
            for i in r.sample(range(0, 20), r.randint(3, 8)))

        dcon = duckdb.connect()
        dcur = dcon.cursor()          # independent txn view (isolation probe)
        pg1 = PgSession(port)
        pg2 = PgSession(port)

        diverged = False
        vname = f"{tname}_v"
        try:
            # DROP first: a killed previous same-seed run strands these
            # deterministic names (see interleave_scripts note)
            pg1.query(f"DROP VIEW IF EXISTS {vname}")
            pg1.query(f"DROP TABLE IF EXISTS {tname}")
            pg1.query(f"DROP TABLE IF EXISTS {tname}_aux")
            for setup in (ddl, f"INSERT INTO {tname} VALUES {seed_rows}",
                          f"CREATE VIEW {vname} AS SELECT * FROM {tname}"):
                _, de = run_duck(dcon, setup)
                _, se, _ = pg1.query(setup)
                assert de is None and se is None, (de, se, setup)

            events = gen_events(r, tname, r.randint(6, 14), vname=vname,
                                aux=f"{tname}_aux")
            duck_aborted = False
            trace = []
            for sql, kind in events:
                trace.append(sql)
                drows, derr = run_duck(dcon, sql)
                srows, serr, status = pg1.query(sql)
                # DuckDB-internal failures are oracle artifacts, not
                # engine divergences: ART's documented delete-then-
                # reinsert-same-key-in-txn false positive, and the
                # LocalTableStorage internal assertion
                if derr is not None and (
                        "internal error" in str(derr).lower() or
                        "known index limitations" in str(derr)):
                    break
                if kind == "end":
                    duck_aborted = False
                # status agreement. One normalization: our server follows
                # PG in letting statements *report* the abort error while
                # DuckDB's python driver wraps it — both are failures, so
                # only the ok/fail bit is compared.
                if (derr is None) != (serr is None):
                    finds.append(("STATUS", sql, serr, derr))
                    print("TRACE:"); [print("   ", t) for t in trace]
                    diverged = True
                    break
                # SELECT statements: compare the rows themselves (covers
                # the aux-table content and any snapshot-read divergence)
                if derr is None and serr is None and \
                        sql.lstrip().upper().startswith("SELECT"):
                    if canon_duck(drows) != canon_pg(srows):
                        finds.append(("STMT-CONTENT", sql, canon_pg(srows),
                                      canon_duck(drows)))
                        print("TRACE:"); [print("   ", t) for t in trace]
                        diverged = True
                        break
                if derr is not None and "transaction is aborted" in str(derr).lower():
                    duck_aborted = True
                # own-connection contents after every statement (inside a
                # txn this sees the staged overlay). Skip while the block
                # is aborted: both sides refuse reads there. Half the
                # readbacks go THROUGH THE VIEW — in-txn view reads must
                # track the overlay exactly like direct reads.
                q = f"SELECT * FROM {vname if r.random() < 0.5 else tname} ORDER BY id"
                drows, derr = run_duck(dcon, q)
                srows, serr, _ = pg1.query(q)
                if (derr is None) != (serr is None):
                    finds.append(("READBACK-STATUS", sql, serr, derr))
                    diverged = True
                    break
                if derr is None and canon_duck(drows) != canon_pg(srows):
                    finds.append(("CONTENT", sql, canon_pg(srows),
                                  canon_duck(drows)))
                    print("TRACE:"); [print("   ", t) for t in trace]
                    diverged = True
                    break
                # isolation: a second connection must see base state
                if r.random() < 0.4:
                    d2rows, d2err = run_duck(dcur, q)
                    s2rows, s2err, _ = pg2.query(q)
                    if d2err is None and s2err is None and \
                            canon_duck(d2rows) != canon_pg(s2rows):
                        finds.append(("ISOLATION", sql, canon_pg(s2rows),
                                      canon_duck(d2rows)))
                        diverged = True
                        break
        finally:
            pg1.query("ROLLBACK")   # a diverged script may hold staged
            pg1.query(f"DROP VIEW IF EXISTS {vname}")
            pg1.query(f"DROP VIEW IF EXISTS {tname}_aux_v")
            pg1.query(f"DROP TABLE IF EXISTS {tname}_aux")
            pg1.query(f"DROP TABLE IF EXISTS {tname}_aux_r")
            pg1.query(f"DROP TABLE IF EXISTS {tname}_aux_s")
            pg1.query(f"DROP TABLE IF EXISTS {tname}_auxsch.st")
            pg1.query(f"DROP SCHEMA IF EXISTS {tname}_auxsch")
            pg1.query(f"DROP TABLE IF EXISTS {tname}")
            pg1.close()
            pg2.close()
            dcon.close()
        if not diverged:
            ok += 1
    return ok


# ------------------------------------------- interleaved two-txn invariant

def interleave_scripts(port, n_scripts, r, finds):
    """Two interleaved server transactions checked DIFFERENTIALLY against
    two concurrent DuckDB cursors replaying the identical statement
    sequence — DuckDB's row-level MVCC is the reference semantics, and
    since r12 the engine commutes disjoint-key rewrites the same way.

    (The previous linear commit-order/first-touch REPLAY oracle is
    unsound under row-level MVCC: a txn holding both a rewrite and an
    append has no single linearization point — snapshot isolation is
    not serializable — and it false-positived on a schedule where the
    engine and DuckDB both produce the non-linearizable outcome.)

    Conflict TIMING legitimately differs (DuckDB raises "Conflict on
    update!" at statement time; the engine raises serialization errors
    at read or COMMIT time; the engine is also more conservative for
    unattributable rewrites — declared) — any serialization-class
    failure on either side puts the script in divergent-schedule mode:
    statement statuses stop being compared and the final-content check
    is skipped (the two engines legitimately chose different winners).
    Schedules where BOTH sides commit everything cleanly — the commute
    cases: disjoint-row rewrites, appends, read pins — are compared
    statement-by-statement (per-connection snapshot reads) AND on
    final content. Lost updates, phantom rows and snapshot drift all
    surface there."""
    n_divergent = [0]
    ser_re = re.compile(
        r"serializ|conflict|rewritten by a concurrent|modified by a concurrent|"
        r"inserted a duplicate key|write-write|Failed to commit|"
        r"transaction is aborted|no stable snapshot", re.I)
    duck_artifact_re = re.compile(r"internal error|known index limitations", re.I)
    ok = 0
    for si in range(n_scripts):
        tname = f"txi_{r.randint(0, 10**9)}_{si}"
        pg = [PgSession(port), PgSession(port)]
        dcon = duckdb.connect()
        dcur = [dcon.cursor(), dcon.cursor()]
        seed = f"INSERT INTO {tname} VALUES " + ", ".join(
            f"({i}, {r.randint(0, 50)})" for i in range(0, 6))
        # half the schedules use a UNIQUE-keyed table with no PK: since
        # r12b the engine attributes rewrites by the first UNIQUE set
        # too, so the same disjoint-key commutes must hold there
        key = "id INTEGER PRIMARY KEY" if r.random() < 0.5 else "id INTEGER UNIQUE"
        # DROP first: a KILLED previous run of the same seed strands a
        # same-named table (names are seed-deterministic) whose stale
        # content silently survives the unchecked CREATE + seed INSERT
        # and reads as a phantom engine divergence (r15: two such
        # "finds", both immediately after a timeout-killed run; the
        # arithmetic matched the leftover exactly)
        for s_ in (f"DROP TABLE IF EXISTS {tname}",
                   f"CREATE TABLE {tname} ({key}, a INTEGER)", seed):
            pg[0].query(s_)
            run_duck(dcur[0], s_)
        in_txn = [False, False]
        divergent = False   # schedules split on conflict timing: declared
        diverged = False    # a real find
        trace = []
        for _ in range(r.randint(6, 16)):
            c = r.randint(0, 1)
            roll = r.random()
            if not in_txn[c] and roll < 0.4:
                sql = "BEGIN"
                in_txn[c] = True
            elif in_txn[c] and roll < 0.3:
                sql = r.choice(["COMMIT", "COMMIT", "ROLLBACK"])
                in_txn[c] = False
            elif roll > 0.93:
                # rare RENAME races (r12b): a rename intent vs the other
                # connection's DML. Conflicts land in the declared
                # serialization class (divergent schedule); renames that
                # COMMIT make later statements fail identically on both
                # sides (old name gone), and rename-backs restore play.
                # r13b: chains and swap-closing renames race across
                # connections too — conflicts land in the declared
                # serialization / catalog-visibility screens
                sql = r.choice([f"ALTER TABLE {tname} RENAME TO {tname}_r",
                                f"ALTER TABLE {tname}_r RENAME TO {tname}",
                                f"ALTER TABLE {tname} RENAME TO {tname}_s",
                                f"ALTER TABLE {tname}_s RENAME TO {tname}",
                                f"ALTER TABLE {tname}_r RENAME TO {tname}_s",
                                f"ALTER TABLE {tname}_s RENAME TO {tname}_r"])
            else:
                sql = r.choice([
                    f"INSERT INTO {tname} VALUES ({r.randint(6, 40)}, {r.randint(0, 50)}) "
                    f"ON CONFLICT (id) DO UPDATE SET a = excluded.a",
                    f"UPDATE {tname} SET a = a + 1 WHERE id % 2 = {r.randint(0, 1)}",
                    f"UPDATE {tname} SET a = a + 10 WHERE id = {r.randint(0, 5)}",
                    f"UPDATE {tname} SET a = a + 10 WHERE id = {r.randint(0, 5)}",
                    f"DELETE FROM {tname} WHERE id = {r.randint(0, 40)}",
                    f"INSERT INTO {tname} VALUES ({r.randint(50, 99)}, {r.randint(0, 50)})",
                    f"INSERT INTO {tname} VALUES ({r.randint(50, 99)}, {r.randint(0, 50)})",
                    f"SELECT count(*) FROM {tname}",
                    f"SELECT * FROM {tname} ORDER BY id",
                ])
            srows, serr, _ = pg[c].query(sql)
            drows, derr = run_duck(dcur[c], sql)
            # full-fidelity trace: statement + both sides' outcome, so a
            # FLAKY final-content divergence (r15: one-in-several-runs)
            # pinpoints the exact statement where the sides split
            trace.append(
                f"conn{c}: {sql}"
                + (f"  [s={canon_pg(srows) if serr is None else 'ERR:' + str(serr)[:60]}"
                   f" d={canon_duck(drows) if derr is None else 'ERR:' + str(derr)[:60]}]"
                   if sql.startswith("SELECT") or serr or derr else
                   ("" if serr is None else f"  [ERR {str(serr)[:60]}]")))
            ser_s = serr is not None and ser_re.search(str(serr))
            ser_d = derr is not None and (ser_re.search(str(derr)) or
                                          duck_artifact_re.search(str(derr)))
            if ser_s or ser_d:
                divergent = True
                break
            # catalog-visibility timing class (declared): DuckDB pins
            # its CATALOG at txn start, so a name a concurrent
            # connection's committed rename just created reads as
            # not-found in an older duck txn, while the engine resolves
            # the live catalog and aborts at COMMIT via the epoch pins
            # (first-committer-wins either way). The schedules diverge
            # at this statement — screen like the serialization class.
            if (serr is None) and derr is not None and \
                    "does not exist" in str(derr) and tname in str(derr):
                divergent = True
                break
            if (serr is None) != (derr is None):
                finds.append(("ITL-STATUS", sql, serr, derr))
                print("TRACE:"); [print("   ", t) for t in trace]
                diverged = True
                break
            if serr is None and sql.startswith("SELECT") and                     canon_duck(drows) != canon_pg(srows):
                finds.append(("ITL-READ", sql, canon_pg(srows), canon_duck(drows)))
                print("TRACE:"); [print("   ", t) for t in trace]
                diverged = True
                break
        # drain both sides; COMMIT outcomes may differ on conflict
        # timing — screen them like statements
        for c in (0, 1):
            if in_txn[c]:
                _, serr, _ = pg[c].query("COMMIT")
                _, derr = run_duck(dcur[c], "COMMIT")
                if (serr is None) != (derr is None):
                    divergent = True
        if not diverged and not divergent:
            q = f"SELECT * FROM {tname} ORDER BY id"
            srows, serr, _ = pg[0].query(q)
            drows, derr = run_duck(dcur[0], q)
            if serr is None and derr is None and                     canon_duck(drows) != canon_pg(srows):
                finds.append(("ITL-FINAL", "interleave",
                              canon_pg(srows), canon_duck(drows)))
                print("TRACE:"); [print("   ", t) for t in trace]
                diverged = True
        pg[0].query("ROLLBACK"); pg[1].query("ROLLBACK")
        pg[0].query(f"DROP TABLE IF EXISTS {tname}")
        pg[0].query(f"DROP TABLE IF EXISTS {tname}_r")
        pg[0].query(f"DROP TABLE IF EXISTS {tname}_s")
        pg[0].close(); pg[1].close()
        dcon.close()
        if divergent:
            n_divergent[0] += 1
        if not diverged:
            ok += 1
    print(f"  interleave: {n_divergent[0]}/{n_scripts} schedules went "
          "divergent (conflict-timing class, declared) — the rest "
          "fully compared")
    return ok


# -------------------------------------------- FK referential invariant

def fk_scripts(port, n_scripts, r, finds):
    """Two connections race parent-deletes against child-appends under
    a declared FOREIGN KEY. Whatever interleaving of BEGIN/DML/COMMIT/
    ROLLBACK the generator produces, and whichever statements abort
    (FK RESTRICT violations, serialization failures — both fine), the
    COMMITTED state must never contain an orphan child row. This is the
    invariant the r12 commit-time FK recheck (recheckFkAppends) and the
    read-pin epoch abort jointly guarantee; r11's append-commute rule
    alone would have violated it (ADVICE r11 high)."""
    ok = 0
    for si in range(n_scripts):
        p = f"fkp_{r.randint(0, 10**9)}_{si}"
        c = f"fkc_{r.randint(0, 10**9)}_{si}"
        pg = [PgSession(port), PgSession(port)]
        pg[0].query(f"DROP TABLE IF EXISTS {c}")  # killed-run leftovers
        pg[0].query(f"DROP TABLE IF EXISTS {p}")
        pg[0].query(f"CREATE TABLE {p} (id INTEGER PRIMARY KEY)")
        pg[0].query(f"CREATE TABLE {c} (cid INTEGER, pid INTEGER, "
                    f"FOREIGN KEY (pid) REFERENCES {p}(id))")
        pg[0].query(f"INSERT INTO {p} VALUES " +
                    ", ".join(f"({i})" for i in range(0, 8)))
        pg[0].query(f"INSERT INTO {c} VALUES " + ", ".join(
            f"({i}, {r.randint(0, 7)})" for i in range(0, 5)))
        in_txn = [False, False]
        diverged = False
        cid = 100
        for _ in range(r.randint(8, 20)):
            k = r.randint(0, 1)
            roll = r.random()
            if not in_txn[k] and roll < 0.35:
                pg[k].query("BEGIN")
                in_txn[k] = True
            elif in_txn[k] and roll < 0.30:
                pg[k].query(r.choice(["COMMIT", "COMMIT", "ROLLBACK"]))
                in_txn[k] = False
            else:
                cid += 1
                sql = r.choice([
                    # child append referencing a key that may be dying
                    f"INSERT INTO {c} VALUES ({cid}, {r.randint(0, 7)})",
                    f"INSERT INTO {c} VALUES ({cid}, {r.randint(0, 7)})",
                    # parent delete that FK RESTRICT may reject
                    f"DELETE FROM {p} WHERE id = {r.randint(0, 7)}",
                    # child delete frees a parent for later deletion
                    f"DELETE FROM {c} WHERE pid = {r.randint(0, 7)}",
                    f"SELECT count(*) FROM {c}",
                ])
                pg[k].query(sql)   # errors (FK/serialization/abort) OK
        for k in (0, 1):
            if in_txn[k]:
                pg[k].query("COMMIT")
        orphans, err, _ = pg[0].query(
            f"SELECT count(*) FROM {c} ch LEFT JOIN {p} pa "
            f"ON ch.pid = pa.id WHERE ch.pid IS NOT NULL AND pa.id IS NULL")
        if err is not None or orphans != ["0"]:
            finds.append(("FK-ORPHAN", f"{p}/{c}", orphans, err))
            diverged = True
        pg[0].query(f"DROP TABLE IF EXISTS {c}")
        pg[0].query(f"DROP TABLE IF EXISTS {p}")
        pg[0].close()
        pg[1].close()
        if not diverged:
            ok += 1
    return ok


def create_race_scripts(port, n_scripts, r, finds):
    """TRUE-PARALLEL race: a non-txn CREATE TABLE ... AS fired from a
    second connection simultaneously with a COMMIT publishing a rename
    CHAIN (frees the name) or a swap CYCLE (keeps both names occupied,
    breaks via a journaled temp hop) onto the same name. This is the
    exact window the r13b lock closed (non-txn CREATE serializes on the
    target's write lock, which COMMIT holds through validation AND
    publish) — prevention is now a lock, so the fuzzer proves it with
    real threads instead of a statement interleave. Invariants, not a
    DuckDB differential (DuckDB has no equivalent of the window):
      chain  — renamed-to name carries the old rows; the freed name is
               either the CREATE's table (it won, post-publish) or
               absent (it lost, already-exists error pre-publish);
               never both, never empty-with-success.
      cycle  — contents swapped EXACTLY; the CREATE must have errored
               (both names stay occupied at every point of the publish);
               no hop stranded (no %__txn% / %__rescued% in the catalog).
    """
    import threading
    ok = 0
    for si in range(n_scripts):
        tag = f"{r.randint(0, 10**9)}_{si}"
        a, b, cnew = f"crr_a_{tag}", f"crr_b_{tag}", f"crr_c_{tag}"
        pg = [PgSession(port), PgSession(port)]
        pg[0].query(f"CREATE TABLE {a} (k INTEGER PRIMARY KEY, v INTEGER)")
        pg[0].query(f"INSERT INTO {a} VALUES (1, 10)")
        pg[0].query(f"CREATE TABLE {b} (k INTEGER PRIMARY KEY, v INTEGER)")
        pg[0].query(f"INSERT INTO {b} VALUES (2, 20)")
        cycle = r.random() < 0.5
        pg[0].query("BEGIN")
        if cycle:
            # a<->b swap via the collapse spelling; COMMIT breaks the
            # cycle with a temp hop. The racing CREATE targets a.
            pg[0].query(f"ALTER TABLE {b} RENAME TO {cnew}")
            pg[0].query(f"ALTER TABLE {a} RENAME TO {b}")
            pg[0].query(f"ALTER TABLE {cnew} RENAME TO {a}")
            target = a
        else:
            # chain: a -> cnew frees a; the racing CREATE targets a.
            pg[0].query(f"ALTER TABLE {a} RENAME TO {cnew}")
            target = a
        commit_err = [None]
        create_err = [None]
        stagger = r.random() * 0.02  # 0-20 ms either side of the COMMIT
        create_first = r.random() < 0.5

        def do_commit():
            if not create_first:
                pass
            else:
                time.sleep(stagger)
            _, e, _ = pg[0].query("COMMIT")
            commit_err[0] = e

        def do_create():
            if create_first:
                pass
            else:
                time.sleep(stagger)
            _, e, _ = pg[1].query(
                f"CREATE TABLE {target} AS SELECT 777 AS x")
            create_err[0] = e

        t1 = threading.Thread(target=do_commit)
        t2 = threading.Thread(target=do_create)
        t1.start(); t2.start(); t1.join(); t2.join()

        def rows_of(t):
            rws, err, _ = pg[0].query(f"SELECT * FROM {t} ORDER BY 1")
            return (rws, err)
        diverged = False
        if commit_err[0] is not None:
            finds.append(("RACE-COMMIT", "commit failed", commit_err[0], None))
            diverged = True
        elif cycle:
            ra, ea = rows_of(a)
            rb, eb = rows_of(b)
            if ea is not None or eb is not None or \
                    ra != ["2|20"] or rb != ["1|10"]:
                finds.append(("RACE-SWAP", f"{a}/{b}", (ra, ea, rb, eb), "swapped"))
                diverged = True
            if create_err[0] is None:
                finds.append(("RACE-SWAP-CREATE", target,
                              "create succeeded on an occupied name", None))
                diverged = True
        else:
            rc, ec = rows_of(cnew)
            if ec is not None or rc != ["1|10"]:
                finds.append(("RACE-CHAIN", cnew, (rc, ec), "old a rows"))
                diverged = True
            ra, ea = rows_of(a)
            if create_err[0] is None:
                # CREATE won post-publish: a must be ITS table
                if ea is not None or ra != ["777"]:
                    finds.append(("RACE-CHAIN-WON", a, (ra, ea), "777"))
                    diverged = True
            else:
                # CREATE lost pre-publish: a must be absent
                if ea is None:
                    finds.append(("RACE-CHAIN-LOST", a,
                                  f"create errored ({str(create_err[0])[:80]}) "
                                  f"but {a} still resolves to {ra}", "absent"))
                    diverged = True
        # stranded staging / hops / rescues are catalog-visible names
        strays, serr, _ = pg[0].query(
            "SELECT table_name FROM information_schema.tables WHERE "
            "table_name LIKE '%\\_\\_txn%' ESCAPE '\\' OR "
            "table_name LIKE '%\\_\\_rescued%' ESCAPE '\\'")
        if serr is None and strays:
            finds.append(("RACE-STRAY", "staging leaked", strays, None))
            diverged = True
        for t in (a, b, cnew):
            pg[0].query(f"DROP TABLE IF EXISTS {t}")
        pg[0].close(); pg[1].close()
        if not diverged:
            ok += 1
    return ok


def main(port, n_scripts, seed):
    r = random.Random(seed)
    finds = []
    ok1 = differential_scripts(port, n_scripts, r, finds)
    ok2 = interleave_scripts(port, max(1, n_scripts // 2), r, finds)
    ok3 = fk_scripts(port, max(1, n_scripts // 2), r, finds)
    ok4 = create_race_scripts(port, max(1, n_scripts // 2), r, finds)
    for kind, st, got, want in finds[:20]:
        print(f"{kind}  {st}")
        print(f"    server: {str(got)[:400]}")
        print(f"    oracle: {str(want)[:400]}")
    print(f"\nSEED {seed} SUMMARY diff_ok={ok1}/{n_scripts} "
          f"interleave_ok={ok2}/{max(1, n_scripts // 2)} "
          f"fk_ok={ok3}/{max(1, n_scripts // 2)} "
          f"race_ok={ok4}/{max(1, n_scripts // 2)} finds={len(finds)}")
    return 1 if finds else 0


if __name__ == "__main__":
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 5433
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    sys.exit(main(port, n, seed))
