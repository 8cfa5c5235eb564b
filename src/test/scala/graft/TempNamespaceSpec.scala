package graft

import java.util.concurrent.LinkedBlockingQueue

import graft.server.Engine

/** Per-connection TEMP object namespace (r14, SURVEY B.9 / VERDICT r13
  * Missing #1): the reference gives every PG connection a private
  * DuckDB conn (pg_conn.go:51), so `CREATE TEMP VIEW v` in two psql
  * sessions neither collides nor leaks. Here one SparkSession serves
  * every connection; privacy comes from the per-thread name
  * substitution in Engine. Each spawned thread below is one
  * "connection" (PgServer spawns a thread per socket). */
class TempNamespaceSpec extends SparkSpecBase {

  private lazy val engine: Engine = {
    spark.sql("CREATE DATABASE IF NOT EXISTS main")
    spark.sql("USE main")
    new Engine(spark)
  }

  /** A simulated connection: statements execute on a dedicated thread
    * (the engine keys temp/txn state by thread), results come back on
    * a queue. close() mimics PgConnection's teardown. */
  private final class Conn {
    private val in = new LinkedBlockingQueue[Option[String]]()
    private val out = new LinkedBlockingQueue[Either[Throwable, Seq[String]]]()
    private val t = new Thread(() => {
      var next = in.take()
      while (next.isDefined) {
        out.put(
          try Right {
            val r = engine.execute(next.get)
            Option(r.df).map(_.collect().toSeq.map(_.toString)).getOrElse(Seq(r.tag))
          } catch { case e: Throwable => Left(e) })
        next = in.take()
      }
      engine.releaseConnTemps()
    })
    t.start()
    def exec(sql: String): Seq[String] = {
      in.put(Some(sql))
      out.take() match {
        case Right(rows) => rows
        case Left(e) => throw e
      }
    }
    def fails(sql: String): Throwable =
      intercept[Throwable] { exec(sql) }
    def close(): Unit = { in.put(None); t.join() }
  }

  test("two connections: same temp view name, independent values and drops") {
    val a = new Conn; val b = new Conn
    try {
      a.exec("create temp view tns_v as select 1 as x")
      b.exec("create temp view tns_v as select 2 as x")
      assert(a.exec("select * from tns_v") == Seq("[1]"))
      assert(b.exec("select * from tns_v") == Seq("[2]"))
      a.exec("drop view tns_v")
      // a's drop does not touch b's view; a's name is gone
      assert(b.exec("select * from tns_v") == Seq("[2]"))
      val e = a.fails("select * from tns_v")
      assert(e.getMessage.contains("tns_v"))
    } finally { a.close(); b.close() }
  }

  test("temp tables are connection-private, writable, constraint-enforced") {
    val a = new Conn; val b = new Conn
    try {
      a.exec("create temp table tns_t (id INT PRIMARY KEY, v STRING)")
      b.exec("create temp table tns_t as select 99 as id")
      a.exec("insert into tns_t values (1, 'one'), (2, 'two')")
      val dup = a.fails("insert into tns_t values (1, 'dup')")
      assert(dup.getMessage.contains("unique") || dup.getMessage.contains("duplicate"))
      a.exec("update tns_t set v = 'ONE' where id = 1")
      a.exec("delete from tns_t where id = 2")
      assert(a.exec("select id, v from tns_t") == Seq("[1,ONE]"))
      assert(b.exec("select id from tns_t") == Seq("[99]"))
      b.exec("drop table tns_t")
      assert(a.exec("select count(*) as n from tns_t") == Seq("[1]"))
      a.exec("drop table tns_t")
    } finally { a.close(); b.close() }
  }

  test("temp table DML is transactional (ROLLBACK restores), DDL auto-commits") {
    val a = new Conn
    try {
      a.exec("create temp table tns_tx (id INT)")
      a.exec("insert into tns_tx values (1)")
      a.exec("begin")
      a.exec("insert into tns_tx values (2)")
      assert(a.exec("select count(*) as n from tns_tx") == Seq("[2]"))
      a.exec("rollback")
      assert(a.exec("select count(*) as n from tns_tx") == Seq("[1]"))
      // temp DDL inside a txn auto-commits (declared divergence —
      // same class as the pre-existing temp-view behavior): ROLLBACK
      // raises the honest cannot-undo-DDL error and the object stays
      a.exec("begin")
      a.exec("create temp table tns_ddl as select 5 as x")
      val e = a.fails("rollback")
      assert(e.getMessage.contains("cannot undo DDL"))
      assert(a.exec("select x from tns_ddl") == Seq("[5]"))
      a.exec("drop table tns_ddl")
      a.exec("drop table tns_tx")
    } finally a.close()
  }

  test("temp name shadows a same-named catalog table; drop unshadows") {
    val a = new Conn
    try {
      a.exec("drop table if exists main.tns_shadow")
      a.exec("create table main.tns_shadow as select 'real' as v")
      a.exec("create temp view tns_shadow as select 'temp' as v")
      assert(a.exec("select v from tns_shadow") == Seq("[temp]"))
      // the qualified spelling still reaches the catalog table
      assert(a.exec("select v from main.tns_shadow") == Seq("[real]"))
      a.exec("drop view tns_shadow")
      assert(a.exec("select v from tns_shadow") == Seq("[real]"))
      // CTE names shadow temp names (analyzer order, DuckDB-matching)
      a.exec("create temp view tns_cte as select 1 as x")
      assert(a.exec("with tns_cte as (select 42 as x) select x from tns_cte")
        == Seq("[42]"))
      a.exec("drop view tns_cte")
      a.exec("drop table main.tns_shadow")
    } finally a.close()
  }

  test("connection close and DISCARD ALL drop the connection's temps") {
    val a = new Conn
    a.exec("create temp table tns_d1 as select 1 as x")
    a.exec("create temp view tns_d2 as select 2 as x")
    a.exec("discard all")
    assert(a.fails("select * from tns_d1").getMessage.contains("tns_d1"))
    assert(a.fails("select * from tns_d2").getMessage.contains("tns_d2"))
    a.exec("create temp table tns_d3 as select 3 as x")
    a.close() // teardown path: releaseConnTemps on the conn thread
    // nothing mangled survives in the shared catalog
    val leftovers = spark.catalog.listTables("main").collect()
      .map(_.name).filter(_.matches("(?i).*__tmpc\\d+$"))
    assert(leftovers.isEmpty, s"leaked temp tables: ${leftovers.mkString(",")}")
    assert(!spark.catalog.listTables().collect()
      .exists(t => t.isTemporary && t.name.matches("(?i).*__tmpc\\d+$")))
  }

  test("temp DDL errors: duplicates, wrong object class, reserved suffix") {
    val a = new Conn
    try {
      a.exec("create temp view tns_e as select 1 as x")
      val dup = a.fails("create temp view tns_e as select 2 as x")
      assert(dup.getMessage.contains("already exists"))
      a.exec("create or replace temp view tns_e as select 2 as x")
      assert(a.exec("select x from tns_e") == Seq("[2]"))
      val cross = a.fails("create temp table tns_e (a INT)")
      assert(cross.getMessage.contains("temp view"))
      val wrongDrop = a.fails("drop table tns_e")
      assert(wrongDrop.getMessage.contains("DROP VIEW"))
      a.exec("drop view tns_e")
      a.exec("create temp table tns_e2 (a INT)")
      val wrongDrop2 = a.fails("drop view tns_e2")
      assert(wrongDrop2.getMessage.contains("DROP TABLE"))
      a.exec("create temp table if not exists tns_e2 (a INT)") // no-op
      a.exec("drop table tns_e2")
      val reserved = a.fails("create table tns__tmpc7 (a INT)")
      assert(reserved.getMessage.contains("reserved"))
      val reservedTemp = a.fails("create temp view tns__tmpc7 as select 1")
      assert(reservedTemp.getMessage.contains("reserved"))
    } finally a.close()
  }

  test("temp views LATE-BIND: they compose over temp tables and see recreates") {
    val a = new Conn
    try {
      a.exec("create temp table tns_lb (a INT)")
      a.exec("insert into tns_lb values (1)")
      a.exec("create temp view tns_lbv as select a from tns_lb")
      assert(a.exec("select * from tns_lbv") == Seq("[1]"))
      // drop + recreate the underlying temp table: the view re-binds
      // (DuckDB semantics; an analyzed-plan view would serve stale files)
      a.exec("drop table tns_lb")
      a.exec("create temp table tns_lb (a INT)")
      a.exec("insert into tns_lb values (99)")
      assert(a.exec("select * from tns_lbv") == Seq("[99]"))
      // view over view, plus a column-alias list
      a.exec("create temp view tns_lbv2 (b) as select a + 1 from tns_lbv")
      assert(a.exec("select b from tns_lbv2") == Seq("[100]"))
      // recursion guard: OR REPLACE that closes a cycle is rejected
      val rec = a.fails(
        "create or replace temp view tns_lbv as select * from tns_lbv2")
      assert(rec.getMessage.contains("recursive"))
      // describe resolves through the namespace
      val desc = a.exec("describe tns_lbv2")
      assert(desc.exists(_.contains("b")))
      a.exec("drop view tns_lbv2")
      a.exec("drop view tns_lbv")
      a.exec("drop table tns_lb")
    } finally a.close()
  }

  test("appendBatch (COPY FROM STDIN / CH ingest path) resolves temp names") {
    @volatile var result: Seq[String] = Nil
    @volatile var err: Throwable = null
    val t = new Thread(() => {
      try {
        engine.execute("create temp table tns_ab (k INT, v STRING)")
        // the wire paths hand appendBatch the USER spelling from
        // protocol text — it must land in this connection's temp table
        engine.appendBatch("tns_ab", Seq("k", "v"),
          Seq(Seq(1, "x"), Seq(2, "y")))
        result = engine.execute("select k, v from tns_ab order by k")
          .df.collect().toSeq.map(_.toString)
        engine.execute("drop table tns_ab")
      } catch { case e: Throwable => err = e }
      finally engine.releaseConnTemps()
    })
    t.start(); t.join()
    if (err != null) throw err
    assert(result == Seq("[1,x]", "[2,y]"))
  }

  test("COPY TO resolves temp names — bare and subquery forms") {
    val a = new Conn
    val dir = java.nio.file.Files.createTempDirectory("tns-copy").toFile
    try {
      a.exec("create temp table tns_cp (k INT)")
      a.exec("insert into tns_cp values (1), (2), (3)")
      a.exec("create temp view tns_cpv as select k * 10 as k10 from tns_cp")
      a.exec(s"copy tns_cpv to '${dir.getAbsolutePath}/v' (format csv, header)")
      a.exec(s"copy (select sum(k) as s from tns_cp) to '${dir.getAbsolutePath}/q' (format csv, header)")
      val vOut = new java.io.File(dir, "v").listFiles().filter(_.getName.endsWith(".csv"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
      assert(vOut.contains("k10") && vOut.contains("30"))
      val qOut = new java.io.File(dir, "q").listFiles().filter(_.getName.endsWith(".csv"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
      assert(qOut == Seq("s", "6"))
      a.exec("drop view tns_cpv")
      a.exec("drop table tns_cp")
    } finally {
      a.close()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("temp sequences are connection-private and die with the connection") {
    val a = new Conn; val b = new Conn
    try {
      a.exec("create temp sequence tns_sq start with 100")
      b.exec("create temp sequence tns_sq start with 500")
      assert(a.exec("select nextval('tns_sq') as v") == Seq("[100]"))
      assert(a.exec("select nextval('tns_sq') as v") == Seq("[101]"))
      assert(b.exec("select nextval('tns_sq') as v") == Seq("[500]"))
      assert(a.exec("select currval('tns_sq') as v") == Seq("[101]"))
      // temp shadows a same-named persistent sequence
      a.exec("create sequence tns_sqp start with 1")
      a.exec("create temp sequence tns_sqp start with 77")
      assert(a.exec("select nextval('tns_sqp') as v") == Seq("[77]"))
      a.exec("drop sequence tns_sqp") // drops the TEMP one first
      assert(a.exec("select nextval('tns_sqp') as v") == Seq("[1]"))
      a.exec("drop sequence tns_sqp")
      a.exec("drop sequence tns_sq")
      assert(a.fails("select nextval('tns_sq')").getMessage.contains("tns_sq"))
    } finally { a.close(); b.close() }
    // b's temp sequence died with its connection: a fresh conn can't see it
    val c = new Conn
    try assert(c.fails("select nextval('tns_sq')").getMessage.contains("tns_sq"))
    finally c.close()
  }

  test("temp tables are pinned to main: USE schema cannot strand them") {
    val a = new Conn
    try {
      a.exec("create schema if not exists tns_other")
      a.exec("create temp table tns_u (a INT)")
      a.exec("insert into tns_u values (5)")
      a.exec("use tns_other")
      // reads, writes and drops keep resolving after the schema switch
      assert(a.exec("select a from tns_u") == Seq("[5]"))
      a.exec("insert into tns_u values (6)")
      assert(a.exec("select count(*) as n from tns_u") == Seq("[2]"))
      a.exec("use main")
      a.exec("drop table tns_u")
      a.exec("drop schema tns_other")
    } finally {
      try a.exec("use main") catch { case _: Throwable => }
      a.close()
    }
  }

  test("writes targeting a temp VIEW fail cleanly even when it shadows a table") {
    val a = new Conn
    try {
      a.exec("drop table if exists main.tns_wv")
      a.exec("create table main.tns_wv as select 'keep' as v")
      a.exec("create temp view tns_wv as select 'temp' as v")
      // DuckDB temp-first resolution reaches the VIEW and rejects the
      // write; falling through to the shadowed catalog table would
      // silently mutate it (ADVICE r14, medium)
      for (stmt <- Seq(
        "update tns_wv set v = 'boom'",
        "delete from tns_wv",
        "insert into tns_wv values ('boom')",
        "truncate table tns_wv"))
        assert(a.fails(stmt).getMessage.contains("temp view"), stmt)
      assert(a.exec("select v from main.tns_wv") == Seq("[keep]"))
      // COPY view TO is a READ and stays legal; COPY view FROM is not
      assert(a.fails("copy tns_wv from '/tmp/nope.csv'")
        .getMessage.contains("temp view"))
      a.exec("drop view tns_wv")
      a.exec("drop table main.tns_wv")
    } finally a.close()
  }

  test("temp-name substitution never rewrites string literals or comments") {
    val a = new Conn
    try {
      a.exec("create temp table tns_lit (k INT)")
      a.exec("drop table if exists main.tns_log")
      a.exec("create table main.tns_log (msg STRING)")
      // pre-fix the keyword-anchored regex rewrote the LITERAL to the
      // mangled name, corrupting stored data (ADVICE r14)
      a.exec("insert into main.tns_log values ('delete from tns_lit')")
      a.exec("insert into main.tns_log values ('update tns_lit now') " +
        "-- comment mentioning update tns_lit")
      assert(a.exec("select msg from main.tns_log order by msg") ==
        Seq("[delete from tns_lit]", "[update tns_lit now]"))
      // the real target outside the literal still substitutes
      a.exec("insert into tns_lit values (1)")
      assert(a.exec("select k from tns_lit") == Seq("[1]"))
      a.exec("drop table main.tns_log")
      a.exec("drop table tns_lit")
    } finally a.close()
  }

  test("CTE names shadow temp names at CREATE VIEW time too (no false recursion)") {
    val a = new Conn
    try {
      // pre-fix the closure walk collected the CTE name as a temp-view
      // ref and rejected this as recursive — create-time and read-time
      // resolution disagreed (ADVICE r14)
      a.exec("create temp view tns_ctv as with tns_ctv as (select 1 as x) " +
        "select x from tns_ctv")
      assert(a.exec("select x from tns_ctv") == Seq("[1]"))
      // a REAL cycle is still rejected
      a.exec("create temp view tns_ctv2 as select x from tns_ctv")
      val rec = a.fails(
        "create or replace temp view tns_ctv as select x from tns_ctv2")
      assert(rec.getMessage.contains("recursive"))
      a.exec("drop view tns_ctv2")
      a.exec("drop view tns_ctv")
    } finally a.close()
  }

  test("DISCARD ALL is rejected inside a transaction block (PG semantics)") {
    val a = new Conn
    try {
      a.exec("create temp table tns_da (k INT)")
      a.exec("begin")
      a.exec("insert into tns_da values (1)")
      val e = a.fails("discard all")
      assert(e.getMessage.contains("transaction block"))
      a.exec("rollback")
      // the namespace survived the rejected DISCARD; outside a txn it works
      assert(a.exec("select count(*) as n from tns_da") == Seq("[0]"))
      a.exec("discard all")
      assert(a.fails("select * from tns_da").getMessage.contains("tns_da"))
    } finally a.close()
  }

  test("temp objects are hidden from catalog listings; rename stays in-namespace") {
    val a = new Conn
    try {
      a.exec("create temp table tns_h (a INT)")
      a.exec("create temp view tns_hv as select 1 as x")
      val names = a.exec(
        "select table_name from information_schema.tables where table_name like '%tmpc%'")
      assert(names.isEmpty)
      a.exec("alter table tns_h rename to tns_h2")
      a.exec("insert into tns_h2 values (7)")
      assert(a.exec("select a from tns_h2") == Seq("[7]"))
      assert(a.fails("select * from tns_h").getMessage.contains("tns_h"))
      a.exec("drop table tns_h2")
      a.exec("drop view tns_hv")
    } finally a.close()
  }
}
