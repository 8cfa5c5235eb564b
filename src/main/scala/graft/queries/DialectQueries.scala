package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import QueryDef.q

/** DuckDB dialect extensions (SURVEY §2-B.2/B.4/B.7 ⚠/🔧 rows):
  * ILIKE, SIMILAR TO, IS DISTINCT FROM, GROUP BY ALL, UNION BY NAME,
  * DISTINCT ON — each as its Spark-idiomatic rewrite.
  */
object DialectQueries {

  /** Remove an orphaned warehouse dir for a managed table a crashed
    * previous run may have left (CREATE TABLE otherwise fails with
    * LOCATION_ALREADY_EXISTS). */
  private def dropStaleDir(s: org.apache.spark.sql.SparkSession, table: String): Unit = {
    val stale = new java.io.File(
      s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    if (stale.exists()) rm(stale)
  }

  val all: Seq[QueryDef] = Seq(

    q("q_dialect_ilike",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name ILIKE '%EE%' AND p_type NOT ILIKE 'BRASS%'
        |ORDER BY p_partkey LIMIT 200""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.part
        .filter(col("p_name").ilike("%EE%") && !col("p_type").ilike("BRASS%"))
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey")).limit(200)
    },

    q("q_dialect_similar_to",
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority SIMILAR TO '[1-3]-[A-Z]+'
        |ORDER BY o_orderkey LIMIT 300""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // SIMILAR TO = full-string regex match (rlike with anchors)
      t.orders
        .filter(col("o_orderpriority").rlike("^(?:[1-3]-[A-Z]+)$"))
        .select(col("o_orderkey"), col("o_orderpriority"))
        .orderBy(col("o_orderkey")).limit(300)
    },

    q("q_dialect_is_distinct",
      """SELECT c_custkey,
        |  nullif(c_mktsegment, 'BUILDING') IS DISTINCT FROM nullif(c_mktsegment, 'MACHINERY') AS d,
        |  nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL AS is_b
        |FROM customer ORDER BY c_custkey LIMIT 300""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val a = nullif(col("c_mktsegment"), lit("BUILDING"))
      val b = nullif(col("c_mktsegment"), lit("MACHINERY"))
      t.customer.select(
        col("c_custkey"),
        !(a <=> b) as "d", // IS DISTINCT FROM = NOT null-safe-equal
        (a <=> lit(null)).as("is_b"))
        .orderBy(col("c_custkey")).limit(300)
    },

    q("q_dialect_group_by_all",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY ALL
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM lineitem GROUP BY ALL
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    },

    q("q_dialect_union_by_name",
      """SELECT k, v FROM (
        |  SELECT n_nationkey AS k, n_name AS v FROM nation
        |  UNION ALL BY NAME
        |  SELECT r_name AS v, r_regionkey + 100 AS k FROM region
        |) ORDER BY k""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val a = t.nation.select(col("n_nationkey").cast("long").as("k"), col("n_name").as("v"))
      val b = t.region.select(col("r_name").as("v"), (col("r_regionkey") + 100).cast("long").as("k"))
      a.unionByName(b).orderBy(col("k"))
    },

    // sampled ROWS can't hash-match across engines (each engine's RNG
    // is its own), but the sample's INVARIANTS are strict-checkable:
    // every sampled row exists in the source, the Bernoulli row count
    // lands inside a >6-sigma band, and a fixed REPEATABLE seed is
    // deterministic on our side (two independent scans agree). The
    // oracle states the invariants as constants — any violation flips
    // a boolean and fails the hash gate (r8 verdict item 7).
    q("q_dialect_sample",
      "SELECT true AS all_in_source, true AS within_range, true AS repeatable") { (s, dir) =>
      Tables(s, dir)
      def sample = s.sql(
        "SELECT o_orderkey, o_totalprice FROM orders TABLESAMPLE (10 PERCENT) REPEATABLE (42)")
      val src = s.table("orders").select(col("o_orderkey"), col("o_totalprice"))
      val bad = sample.join(src, Seq("o_orderkey", "o_totalprice"), "left_anti")
        .agg(count(lit(1)).as("bad"))
      // repeatability: two INDEPENDENT sample scans must agree. An
      // order-independent multiset digest (count + sum of row hashes)
      // replaces the r9 exceptAll-both-ways — same invariant strength
      // for this purpose at two aggregate stages instead of four
      // shuffling set-difference subtrees (the query was pure floor on
      // the sf0.1 board; data is one 150k-row column pair)
      def digest(tag: String) = sample.agg(
        count(lit(1)).as(s"n_$tag"),
        // decimal accumulator: a long sum of 64-bit hashes overflows
        // under ANSI mode
        sum(xxhash64(col("o_orderkey"), col("o_totalprice"))
          .cast("decimal(38,0)")).as(s"h_$tag"))
      // the two "independent" scans must be PHYSICALLY independent:
      // in one plan, ReuseExchange canonicalizes the two identical
      // aggregate subtrees (aliases are stripped) into ONE sample scan,
      // making the repeatability assertion vacuously true (ADVICE r10).
      // Running digest "a" as its own eager job guarantees a second
      // real execution below — exchange reuse cannot span jobs. The
      // collect is a single aggregate row, fine at any scale.
      val a = digest("a").head()
      val (na, ha) = (a.getLong(0), a.getDecimal(1))
      digest("b")
        .crossJoin(src.agg(count(lit(1)).as("t")))
        .crossJoin(bad)
        .select(
          (col("bad") === 0).as("all_in_source"),
          (col("n_b") >= col("t") * 0.05 && col("n_b") <= col("t") * 0.15).as("within_range"),
          (col("n_b") === lit(na) && col("h_b") === lit(ha)).as("repeatable"))
    },

    // plan text differs per engine → rows-only smoke (SURVEY B.9 ⚠)
    QueryDef.qNoOracle("q_dialect_explain") { (s, dir) =>
      Tables(s, dir)
      s.sql("EXPLAIN SELECT count(*) FROM lineitem WHERE l_quantity > 10")
    },

    q("q_dialect_distinct_on",
      """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey
        |LIMIT 300""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // DISTINCT ON (k) … ORDER BY k, s = first row per key in sort
      // order = rank-1 window, the scalable shape
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t.orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
        .limit(300)
    },

    // -- wire-path twins: the SAME dialect text a psql/JDBC client
    // types runs through Engine.execute (rewriteStructural hoists what
    // Spark's parser rejects), and the oracle runs it natively in
    // DuckDB. These prove the constructs are reachable over the wire,
    // not just via the DataFrame API.

    q("q_dialect_qualify_sql",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1
        |ORDER BY o_custkey LIMIT 500""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      new graft.server.Engine(s).execute(
        """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
          |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1
          |ORDER BY o_custkey LIMIT 500""".stripMargin).df
    },

    q("q_dialect_distinct_on_sql",
      """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey
        |LIMIT 300""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      new graft.server.Engine(s).execute(
        """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
          |FROM orders
          |ORDER BY o_custkey, o_totalprice DESC, o_orderkey
          |LIMIT 300""".stripMargin).df
    },

    q("q_dialect_similar_to_sql",
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority SIMILAR TO '[1-3]-[A-Z]+'
        |  AND o_orderpriority NOT SIMILAR TO '[0-9]'
        |ORDER BY o_orderkey LIMIT 300""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      new graft.server.Engine(s).execute(
        """SELECT o_orderkey, o_orderpriority FROM orders
          |WHERE o_orderpriority SIMILAR TO '[1-3]-[A-Z]+'
          |  AND o_orderpriority NOT SIMILAR TO '[0-9]'
          |ORDER BY o_orderkey LIMIT 300""".stripMargin).df
    },

    q("q_dialect_union_by_name_sql",
      """SELECT n_nationkey AS k, n_name AS v FROM nation
        |UNION ALL BY NAME
        |SELECT r_name AS v, r_regionkey + 100 AS k FROM region
        |ORDER BY k""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      new graft.server.Engine(s).execute(
        """SELECT n_nationkey AS k, n_name AS v FROM nation
          |UNION ALL BY NAME
          |SELECT r_name AS v, r_regionkey + 100 AS k FROM region
          |ORDER BY k""".stripMargin).df
    },

    // r5 dialect-FUNCTION batch, end-to-end: 1-based subscripts, 1-based
    // inclusive slices and list comprehensions in the raw DuckDB spelling
    // through Engine.execute; oracle runs the identical text natively.
    // Array result columns ride as CANONICAL TEXT (CAST(l AS VARCHAR)
    // renders "[a, b]" identically in Spark and DuckDB): the driver's
    // comparer hashes cell values and crashes on raw array cells
    // (unhashable ndarray, VERDICT r7). The dialect rewrites under
    // test — 1-based subscripts/slices, comprehensions — are unchanged
    // underneath the cast.
    q("q_dialect_listops_sql",
      """SELECT o_orderkey,
        |  [o_orderkey, o_custkey, o_orderkey + o_custkey][2] AS second_el,
        |  CAST([o_orderkey, o_custkey, o_orderkey + o_custkey][2:3] AS VARCHAR) AS tail_slice,
        |  CAST([x * 2 FOR x IN [o_orderkey, o_custkey] IF x % 2 = 0] AS VARCHAR) AS evens_doubled
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      new graft.server.Engine(s).execute(
        """SELECT o_orderkey,
          |  [o_orderkey, o_custkey, o_orderkey + o_custkey][2] AS second_el,
          |  CAST([o_orderkey, o_custkey, o_orderkey + o_custkey][2:3] AS VARCHAR) AS tail_slice,
          |  CAST([x * 2 FOR x IN [o_orderkey, o_custkey] IF x % 2 = 0] AS VARCHAR) AS evens_doubled
          |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin).df
    },

    // JSON arrow operators in the raw spelling: -> / ->> chains over a
    // per-row JSON document built from fixture columns.
    q("q_dialect_json_arrows_sql",
      """SELECT o_orderkey,
        |  ('{"pri":"' || o_orderpriority || '","k":' || o_custkey || '}')->>'pri' AS pri,
        |  CAST(('{"pri":"' || o_orderpriority || '","k":' || o_custkey || '}')->>'k' AS BIGINT) AS k
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      new graft.server.Engine(s).execute(
        """SELECT o_orderkey,
          |  ('{"pri":"' || o_orderpriority || '","k":' || o_custkey || '}')->>'pri' AS pri,
          |  CAST(('{"pri":"' || o_orderpriority || '","k":' || o_custkey || '}')->>'k' AS BIGINT) AS k
          |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin).df
    },

    // COLUMNS() regex projection expansion in the raw spelling.
    q("q_dialect_columns_sql",
      """SELECT COLUMNS('^o_order(key|priority)$') FROM orders
        |ORDER BY o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      new graft.server.Engine(s).execute(
        """SELECT COLUMNS('^o_order(key|priority)$') FROM orders
          |ORDER BY o_orderkey LIMIT 100""".stripMargin).df
    },

    // INSERT … ON CONFLICT (reference pass-through to DuckDB's upsert;
    // here the Engine rewrites it to a copy-on-write merge join). The
    // oracle is the same statement battery run natively by DuckDB.
    q("q_dml_on_conflict",
      """CREATE OR REPLACE TEMP TABLE graft_oc_d (k BIGINT PRIMARY KEY, cust BIGINT, total DOUBLE);
        |INSERT INTO graft_oc_d SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) FROM orders WHERE o_orderkey <= 800;
        |INSERT INTO graft_oc_d SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) * 2 FROM orders WHERE o_orderkey BETWEEN 400 AND 1600 ON CONFLICT (k) DO UPDATE SET total = excluded.total + 1;
        |INSERT INTO graft_oc_d SELECT o_orderkey, o_custkey, CAST(-1 AS DOUBLE) FROM orders WHERE o_orderkey <= 2500 ON CONFLICT DO NOTHING;
        |INSERT INTO graft_oc_d SELECT o_orderkey, o_custkey, CAST(0 AS DOUBLE) FROM orders WHERE o_orderkey <= 1200 ON CONFLICT (k) DO UPDATE SET total = graft_oc_d.total + 10 WHERE graft_oc_d.total > 500;
        |SELECT k, cust, round(total, 2) AS total FROM graft_oc_d ORDER BY k""".stripMargin) { (s, dir) =>
      val engine = new graft.server.Engine(s)
      s.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("__oc_orders")
      engine.execute("drop table if exists graft_oc")
      // a previous session's managed-table dir would collide with the
      // re-create (fresh in-memory catalog, surviving warehouse dir)
      val stale = new java.io.File(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "graft_oc")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      if (stale.exists()) rm(stale)
      engine.execute("create table graft_oc (k bigint primary key, cust bigint, total double) using parquet")
      engine.execute("insert into graft_oc select o_orderkey, o_custkey, cast(o_totalprice as double) from __oc_orders where o_orderkey <= 800")
      engine.execute("insert into graft_oc select o_orderkey, o_custkey, cast(o_totalprice as double) * 2 from __oc_orders where o_orderkey between 400 and 1600 on conflict (k) do update set total = excluded.total + 1")
      engine.execute("insert into graft_oc select o_orderkey, o_custkey, cast(-1 as double) from __oc_orders where o_orderkey <= 2500 on conflict do nothing")
      engine.execute("insert into graft_oc select o_orderkey, o_custkey, cast(0 as double) from __oc_orders where o_orderkey <= 1200 on conflict (k) do update set total = graft_oc.total + 10 where graft_oc.total > 500")
      s.sql("select k, cust, round(total, 2) as total from graft_oc order by k")
    },

    // nextval() over a distributed INSERT…SELECT: one contiguous block
    // reserved under the table lock, values applied in the statement's
    // ORDER BY order — matches DuckDB row-for-row (the oracle runs the
    // same battery natively; orders.parquet is o_orderkey-ordered so
    // DuckDB's scan-order assignment equals the ORDER BY).
    q("q_dml_sequence_insert_select",
      """CREATE SEQUENCE graft_sq START WITH 100 INCREMENT BY 3;
        |CREATE TABLE graft_seq_t (sv BIGINT, k BIGINT);
        |INSERT INTO graft_seq_t SELECT nextval('graft_sq'), o_orderkey FROM orders WHERE o_orderkey <= 800 ORDER BY o_orderkey;
        |SELECT sv, k FROM graft_seq_t ORDER BY k""".stripMargin) { (s, dir) =>
      val engine = new graft.server.Engine(s)
      s.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("__seq_orders")
      engine.execute("drop table if exists graft_seq_t")
      val stale = new java.io.File(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "graft_seq_t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      if (stale.exists()) rm(stale)
      engine.execute("create sequence graft_sq start with 100 increment by 3")
      engine.execute("create table graft_seq_t (sv bigint, k bigint) using parquet")
      engine.execute("insert into graft_seq_t select nextval('graft_sq'), o_orderkey from __seq_orders where o_orderkey <= 800 order by o_orderkey")
      s.sql("select sv, k from graft_seq_t order by k")
    },

    // (dropStaleDir: a crashed previous run can leave an orphaned
    // warehouse dir that makes CREATE TABLE fail with
    // LOCATION_ALREADY_EXISTS — same hygiene as the sequence query)

    // ALTER COLUMN TYPE (r8): the retype must be REAL — the final
    // select does arithmetic on the retyped column, which errors under
    // ANSI if the cast never happened. Oracle runs the identical
    // statement sequence on DuckDB's native ALTER.
    q("q_dml_alter_column_type",
      """CREATE TABLE graft_alt_t AS
        |  SELECT o_orderkey AS k, CAST(o_custkey AS VARCHAR) AS v
        |  FROM orders WHERE o_orderkey <= 400;
        |ALTER TABLE graft_alt_t ALTER COLUMN v TYPE BIGINT;
        |SELECT k, v + 1 AS v1 FROM graft_alt_t ORDER BY k""".stripMargin) { (s, dir) =>
      val engine = new graft.server.Engine(s)
      Tables(s, dir)
      engine.execute("drop table if exists graft_alt_t")
      dropStaleDir(s, "graft_alt_t")
      engine.execute(
        "CREATE TABLE graft_alt_t AS SELECT o_orderkey AS k, CAST(o_custkey AS VARCHAR) AS v " +
          "FROM orders WHERE o_orderkey <= 400")
      engine.execute("ALTER TABLE graft_alt_t ALTER COLUMN v TYPE BIGINT")
      engine.execute("SELECT k, v + 1 AS v1 FROM graft_alt_t ORDER BY k").df
    },

    // User-defined ENUM end-to-end (r8): type creation, enum-typed
    // column ingest, aggregation over the column. ORDER BY casts to
    // VARCHAR on both sides — DuckDB orders raw enums by definition
    // order, strings textually.
    q("q_dml_enum_type",
      """CREATE TYPE graft_mood AS ENUM ('low', 'mid', 'high');
        |CREATE TABLE graft_en_t (k BIGINT, m graft_mood);
        |INSERT INTO graft_en_t SELECT o_orderkey, ['low','mid','high'][CAST(o_orderkey % 3 + 1 AS INT)] FROM orders WHERE o_orderkey <= 400;
        |SELECT CAST(m AS VARCHAR) AS mood, CAST(count(*) AS BIGINT) AS n
        |FROM graft_en_t GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val engine = new graft.server.Engine(s)
      Tables(s, dir)
      engine.execute("drop table if exists graft_en_t")
      dropStaleDir(s, "graft_en_t")
      engine.execute("DROP TYPE IF EXISTS graft_mood")
      engine.execute("CREATE TYPE graft_mood AS ENUM ('low', 'mid', 'high')")
      engine.execute("CREATE TABLE graft_en_t (k BIGINT, m graft_mood)")
      engine.execute(
        "INSERT INTO graft_en_t SELECT o_orderkey, ['low','mid','high'][CAST(o_orderkey % 3 + 1 AS INT)] " +
          "FROM orders WHERE o_orderkey <= 400")
      engine.execute(
        "SELECT CAST(m AS VARCHAR) AS mood, CAST(count(*) AS BIGINT) AS n " +
          "FROM graft_en_t GROUP BY 1 ORDER BY 1").df
    },

    // Round-8 wire-path constructs as ORACLED rows (probe-found fixes
    // promoted to driver-checked correctness): literal backslashes in
    // regex + backreferences, DuckDB first-match regexp_replace + 'g',
    // the GLOB operator, and a generator nested in a select-list
    // expression — all pushed through Engine.execute as raw text.
    q("q_dialect_wire_extras_sql",
      """SELECT o_orderkey,
        |  regexp_replace(o_orderpriority, '\d', '#') AS first_sub,
        |  regexp_replace(o_orderpriority, '([A-Z])([A-Z])', '\2\1', 'g') AS swapped,
        |  o_orderpriority GLOB '*URGENT' AS is_urgent,
        |  regexp_extract(o_orderpriority, '\d+') AS num
        |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      new graft.server.Engine(s).execute(
        """SELECT o_orderkey,
          |  regexp_replace(o_orderpriority, '\d', '#') AS first_sub,
          |  regexp_replace(o_orderpriority, '([A-Z])([A-Z])', '\2\1', 'g') AS swapped,
          |  o_orderpriority GLOB '*URGENT' AS is_urgent,
          |  regexp_extract(o_orderpriority, '\d+') AS num
          |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin).df
    },

    q("q_dialect_unnest_expr_sql",
      """SELECT o_orderkey * 10 + u AS slot
        |FROM (SELECT o_orderkey, unnest(generate_series(1, 3)) AS u
        |      FROM orders WHERE o_orderkey <= 40)
        |ORDER BY slot""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      // the SERVER text nests the generator inside the arithmetic — the
      // DuckDB-legal spelling Spark rejects without the hoist
      new graft.server.Engine(s).execute(
        """SELECT o_orderkey * 10 + unnest(generate_series(1, 3)) AS slot
          |FROM orders WHERE o_orderkey <= 40
          |ORDER BY slot""".stripMargin).df
    }
  )
}
