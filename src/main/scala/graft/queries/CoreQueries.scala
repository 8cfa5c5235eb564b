package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables
import graft.functions.FixedPointSum.sumFix
import QueryDef.q

/** Core relational surface (SURVEY §2-B.1–B.7): scans, predicates,
  * joins of every shape, aggregation, windows, sort/limit, set ops.
  * Each entry is the Spark-first implementation; its DuckDB oracle
  * lives beside it.
  *
  * Scale notes baked into the shapes below:
  *  - dimension joins (`nation`, `region`) are explicitly
  *    `broadcast()` — at 100 TB the fact side never shuffles for them;
  *  - aggregations use codegen'd HashAggregate with map-side partials
  *    (nothing here forces a sort-based agg);
  *  - top-k is ORDER BY + LIMIT so Spark plans
  *    TakeOrderedAndProject (per-partition heap + driver merge), not a
  *    global sort.
  */
object CoreQueries {

  /** Exact-decimal view of a double column: aggregation over DECIMAL is
    * associative-exact, so Spark partial-agg order vs DuckDB morsel
    * order cannot produce differing results (SURVEY §7.3 alignment). */
  // double → DECIMAL(18,6) via the unscaled-long fast path (no
  // BigDecimal per row); see graft.functions.DoubleToDec6
  private def dec(c: Column): Column =
    graft.functions.DoubleToDec6.dec6(c.cast("double"))

  // fixed-point fast path for 2-decimal money sums (same contract as
  // TpchQueries): cents-long per row, zero-allocation exact sum, one
  // exact division back before the double cast
  private def cents(c: Column): Column = graft.functions.DoubleToScaledLong.cents(c)
  private def unfix(c: Column): Column = (c / 100).cast("double")

  val all: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- B.4/B.1
    // Big decimal sums travel as canonical DECIMAL(38,6) strings: the
    // sum itself is exact decimal (merge-order independent), but a
    // final decimal->double cast can differ by 1 ulp between engines
    // once the unscaled value exceeds 2^53 (DuckDB converts unscaled
    // int then divides; Spark rounds via BigDecimal) — the string form
    // is scale-independent-deterministic. Both engines render
    // DECIMAL(38,6) with the full 6-digit fraction.
    q("q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_disc_price,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_charge,
        |  count(*) AS count_order,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // Fixed-point fast path (the TpchQueries revenue pattern): every
      // measure is a 2-decimal value, so price→cents, disc/tax→
      // hundredths become LONGs, the disc_price/charge products are
      // codegen'd long multiplies carrying the value at scale 1e4/1e6,
      // and each sum runs through the zero-allocation FixedPointSum.
      // The exact DECIMAL(38,0) sums are divided back to scale 6 (the
      // divisions are exact: the scaled values have ≤6 decimals) before
      // the DECIMAL(38,6)→VARCHAR render, so the strings are
      // bit-identical to the oracle's per-row DECIMAL(18,6) arithmetic:
      // the double products sit within ~4e-10 of their exact 6-decimal
      // expansion, far inside the 5e-7 rounding boundary, so both
      // engines' per-row rounding lands on the same grid point.
      // one codegen'd multiply+floor per row, no BigDecimal — see
      // functions/DecimalExpressions.scala (DoubleToScaledLong)
      def cents(c: String) = graft.functions.DoubleToScaledLong.cents(col(c))
      val qty = cents("l_quantity")
      val price = cents("l_extendedprice")
      val disc = cents("l_discount")
      val tax = cents("l_tax")
      val discPrice = price * (lit(100L) - disc)          // scale 1e4
      val charge = discPrice * (lit(100L) + tax)          // scale 1e6
      def str6(c: Column, div: Long): Column =
        (c / div).cast(DecimalType(38, 6)).cast("string")
      t.lineitem
        // ts ≤ end-of-1998-09-02 ⇔ ts < 1998-09-03: the raw TIMESTAMP
        // compare pushes to the parquet scan (row-group pruning +
        // primitive long compare); the per-row ts→date cast did not
        .filter(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-09-03 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          str6(sumFix(qty), 100L).as("sum_qty"),
          str6(sumFix(price), 100L).as("sum_base_price"),
          str6(sumFix(discPrice), 10000L).as("sum_disc_price"),
          str6(sumFix(charge), 1000000L).as("sum_charge"),
          count(lit(1)).as("count_order"),
          ((sumFix(disc) / 100L).cast("double") / count(lit(1))).as("avg_disc"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---------------------------------------------------------------- B.1/B.2
    q("q_scan_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 20
        |  AND l_linenumber % 2 = 1
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // order by the full output row so the LIMIT cut is deterministic.
      t.lineitem
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        .filter(col("l_returnflag").isin("A", "R")
          && col("l_quantity").between(10, 20)
          && col("l_linenumber") % 2 === 1)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        .limit(100)
    },

    q("q_case_coalesce",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2,
        |  greatest(o_totalprice, 150000.0) AS gt,
        |  least(o_custkey, 100) AS lt
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.orders.select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status2"),
        greatest(col("o_totalprice"), lit(150000.0)).as("gt"),
        least(col("o_custkey"), lit(100L)).as("lt"))
        .orderBy(col("o_orderkey")).limit(500)
    },

    // ---------------------------------------------------------------- B.3 joins
    q("q_join_inner_agg",
      """SELECT n_name,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"), unfix(sumFix(cents(col("o_totalprice")))).as("total"))
        .orderBy(col("n_name"))
    },

    // Bucketed co-located join: both sides pre-hashed into the same
    // bucket count on the join key, so the sort-merge join (and the
    // following same-key aggregation) run with ZERO shuffle exchanges —
    // the canonical 100 TB fact-to-fact join layout. PlanSpec asserts
    // the no-exchange property. Logically identical to a plain join, so
    // the DuckDB oracle is the plain SQL.
    q("q_join_bucketed",
      """SELECT c_custkey,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey LIMIT 400""".stripMargin) { (s, dir) =>
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      val (ot, ct) = (s"b_orders_$tag", s"b_customer_$tag")
      def bucketize(src: String, table: String, key: String): Unit =
        if (!s.catalog.tableExists(table)) {
          // a previous session's dir under the warehouse would collide
          val stale = new java.io.File(
            s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete()
          }
          if (stale.exists()) rm(stale)
          s.read.parquet(s"$dir/$src.parquet").write
            .bucketBy(8, key).sortBy(key).mode("overwrite").saveAsTable(table)
        }
      bucketize("orders", ot, "o_custkey")
      bucketize("customer", ct, "c_custkey")
      s.table(ot).hint("merge")
        .join(s.table(ct), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_orders"), unfix(sumFix(cents(col("o_totalprice")))).as("spend"))
        .orderBy(col("c_custkey")).limit(400)
    },

    // Salted skew join: a hot key floods one reducer in a plain
    // shuffle join. Salting splits each big-side key into S sub-keys
    // (deterministic pmod of a row hash — Bench/Verify must replay
    // identically) and replicates the small side S times, so the hot
    // key's rows spread over S tasks. AQE skew-split handles runtime
    // skew; this is the declarative layout when skew is known a priori.
    // Logically identical to the plain join → plain-SQL oracle.
    q("q_join_salted_skew",
      """SELECT o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val S = 8
      val big = t.orders.withColumn("salt",
        pmod(hash(col("o_orderkey")), lit(S)))
      val small = t.customer.crossJoin(
        s.range(S).select(col("id").cast("int").as("salt")))
      big.join(small,
          big("o_custkey") === small("c_custkey") && big("salt") === small("salt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), unfix(sumFix(cents(col("o_totalprice")))).as("total"))
        .orderBy(col("o_orderpriority"))
    },

    q("q_join_left",
      """SELECT c_custkey,
        |  count(o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey LIMIT 200""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          unfix(coalesce(sumFix(cents(col("o_totalprice"))), lit(0).cast(DecimalType(38, 0)))).as("spend"))
        .orderBy(col("c_custkey")).limit(200)
    },

    q("q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter(col("o_totalprice") > 250000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    q("q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    q("q_join_full",
      """SELECT coalesce(k, k2) AS key, bal, n FROM
        |  (SELECT c_custkey AS k, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
        |   FROM customer WHERE c_custkey <= 100) a
        |FULL JOIN
        |  (SELECT o_custkey AS k2, count(*) AS n FROM orders
        |   WHERE o_custkey BETWEEN 50 AND 150 GROUP BY o_custkey) b
        |ON k = k2
        |ORDER BY key""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val a = t.customer.filter(col("c_custkey") <= 100)
        .select(col("c_custkey").as("k"),
          col("c_acctbal").cast(DecimalType(18, 2)).cast("double").as("bal"))
      val b = t.orders.filter(col("o_custkey").between(50, 150))
        .groupBy(col("o_custkey").as("k2")).agg(count(lit(1)).as("n"))
      a.join(b, col("k") === col("k2"), "full")
        .select(coalesce(col("k"), col("k2")).as("key"), col("bal"), col("n"))
        .orderBy(col("key"))
    },

    q("q_join_cross",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.region.crossJoin(t.nation)
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    },

    q("q_join_theta",
      """SELECT s_suppkey, count(*) AS n_poorer
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.supplier
        .join(t.customer,
          col("s_nationkey") === col("c_nationkey") && col("s_acctbal") > col("c_acctbal"))
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_poorer"))
        .orderBy(col("s_suppkey"))
    },

    // ---------------------------------------------------------------- B.4
    q("q_agg_distinct",
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderpriority) AS n_prio,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.orders.groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },

    q("q_agg_filter_clause",
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  count(*) FILTER (WHERE l_quantity <= 25) AS n_small,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // the filtered money sum rides the fixed-point path: a NULL-out
      // `when` IS the FILTER clause to a null-skipping aggregate, and
      // the quantity grid is 2-decimal so cents-long + exact /100
      // reproduces the DECIMAL(18,6) sum bit-for-bit in the double cast
      t.lineitem.groupBy(col("l_returnflag"))
        .agg(
          expr("count(*) FILTER (WHERE l_quantity > 25)").as("n_big"),
          expr("count(*) FILTER (WHERE l_quantity <= 25)").as("n_small"),
          unfix(sumFix(when(col("l_linestatus") === "F", cents(col("l_quantity"))))).as("qty_f"))
        .orderBy(col("l_returnflag"))
    },

    // ---------------------------------------------------------------- B.5
    q("q_window_rank",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rn,
        |    rank() OVER w AS rk,
        |    dense_rank() OVER w AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey)
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey"))
      t.orders.select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },

    // ---------------------------------------------------------------- B.7
    q("q_setops",
      """WITH x AS (SELECT o_custkey AS k FROM orders WHERE o_custkey <= 500),
        |     y AS (SELECT c_custkey AS k FROM customer WHERE c_custkey >= 300)
        |SELECT 'intersect' AS op, k FROM (SELECT k FROM x INTERSECT SELECT k FROM y)
        |UNION ALL
        |SELECT 'except' AS op, k FROM (SELECT k FROM x EXCEPT SELECT k FROM y)
        |UNION ALL
        |SELECT 'union' AS op, k FROM (SELECT k FROM x UNION SELECT k FROM y)
        |ORDER BY op, k""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val x = t.orders.filter(col("o_custkey") <= 500).select(col("o_custkey").as("k"))
      val y = t.customer.filter(col("c_custkey") >= 300).select(col("c_custkey").as("k"))
      x.intersect(y).withColumn("op", lit("intersect"))
        .union(x.except(y).withColumn("op", lit("except")))
        .union(x.union(y).distinct().withColumn("op", lit("union")))
        .select(col("op"), col("k"))
        .orderBy(col("op"), col("k"))
    },

    q("q_setops_all",
      """WITH x AS (SELECT l_suppkey AS k FROM lineitem WHERE l_suppkey <= 40),
        |     y AS (SELECT s_suppkey AS k FROM supplier)
        |SELECT k, count(*) AS n FROM (
        |  SELECT k FROM (SELECT k FROM x INTERSECT ALL SELECT k FROM y)
        |  UNION ALL
        |  SELECT k FROM (SELECT k FROM y EXCEPT ALL SELECT k FROM x)
        |) GROUP BY k ORDER BY k""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val x = t.lineitem.filter(col("l_suppkey") <= 40).select(col("l_suppkey").as("k"))
      val y = t.supplier.select(col("s_suppkey").as("k"))
      x.intersectAll(y).union(y.exceptAll(x))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    },

    // ---------------------------------------------------------------- B.6
    q("q_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.orders.select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15)
    },

    q("q_limit_offset",
      """SELECT o_orderkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 40""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.orders.select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
        .offset(40).limit(20)
    },

    q("q_orderby_nulls",
      """SELECT l_orderkey, l_linenumber, nullif(l_returnflag, 'N') AS flag
        |FROM lineitem
        |ORDER BY flag ASC NULLS LAST, l_orderkey, l_linenumber
        |LIMIT 50""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("flag"))
        .orderBy(col("flag").asc_nulls_last, col("l_orderkey"), col("l_linenumber"))
        .limit(50)
    }
  )
}
