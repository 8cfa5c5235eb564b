package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables
import QueryDef.q

/** Subqueries, lateral, CTEs, pivot/unpivot, VALUES, TVFs
  * (SURVEY §2-B.1/B.2/B.9). Catalyst decorrelates the correlated
  * shapes into joins (RewriteCorrelatedScalarSubquery /
  * RewritePredicateSubquery) — the plans below become broadcast or
  * shuffle joins, never per-row re-execution, which is what makes them
  * viable at 100 TB.
  */
object SubqueryQueries {

  val all: Seq[QueryDef] = Seq(

    q("q_sub_scalar",
      """SELECT o_orderkey,
        |  round(o_totalprice / (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |                        FROM orders), 9) AS rel_price
        |FROM orders ORDER BY o_orderkey LIMIT 400""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      Tables(s, dir)
      s.sql(
        """SELECT o_orderkey,
          |  round(o_totalprice / (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*)
          |                        FROM orders), 9) AS rel_price
          |FROM orders ORDER BY o_orderkey LIMIT 400""".stripMargin)
    },

    q("q_sub_correlated",
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
        |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS top_price
        |FROM customer
        |WHERE c_custkey <= 300
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      Tables(s, dir)
      s.sql(
        """SELECT c_custkey,
          |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
          |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS top_price
          |FROM customer
          |WHERE c_custkey <= 300
          |ORDER BY c_custkey""".stripMargin)
    },

    q("q_sub_in",
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        |  AND s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      Tables(s, dir)
      s.sql(
        """SELECT s_suppkey, s_name FROM supplier
          |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
          |  AND s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
          |ORDER BY s_suppkey""".stripMargin)
    },

    q("q_lateral_topn",
      """SELECT n_name, c_custkey, c_acctbal FROM nation,
        |  LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |           WHERE c_nationkey = n_nationkey
        |           ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top2
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // Spark-first shape for per-group top-n: rank window + filter —
      // one shuffle on the group key, no correlated re-execution.
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t.customer
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("n_name"), col("c_acctbal").desc, col("c_custkey"))
    },

    q("q_cte_nested",
      """WITH big AS (
        |  SELECT o_custkey, count(*) AS n FROM orders
        |  WHERE o_totalprice > 150000 GROUP BY o_custkey
        |), ranked AS (
        |  SELECT o_custkey, n, dense_rank() OVER (ORDER BY n DESC, o_custkey) AS rk FROM big
        |)
        |SELECT r.o_custkey, r.n, r.rk, c.c_name
        |FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
        |WHERE r.rk <= 20
        |ORDER BY r.rk, r.o_custkey""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val big = t.orders.filter(col("o_totalprice") > 150000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      // top-20-then-rank: (n, o_custkey) is unique per row, so
      // dense_rank ≤ 20 is exactly the first 20 rows of the sort —
      // orderBy().limit(20) plans as TakeOrderedAndProject (per-
      // partition heaps, no global sort) and the rank is the position
      // among the ≤20 survivors. A global dense_rank window would sort
      // every qualifying customer in ONE task.
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val top = big.orderBy(col("n").desc, col("o_custkey")).limit(20)
      val rows = top.rdd.zipWithIndex.map { case (r, i) =>
        Row(r.getLong(0), r.getLong(1), i + 1L) }
      val ranked = s.createDataFrame(rows, StructType(Seq(
        StructField("o_custkey", LongType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("rk", LongType, nullable = false))))
      broadcast(ranked).join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("o_custkey"), col("n"), col("rk"), col("c_name"))
        .orderBy(col("rk"), col("o_custkey"))
    },

    q("q_cte_recursive",
      """WITH RECURSIVE fib(i, a, b) AS (
        |  SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
        |  UNION ALL
        |  SELECT i + 1, b, a + b FROM fib WHERE i < 30
        |)
        |SELECT i, a AS fib_i FROM fib ORDER BY i""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      s.sql(
        """WITH RECURSIVE fib(i, a, b) AS (
          |  SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
          |  UNION ALL
          |  SELECT i + 1, b, a + b FROM fib WHERE i < 30
          |)
          |SELECT i, a AS fib_i FROM fib ORDER BY i""".stripMargin)
    },

    q("q_pivot",
      """SELECT l_linestatus, CAST("A" AS DOUBLE) AS "A", CAST("N" AS DOUBLE) AS "N",
        |       CAST("R" AS DOUBLE) AS "R" FROM (
        |  PIVOT (SELECT l_linestatus, l_returnflag, CAST(l_quantity AS DECIMAL(18,6)) AS qty FROM lineitem)
        |  ON l_returnflag IN ('A', 'N', 'R') USING sum(qty) GROUP BY l_linestatus
        |) ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // the measure rides the fixed-point fast path: cents as a raw
      // long into FixedPointSum (no per-row BigDecimal cast), the
      // exact DECIMAL(38,0) sums divided back before the double cast —
      // same value as the oracle's DECIMAL(18,6) sum, bit-identical
      def un(c: org.apache.spark.sql.Column) = (c / 100).cast("double")
      t.lineitem
        .select(col("l_linestatus"), col("l_returnflag"),
          graft.functions.DoubleToScaledLong.cents(col("l_quantity")).as("qty"))
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(graft.functions.FixedPointSum.sumFix(col("qty")))
        .select(col("l_linestatus"), un(col("A")).as("A"),
          un(col("N")).as("N"), un(col("R")).as("R"))
        .orderBy(col("l_linestatus"))
    },

    q("q_unpivot",
      """WITH agg AS (
        |  SELECT o_orderstatus,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
        |    CAST(count(*) AS DOUBLE) AS cnt
        |  FROM orders GROUP BY o_orderstatus
        |)
        |SELECT o_orderstatus, metric, val
        |FROM agg UNPIVOT (val FOR metric IN (total, cnt))
        |ORDER BY o_orderstatus, metric""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.orders.groupBy(col("o_orderstatus"))
        .agg((graft.functions.FixedPointSum.sumFix(graft.functions.DoubleToScaledLong.cents(col("o_totalprice"))) / 100).cast("double").as("total"),
          count(lit(1)).cast("double").as("cnt"))
        .unpivot(Array(col("o_orderstatus")), Array(col("total"), col("cnt")), "metric", "val")
        .orderBy(col("o_orderstatus"), col("metric"))
    },

    q("q_values_tvf",
      """SELECT v.code, v.label, r.range AS seq_n
        |FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) v(code, label)
        |JOIN range(1, 4) r ON v.code = r.range
        |ORDER BY v.code""".stripMargin) { (s, dir) =>
      import s.implicits._
      val v = Seq((1, "one"), (2, "two"), (3, "three")).toDF("code", "label")
      val r = s.range(1, 4).select(col("id").cast("long").as("seq_n"))
      v.join(r, col("code") === col("seq_n"))
        .select(col("code"), col("label"), col("seq_n"))
        .orderBy(col("code"))
    }
  )
}
