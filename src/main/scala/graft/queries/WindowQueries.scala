package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables
import QueryDef.q

/** Window surface (SURVEY §2-B.5): analytic functions ± IGNORE NULLS,
  * ROWS/RANGE frames, distribution functions, QUALIFY-style top-n.
  *
  * Every window ORDER BY used for value-carrying functions
  * (lead/lag/frames/running sums) is made total by a unique tie-break
  * key — without it Spark's and DuckDB's within-peer row order is
  * engine-dependent and results legitimately differ. Running sums over
  * doubles go through DECIMAL so the frame's accumulation order is
  * arithmetic-exact on both engines.
  */
object WindowQueries {

  val all: Seq[QueryDef] = Seq(

    q("q_win_leadlag",
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey) OVER w AS prev_ok,
        |  lead(o_orderkey) OVER w AS next_ok,
        |  lag(o_orderkey, 2, -1) OVER w AS prev2,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
        |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey LIMIT 600""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t.orders.select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_ok"),
        lead(col("o_orderkey"), 1).over(w).as("next_ok"),
        lag(col("o_orderkey"), 2, -1).over(w).as("prev2"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(wAll).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(wAll).as("second_ok"))
        .orderBy(col("o_custkey"), col("o_orderkey")).limit(600)
    },

    q("q_win_running",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
        |    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty,
        |  round(CAST(avg(CAST(l_quantity AS DECIMAL(18,6)))
        |    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS mov_avg,
        |  count(*) OVER (PARTITION BY l_orderkey) AS n_lines
        |FROM lineitem WHERE l_orderkey <= 500
        |ORDER BY l_orderkey, l_linenumber, run_qty LIMIT 800""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val byLine = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"), col("l_partkey"))
      t.lineitem.filter(col("l_orderkey") <= 500)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity").cast(DecimalType(18, 6)))
            .over(byLine.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("run_qty"),
          round(avg(col("l_quantity").cast(DecimalType(18, 6)))
            .over(byLine.rowsBetween(-2, Window.currentRow)).cast("double"), 6).as("mov_avg"),
          count(lit(1)).over(Window.partitionBy(col("l_orderkey"))).as("n_lines"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("run_qty")).limit(800)
    },

    q("q_win_range_frame",
      """SELECT o_orderkey, o_custkey, od,
        |  count(*) OVER (PARTITION BY o_custkey % 32 ORDER BY od RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS n_7d
        |FROM (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
        |      FROM orders WHERE o_orderkey <= 2000)
        |ORDER BY od, o_orderkey, n_7d LIMIT 600""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      // RANGE with interval offsets needs SQL (DataFrame rangeBetween is
      // long-typed). PARTITION BY is the scale contract: an ORDER
      // BY-only window funnels the whole input through one task at any
      // size. The cohort key (o_custkey % 32) stands in for whatever
      // entity the 7-day count is really about.
      s.sql(
        """SELECT o_orderkey, o_custkey, od,
          |  count(*) OVER (PARTITION BY o_custkey % 32 ORDER BY od RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS n_7d
          |FROM (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
          |      FROM orders WHERE o_orderkey <= 2000)
          |ORDER BY od, o_orderkey, n_7d LIMIT 600""".stripMargin)
    },

    q("q_win_distribution",
      """SELECT p_partkey, p_size,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 9) AS pr,
        |  round(cume_dist() OVER w, 9) AS cd
        |FROM part
        |WINDOW w AS (ORDER BY p_size, p_partkey)
        |ORDER BY p_partkey LIMIT 500""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // ntile/percent_rank/cume_dist need the GLOBAL rank — but not a
      // global single-task window: range-repartition + in-partition
      // sort + zipWithIndex gives the rank distributed (per-partition
      // counts + cumulative offsets), and the three distribution
      // functions are then pure arithmetic over (rank, n). Ties are
      // impossible (p_partkey is unique in the sort key), so
      // rank == row position and the closed forms match exactly.
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val sorted = t.part.select(col("p_partkey"), col("p_size"))
        .repartitionByRange(col("p_size"), col("p_partkey"))
        .sortWithinPartitions(col("p_size"), col("p_partkey"))
      val schema = StructType(sorted.schema.fields :+ StructField("rnk", LongType, nullable = false))
      val ranked = s.createDataFrame(
        sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }, schema)
      val nDf = ranked.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(nDf)).selectExpr(
        "p_partkey", "p_size",
        // ntile(4): first n%4 buckets hold (n div 4)+1 rows
        """CAST(CASE WHEN rnk <= (n % 4) * ((n div 4) + 1)
          |     THEN (rnk - 1) div ((n div 4) + 1) + 1
          |     ELSE (n % 4) + (rnk - (n % 4) * ((n div 4) + 1) - 1) div greatest(n div 4, 1) + 1
          |     END AS INT) AS quartile""".stripMargin,
        "round(CAST(rnk - 1 AS DOUBLE) / (n - 1), 9) AS pr",
        "round(CAST(rnk AS DOUBLE) / n, 9) AS cd")
        .orderBy(col("p_partkey")).limit(500)
    },

    q("q_win_exclude",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
        |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS DOUBLE) AS neighbor_qty
        |FROM lineitem WHERE l_orderkey <= 500
        |ORDER BY l_orderkey, l_linenumber, neighbor_qty NULLS FIRST LIMIT 600""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // frame EXCLUDE CURRENT ROW (DuckDB supports it, Spark doesn't):
      // for distributive aggregates it's the full frame minus the
      // current row's contribution — same window, one extra subtraction.
      // An empty excluded frame (single-row frame) must yield NULL, not
      // 0, matching SUM over the empty set.
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"), col("l_partkey"))
        .rowsBetween(-2, 2)
      t.lineitem.filter(col("l_orderkey") <= 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          when(count(lit(1)).over(w) === 1, lit(null))
            .otherwise(sum(col("l_quantity").cast(DecimalType(18, 6))).over(w)
              - col("l_quantity").cast(DecimalType(18, 6)))
            .cast("double").as("neighbor_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("neighbor_qty").asc_nulls_first).limit(600)
    },

    q("q_win_qualify",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // QUALIFY (DuckDB ext.) = window + filter on the window column —
      // the rewrite SURVEY §4.3 prescribes.
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t.orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"))
    },

    q("q_win_ignore_nulls",
      """SELECT event_id, user_id,
        |  last_value(big_val IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_big
        |FROM (SELECT event_id, user_id, ts,
        |        CASE WHEN value > 150 THEN value END AS big_val
        |      FROM events)
        |ORDER BY user_id, event_id LIMIT 800""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t.events
        .withColumn("big_val", when(col("value") > 150, col("value")))
        .select(
          col("event_id"), col("user_id"),
          last(col("big_val"), ignoreNulls = true).over(w).as("last_big"))
        .orderBy(col("user_id"), col("event_id")).limit(800)
    }
  )
}
