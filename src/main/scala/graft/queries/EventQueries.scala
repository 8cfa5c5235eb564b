package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables
import QueryDef.q

/** Time-series operators over the events table (SURVEY §2-B.3 ASOF /
  * range / positional joins + the B.10 extension surface expressed as
  * batch shapes): tumbling buckets, gap sessionization, as-of joins,
  * time-range joins, positional zip.
  *
  * Scale notes: every shape here partitions by user_id (or a time
  * bucket) before any ordering — the windows sort within partitions
  * only, so no global sort exists in any plan. The as-of join is the
  * union-tag + last_value(IGNORE NULLS) rewrite (SURVEY §2-B.3): one
  * shuffle on the key, linear scan within partition — the same
  * complexity DuckDB's native ASOF operator has, and it beats an
  * inequality join's O(n·m) at 100 TB.
  */
object EventQueries {

  val all: Seq[QueryDef] = Seq(

    q("q_evt_bucket",
      """SELECT date_trunc('hour', ts) AS hr, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hr, event_type LIMIT 700""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.events
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hr"), col("event_type"))
        .agg(count(lit(1)).as("n"), (graft.functions.FixedPointSum.sumFix(graft.functions.DoubleToScaledLong.cents(col("value"))) / 100).cast("double").as("total"))
        .orderBy(col("hr"), col("event_type")).limit(700)
    },

    q("q_evt_session",
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL 30 MINUTE
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |), sessions AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_id
        |  FROM marked
        |)
        |SELECT user_id, sess_id, count(*) AS n_events,
        |  min(ts) AS sess_start, max(ts) AS sess_end
        |FROM sessions
        |GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id LIMIT 800""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val marked = t.events.withColumn("new_sess",
        when(col("ts") - lag(col("ts"), 1).over(byUser) > expr("INTERVAL 30 MINUTE")
          || lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0))
      marked
        .withColumn("sess_id", sum(col("new_sess")).over(byUser))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"))
        .orderBy(col("user_id"), col("sess_id")).limit(800)
    },

    q("q_evt_asof",
      """SELECT p.event_id, p.user_id, p.ts,
        |  s.ts AS signup_ts, s.event_id AS signup_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.user_id, p.ts, p.event_id LIMIT 800""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // ASOF rewrite: tag both sides, union, per-key ordered scan with
      // last_value(IGNORE NULLS) carrying the most recent right row
      // forward, then keep left rows. DuckDB ties (p.ts == s.ts) match,
      // so right rows sort before left rows at equal ts (side asc).
      val p = t.events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("side"),
          lit(null).cast("timestamp_ntz").as("r_ts"), lit(null).cast("long").as("r_id"))
      val sgn = t.events.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"), lit(0).as("side"),
          col("ts").as("r_ts"), col("event_id").as("r_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("r_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p.unionByName(sgn)
        .withColumn("signup_ts", last(col("r_ts"), ignoreNulls = true).over(w))
        .withColumn("signup_id", last(col("r_id"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"), col("ts"), col("signup_ts"), col("signup_id"))
        .orderBy(col("user_id"), col("ts"), col("event_id")).limit(800)
    },

    q("q_evt_range_join",
      """SELECT e.event_id, count(c.event_id) AS n_clicks_1h
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id
        |  AND c.ts BETWEEN e.ts - INTERVAL 1 HOUR AND e.ts
        |GROUP BY e.event_id
        |ORDER BY e.event_id LIMIT 800""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val e = t.events.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id").as("e_uid"), col("ts").as("e_ts"))
      val c = t.events.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_uid"), col("ts").as("c_ts"))
      // Equi-key on user_id makes this a hash join with a range residual
      // — not a nested-loop. (The bucketed-by-hour variant removes the
      // per-key skew at 100 TB; user_id keys here are already granular.)
      e.join(c,
        col("e_uid") === col("c_uid")
          && col("c_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR")
          && col("c_ts") <= col("e_ts"), "left")
        .groupBy(col("e_id").as("event_id"))
        .agg(count(col("c_id")).as("n_clicks_1h"))
        .orderBy(col("event_id")).limit(800)
    },

    q("q_evt_range_join_bucketed",
      """SELECT e.event_id, count(c.event_id) AS n_clicks_1h
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id
        |  AND c.ts BETWEEN e.ts - INTERVAL 1 HOUR AND e.ts
        |GROUP BY e.event_id
        |ORDER BY e.event_id LIMIT 800""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // Scale path for the range join: block on (user, hour-bucket) so
      // the join key carries the time dimension too — each error probes
      // exactly 2 buckets (its own hour + the previous) instead of the
      // user's whole history. Same answer as q_evt_range_join; at 100 TB
      // this caps per-key fan-in at two hours of one user's clicks.
      val e = t.events.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id").as("e_uid"), col("ts").as("e_ts"))
        .withColumn("probe_bkt", explode(array(
          floor(unix_timestamp(col("e_ts").cast("timestamp")) / 3600),
          floor(unix_timestamp(col("e_ts").cast("timestamp")) / 3600) - 1)))
      val c = t.events.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_uid"), col("ts").as("c_ts"))
        .withColumn("c_bkt", floor(unix_timestamp(col("c_ts").cast("timestamp")) / 3600))
      e.join(c,
          col("e_uid") === col("c_uid") && col("probe_bkt") === col("c_bkt")
            && col("c_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR")
            && col("c_ts") <= col("e_ts"), "left")
        // the 2-bucket probe duplicates each error row; collapse matches
        // per error with a distinct count (c_id is unique)
        .groupBy(col("e_id").as("event_id"))
        .agg(count_distinct(col("c_id")).as("n_clicks_1h"))
        .orderBy(col("event_id")).limit(800)
    },

    q("q_evt_positional",
      """SELECT a.event_id AS purchase_id, b.event_id AS signup_id, a.rn
        |FROM (SELECT event_id, row_number() OVER (ORDER BY ts, event_id) AS rn
        |      FROM events WHERE event_type = 'purchase') a
        |JOIN (SELECT event_id, row_number() OVER (ORDER BY ts, event_id) AS rn
        |      FROM events WHERE event_type = 'signup') b
        |ON a.rn = b.rn
        |ORDER BY a.rn LIMIT 600""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // POSITIONAL JOIN (DuckDB ext.) = zip by explicit row rank; the
      // rank is made deterministic by a total ORDER BY on both inputs.
      // An unpartitioned row_number() would sort each whole stream in
      // ONE task; instead range-repartition + in-partition sort gives a
      // distributed total order and zipWithIndex assigns contiguous
      // global ranks from per-partition counts + cumulative offsets —
      // every stage stays parallel at 100 TB.
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      def ranked(typ: String, idName: String) = {
        val sorted = t.events.filter(col("event_type") === typ)
          .select(col("event_id"), col("ts"))
          .repartitionByRange(col("ts"), col("event_id"))
          .sortWithinPartitions(col("ts"), col("event_id"))
        val rows = sorted.rdd.zipWithIndex.map { case (r, i) => Row(r.getLong(0), i + 1L) }
        s.createDataFrame(rows, StructType(Seq(
          StructField(idName, LongType, nullable = false),
          StructField("rn", LongType, nullable = false))))
      }
      val a = ranked("purchase", "purchase_id")
      val b = ranked("signup", "signup_id").withColumnRenamed("rn", "rn_b")
      a.join(b, col("rn") === col("rn_b"))
        .select(col("purchase_id"), col("signup_id"), col("rn"))
        .orderBy(col("rn")).limit(600)
    },

    q("q_evt_funnel",
      """WITH firsts AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        |  FROM events GROUP BY user_id
        |)
        |SELECT user_id, first_view, first_purchase
        |FROM firsts
        |WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        |  AND first_purchase > first_view
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.events.groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("first_view"),
          min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
        .filter(col("first_view").isNotNull && col("first_purchase").isNotNull
          && col("first_purchase") > col("first_view"))
        .orderBy(col("user_id"))
    }
  )
}
