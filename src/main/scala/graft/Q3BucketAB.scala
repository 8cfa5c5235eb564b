package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B for the r11 verdict's q3-at-sf10 question: does an
  * orderkey-bucketed layout (orders+lineitem bucketed on the join key,
  * zero-exchange merge join like q_join_bucketed) beat the shipped
  * pre-aggregation plan at the sf10 tier? Layout build is untimed
  * (one-time warehouse work). Timing: alternating reps, min per
  * variant, AQE on, tier shuffle partitions — the BENCH_NOTES tier
  * protocol.
  *
  * Usage: sbt 'runMain graft.Q3BucketAB [sfDir] [buckets] [reps]'
  */
object Q3BucketAB {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/target/sf10")
    val nb = args.lift(1).map(_.toInt).getOrElse(32)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "256")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- shipped plan (the bench entry) --------------------------------
    graft.engine.Tables(spark, dir)
    def shipped(): DataFrame = SparkEntry.queries("q_tpch_q3")(spark, dir)

    // ---- bucketed layout (untimed build) -------------------------------
    def bucketize(src: String, table: String, key: String): Unit =
      if (!spark.catalog.tableExists(table)) {
        val stale = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete()
        }
        if (stale.exists()) rm(stale)
        spark.read.parquet(s"$dir/$src.parquet").write
          .bucketBy(nb, key).sortBy(key).mode("overwrite").saveAsTable(table)
      }
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val (obt, lbt) = (s"b3_orders_$tag", s"b3_lineitem_$tag")
    val tBuild = time {
      bucketize("orders", obt, "o_orderkey")
      bucketize("lineitem", lbt, "l_orderkey")
    }
    println(s"[layout] bucket build (untimed in the A/B): ${tBuild}s")

    def bucketed(): DataFrame = {
      val cents = (c: org.apache.spark.sql.Column) =>
        (c.cast("decimal(18,2)") * 100).cast("long")
      val cust = spark.table("customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = spark.table(obt).filter(col("o_orderdate") < lit("1997-06-15"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      // per-line revenue in fixed-point cents², summed exactly then
      // unscaled — same arithmetic as the shipped plan
      val li = spark.table(lbt).filter(col("l_shipdate") > lit("1997-06-15"))
        .select(col("l_orderkey"),
          (cents(col("l_extendedprice")) *
            (lit(100L) - cents(col("l_discount")))).as("rev"))
      val liAgg = li.groupBy(col("l_orderkey")).agg(sum(col("rev")).as("rev_sum"))
      liAgg.hint("merge")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("l_orderkey"),
          (col("rev_sum").cast("double") / 1e4).as("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    }

    // correctness cross-check before timing
    val a = shipped().collect().map(_.toString).toSeq
    val b = bucketed().collect().map(_.toString).toSeq
    println(s"[check] results match: ${a == b}")
    if (a != b) {
      println("A: " + a.take(3).mkString(" | "))
      println("B: " + b.take(3).mkString(" | "))
    }

    var (bestA, bestB) = (Double.MaxValue, Double.MaxValue)
    (1 to reps).foreach { i =>
      val ta = time(shipped().collect())
      val tb = time(bucketed().collect())
      bestA = math.min(bestA, ta); bestB = math.min(bestB, tb)
      println(f"[rep $i] shipped=$ta%.3f bucketed=$tb%.3f")
    }
    println(f"[A/B] shipped(min)=$bestA%.3f bucketed(min)=$bestB%.3f buckets=$nb sf=$dir")
    spark.sql(s"DROP TABLE IF EXISTS $obt")
    spark.sql(s"DROP TABLE IF EXISTS $lbt")
    spark.stop()
  }
}
