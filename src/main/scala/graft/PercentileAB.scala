package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B for the percentile file (VERDICT r13 item 2: decide).
  * Three exact-percentile plans over the bench query's shape, timed
  * alternating-reps min-per-variant with the host calib op:
  *
  *   shipped  — the bucket-first two-scan plan in the tree (bounded
  *              ≤65k-key state, no whole-group sort in one task)
  *   buffer   — Spark's exact `percentile` aggregate (holds every
  *              group value in the agg buffer — unbounded per-group
  *              state; DuckDB's quantile_cont does the same, which is
  *              why it wins small and OOMs big)
  *   sortwin  — one global sort-window plan (row_number per group +
  *              bracket pick): a single shuffle, but each whole group
  *              sorts in ONE task — the r5 shape the bucketed plan
  *              replaced
  *
  * Usage: sbt 'runMain graft.PercentileAB [sfDir] [reps] [shufflePartitions]'
  */
object PercentileAB {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val shuffle = args.lift(2).getOrElse("32")
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", shuffle)
    import spark.implicits._

    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id * 2)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    graft.engine.Tables(spark, dir)

    def shipped(): DataFrame = SparkEntry.queries("q_agg_percentile")(spark, dir)

    def buffer(): DataFrame = spark.sql(
      """SELECT l_returnflag,
        |  round(percentile(l_quantity, 0.5), 6) AS med,
        |  round(percentile(l_quantity, 0.25), 6) AS p25,
        |  round(percentile(l_quantity, 0.75), 6) AS p75,
        |  round(percentile(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)

    def sortwin(): DataFrame = {
      // (group, which, v) value table; one sort-window per (group,which)
      val li = spark.table("lineitem")
      val vals = li.select(col("l_returnflag").as("g"),
          lit("q").as("which"), col("l_quantity").cast("double").as("v"))
        .unionAll(li.select(col("l_returnflag").as("g"),
          lit("p").as("which"), col("l_extendedprice").cast("double").as("v")))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("g"), col("which")).orderBy(col("v"))
      val wAll = Window.partitionBy(col("g"), col("which"))
      val ranked = vals
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
      val ps = Seq(("med", 0.5, "q"), ("p25", 0.25, "q"), ("p75", 0.75, "q"),
        ("p90_price", 0.9, "p")).toDF("pname", "p", "pwhich")
      val pos = (col("n") - 1) * col("p")
      val picked = ranked.join(broadcast(ps), col("which") === col("pwhich"))
        .filter(col("rn") === floor(pos) + 1 || col("rn") === ceil(pos) + 1)
        .withColumn("frac", pos - floor(pos))
        .groupBy(col("g"), col("pname"))
        .agg((min(col("v")) + (max(col("v")) - min(col("v"))) *
          first(col("frac"))).as("val"))
      picked.groupBy(col("g")).pivot("pname",
          Seq("med", "p25", "p75", "p90_price")).agg(first(col("val")))
        .select(col("g").as("l_returnflag"),
          round(col("med"), 6).as("med"), round(col("p25"), 6).as("p25"),
          round(col("p75"), 6).as("p75"),
          round(col("p90_price"), 4).as("p90_price"))
        .orderBy(col("l_returnflag"))
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // agreement check first (also warms)
    val a = shipped().collect().map(_.toString).mkString("|")
    val b = buffer().collect().map(_.toString).mkString("|")
    val c = sortwin().collect().map(_.toString).mkString("|")
    println(s"AGREE shipped==buffer: ${a == b}")
    println(s"AGREE shipped==sortwin: ${a == c}")
    if (a != b) { println(s"  shipped: $a"); println(s"  buffer:  $b") }
    if (a != c) { println(s"  shipped: $a"); println(s"  sortwin: $c") }

    val calib0 = calibrate()
    val variants = Seq("shipped" -> (() => shipped()),
      "buffer" -> (() => buffer()), "sortwin" -> (() => sortwin()))
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; (n, f) <- variants) times(n) = time(f) :: times(n)
    val calib1 = calibrate()
    println(f"CALIB ${math.min(calib0, calib1)}%.3f (before $calib0%.3f after $calib1%.3f)")
    for ((n, _) <- variants)
      println(f"RESULT $n%-8s min=${times(n).min}%.3f reps=${times(n).reverse.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
