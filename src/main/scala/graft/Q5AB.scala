package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B for q_tpch_q5's residual exchanges (VERDICT r13 item 3):
  * (a) does broadcasting customer's 2-column projection beat the
  * shuffle on o_custkey, and (b) is the shuffle_hash hint on
  * orders⋈lineitem pessimizing larger tiers under AQE?
  *
  * Variants:
  *   shipped      — tree plan: shuffle o⋈c, shuffle_hash hint o⋈l
  *   bcast        — broadcast(customer 2-col) for o⋈c, hint kept
  *   nohint       — shipped minus the shuffle_hash hint (AQE decides)
  *   bcast_nohint — both changes
  *
  * Usage: sbt 'runMain graft.Q5AB [sfDir] [reps] [shufflePartitions]'
  */
object Q5AB {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val shuffle = args.lift(2).getOrElse("32")
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", shuffle)

    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id * 2)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    val t = graft.engine.Tables(spark, dir)
    val revenue = (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev")

    def q5(bcastCust: Boolean, hint: Boolean): DataFrame = {
      val asiaNations = t.nation.join(
        broadcast(t.region.filter(col("r_name") === "ASIA").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val supp = t.supplier.join(broadcast(asiaNations),
        col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val ord = t.orders
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t.lineitem.select(col("l_orderkey"), col("l_suppkey"), revenue)
      val cust = t.customer.select(col("c_custkey"), col("c_nationkey"))
      val oc = ord.join(if (bcastCust) broadcast(cust) else cust,
        col("o_custkey") === col("c_custkey"))
      val ocH = if (hint) oc.hint("shuffle_hash") else oc
      ocH.join(li, col("o_orderkey") === col("l_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val variants = Seq(
      "shipped" -> (() => q5(bcastCust = false, hint = true)),
      "bcast" -> (() => q5(bcastCust = true, hint = true)),
      "nohint" -> (() => q5(bcastCust = false, hint = false)),
      "bcast_nohint" -> (() => q5(bcastCust = true, hint = false)))
    // agreement + warm
    val ref = variants.head._2().collect().map(_.toString).mkString("|")
    variants.tail.foreach { case (n, f) =>
      val r = f().collect().map(_.toString).mkString("|")
      println(s"AGREE shipped==$n: ${r == ref}")
    }
    val calib0 = calibrate()
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; (n, f) <- variants) times(n) = time(f) :: times(n)
    val calib1 = calibrate()
    println(f"CALIB ${math.min(calib0, calib1)}%.3f (before $calib0%.3f after $calib1%.3f)")
    for ((n, _) <- variants)
      println(f"RESULT $n%-13s min=${times(n).min}%.3f reps=${times(n).reverse.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
