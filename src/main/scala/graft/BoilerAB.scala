package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off A/B for q_pipeline_boilerplate's anti-join (VERDICT r15
  * item 5 — the last >1x-DuckDB at-scale row): does broadcasting the
  * boiler chunk set (df >= 2) into the LeftAnti beat the exchange-fed
  * sort-merge anti-join?
  *
  * Variants:
  *   shipped — chunks LeftAnti boiler via exchange + SMJ
  *   bcast   — broadcast(boiler) LeftAnti (no exchange on the big side)
  *
  * The session mirrors the bench profile (AQE off, static-8 shuffle
  * partitions, 4 MB splits, presentation sort) so numbers are
  * comparable to the boards.
  *
  * Usage: sbt 'runMain graft.BoilerAB [sfDir] [reps]'
  */
object BoilerAB {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4194304")
    spark.conf.set(graft.plans.PresentationSort.ConfKey, "true")
    if (!sys.env.contains("SPARK_GRAFT_AQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SHUFFLE", "8"))

    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id * 2)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    val t = graft.engine.Tables(spark, dir)

    def boilerplate(bcast: Boolean): DataFrame = {
      val chunkArr = transform(
        sequence(lit(0), (ceil(size(col("words")) / lit(10.0)) - 1).cast("int")),
        i => array_join(slice(col("words"), i * 10 + 1, lit(10)), " "))
      val chunks = t.documents
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(col("doc_id"), posexplode(chunkArr).as(Seq("cpos", "chunk")))
      val boiler = t.documents
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(explode(array_distinct(chunkArr)).as("chunk"))
        .groupBy(col("chunk")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("chunk"))
      chunks.join(if (bcast) broadcast(boiler) else boiler, Seq("chunk"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(
            sort_array(collect_list(struct(col("cpos"), col("chunk")))),
            x => x.getField("chunk")), " ").as("cleaned"))
        .orderBy(col("doc_id"))
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val variants = Seq(
      "shipped" -> (() => boilerplate(false)),
      "bcast" -> (() => boilerplate(true)))
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
      println(f"RESULT $n%-8s min=${times(n).min}%.3f reps=${times(n).reverse.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
