package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off A/B for q_text_char_entropy's remaining exchanges (VERDICT
  * r15 item 6, 1.72x DuckDB at sf1): the shipped shape pays two
  * exchanges over (doc, char) histograms — does collapsing to ONE
  * groupBy(doc) (collect the chars, histogram row-locally via sorted
  * run-lengths, same exact decimal fold) win at sf1, or do the
  * interpreted HOFs (per char, not per distinct char) lose more than
  * the exchange saves — as r15's zero-exchange variant did?
  *
  * Variants:
  *   shipped — explode -> groupBy(doc,ch) -> groupBy(doc) + decimal fold
  *   oneagg  — explode -> groupBy(doc) collect_list(ch) -> row-local
  *             run-length histogram + the same decimal fold
  *
  * Usage: sbt 'runMain graft.EntropyAB [sfDir] [reps]'
  */
object EntropyAB {
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

    def shipped(): DataFrame = graft.queries.TextQueries.charEntropy(t.documents)

    def oneagg(): DataFrame = {
      val chars = t.documents
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(col("ch") =!= "")
      val agg = chars.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("ch"))).as("cs"))
      val n = size(col("cs"))
      // run boundaries of the sorted char list: positions i where
      // cs[i] != cs[i+1], bracketed by 0 and n; run lengths are the
      // consecutive differences
      // flatten(array(...)) not concat(...): the session registers the
      // DuckDB-dialect concat (string concat_ws semantics), which
      // intercepts the resolved-by-name array concat
      val bounds = flatten(array(array(lit(0)),
        filter(sequence(lit(1), n - 1),
          i => element_at(col("cs"), i) =!= element_at(col("cs"), i + 1)),
        array(n)))
      val ns = transform(sequence(lit(1), size(bounds) - 1),
        j => (element_at(bounds, j + 1) - element_at(bounds, j)).cast("long"))
      val withNs = agg.select(col("doc_id"), n.cast("long").as("n_chars"), ns.as("ns"))
        .select(col("doc_id"), col("n_chars"),
          size(col("ns")).cast("long").as("n_distinct"), col("ns"))
      val terms = transform(col("ns"), c => {
        val p = c * 1.0 / col("n_chars")
        ((p * log2(p)).cast("decimal(28,15)") * lit(1000000000000000L)).cast("long")
      })
      val sumU = aggregate(terms, lit(0L), (acc, x) => acc + x)
      val entDec = org.apache.spark.sql.GraftBridge.toColumn(
        org.apache.spark.sql.catalyst.expressions.MakeDecimal(
          org.apache.spark.sql.GraftBridge.toExpression(-sumU), 38, 15, false))
      withNs.select(col("doc_id"), col("n_chars"), col("n_distinct"),
          round(entDec.cast("double"), 9).as("entropy"))
        .orderBy(col("doc_id"))
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val variants = Seq("shipped" -> (() => shipped()), "oneagg" -> (() => oneagg()))
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
