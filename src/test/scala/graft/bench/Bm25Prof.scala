package graft.bench

import org.apache.spark.sql.functions._

/** Stage breakdown for q_text_bm25 at a tier (scratch profiling aid).
  * Test/runMain graft.bench.Bm25Prof [sfDir] */
object Bm25Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf3")
    val spark = graft.engine.GraftSession.local("32")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    val t = graft.engine.Tables(spark, dir)
    def time(label: String)(f: => Unit): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"### $label%-28s $best%.3f s")
    }
    // warm
    t.documents.count(); t.documents.select(col("text")).write.format("noop").mode("overwrite").save()
    val words = split(col("text"), " ")
    time("scan text only") {
      t.documents.select(col("text")).write.format("noop").mode("overwrite").save()
    }
    time("scan + split + size") {
      t.documents.select(size(words)).write.format("noop").mode("overwrite").save()
    }
    val terms = Seq("spark", "query", "join")
    val perDocCols = Seq(col("doc_id"), size(words).cast("long").as("dl")) ++
      terms.map(w => size(filter(words, x => x === lit(w))).cast("long").as(s"tf_$w"))
    time("perDoc (split + 3 HOF)") {
      t.documents.select(perDocCols: _*).write.format("noop").mode("overwrite").save()
    }
    time("perDoc + checkpoint") {
      t.documents.select(perDocCols: _*).localCheckpoint(true)
    }
    time("full bm25 query") {
      graft.SparkEntry.queries("q_text_bm25")(spark, dir).collect()
    }
    spark.stop()
  }
}
