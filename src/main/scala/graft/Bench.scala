package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local()
    if (sys.env.contains("SPARK_GRAFT_NOAQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    // absorb one-time session/codegen/scheduler warmup outside the
    // per-query timings (DuckDB-side timings have no such fixed cost)
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.engine.Tables(spark, sfDir)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink materializes every output column (count() would let
      // Spark prune the projections being measured)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
