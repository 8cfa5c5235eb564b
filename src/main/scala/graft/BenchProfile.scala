package graft

/** Floor decomposition for BENCH_NOTES: planning vs execution time of
  * representative cheap queries, steady-state (3rd repetition). */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.range(1000).selectExpr("sum(id)").collect()
    val names = sys.env.get("SPARK_GRAFT_PROFILE") match {
      case Some(list) => list.split(",").toSeq
      case None => Seq("q_limit_offset", "q_fn_math", "q_join_inner_agg", "q_agg_distinct",
        "q_scan_filter_project", "q_win_leadlag")
    }
    names.foreach { n =>
      val d = SparkEntry.defs.find(_.name == n).get
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val df = d.run(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+physical planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        if (rep == 3)
          println(f"$n%-24s build=${(t1 - t0) / 1e6}%6.0fms plan=${(t2 - t1) / 1e6}%6.0fms exec=${(t3 - t2) / 1e6}%6.0fms")
      }
    }
    spark.stop()
  }
}
