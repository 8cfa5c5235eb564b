package graft

/** Plan audit (dev tool): prints the formatted physical plan of
  * selected queries so pushdown / broadcast / codegen properties can be
  * eyeballed and asserted. Run: sbt 'runMain graft.PlanAudit [names…]'.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q_join_inner_agg", "q_scan_filter_project",
        "q_dedup_minhash_lsh", "q_ann_bruteforce", "q_evt_asof")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val byName = SparkEntry.defs.map(d => d.name -> d).toMap
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = byName(n).run(spark, sfDir)
      df.explain("formatted")
      // AQE re-plans at runtime: execute, then print the final plan
      if (sys.env.contains("SPARK_GRAFT_FINAL_PLAN")) {
        // collect() drives THIS df's own QueryExecution so the printed
        // AdaptiveSparkPlan is the truly-final one (a .write creates a
        // separate QueryExecution and the plan would stay pre-AQE)
        df.collect()
        println("---------- final (post-AQE) ----------")
        val plan = df.queryExecution.executedPlan.toString
        println(plan.take(12000))
        def cnt(k: String) = k + "=" + k.r.findAllIn(plan).length
        println("[plan-stats] " + Seq("FileScan", "ReusedExchange", "ReusedQueryStage",
          "ShuffleQueryStage", "Exchange",
          "ShuffledHashJoin", "BroadcastHashJoin", "SortMergeJoin", "Window")
          .map(cnt).mkString(" "))
      }
    }
    spark.stop()
  }
}
