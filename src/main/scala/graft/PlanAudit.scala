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
    val byName = SparkEntry.defs.map(d => d.name -> d).toMap
    names.foreach { n =>
      println(s"\n========== $n ==========")
      byName(n).run(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
