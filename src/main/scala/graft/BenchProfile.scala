package graft

/** Floor decomposition for BENCH_NOTES: planning vs execution time of
  * representative cheap queries, steady-state (3rd repetition). */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    sys.env.get("SPARK_GRAFT_CONF").foreach { kvs =>
      kvs.split(';').filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        try spark.conf.set(k.trim, v.trim)
        catch { case e: Throwable => System.err.println(s"[profile conf] $k: $e") }
      }
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val names = sys.env.get("SPARK_GRAFT_PROFILE") match {
      case Some(list) => list.split(",").toSeq
      case None => Seq("q_limit_offset", "q_fn_math", "q_join_inner_agg", "q_agg_distinct",
        "q_scan_filter_project", "q_win_leadlag")
    }
    // wave decomposition: count jobs/stages/tasks and the total task
    // time — wall minus task-time/parallelism ≈ scheduler+barrier cost
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
    })
    names.foreach { n =>
      val d = SparkEntry.defs.find(_.name == n).get
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val df = d.run(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+physical planning
        val t2 = System.nanoTime()
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        Thread.sleep(120) // listener bus drain (private API in 4.x)
        if (rep == 3)
          println(f"$n%-24s build=${(t1 - t0) / 1e6}%6.0fms plan=${(t2 - t1) / 1e6}%6.0fms exec=${(t3 - t2) / 1e6}%6.0fms jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%4d taskSum=${taskMs.get}%6dms")
      }
    }
    spark.stop()
  }
}
