package graft

import org.apache.spark.sql.functions._

/** Ad-hoc measurement scratchpad (not part of the driver contract —
  * lives in the TEST source set so the product tree stays product-only).
  * Edit, `sbt 'Test/runMain graft.Scratch'`, read timings. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    // bench profile
    if (!sys.env.contains("SPARK_GRAFT_AQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4194304")
    spark.conf.set(graft.plans.PresentationSort.ConfKey, "true")
    graft.engine.Tables(spark, sfDir)

    // per-stage timing listener
    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        stages.synchronized { stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(60), ms, i.numTasks)) }
      }
    })

    def time(name: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      for (i <- 1 to 3) {
        if (i == 3) stages.synchronized { stages.clear() }
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        best = math.min(best, dt)
        println(f"$name rep$i: $dt%.3f s")
      }
      println(f"$name BEST: $best%.3f s")
      Thread.sleep(200)
      stages.synchronized {
        stages.sortBy(_._1).foreach { case (id, nm, ms, nt) =>
          println(f"  stage $id%4d ${ms}%6d ms  $nt%3d tasks  $nm")
        }
      }
    }

    // SPARK_GRAFT_RULES=1: per-rule Catalyst time across 20 plan-only
    // reps of the first named query
    if (sys.env.contains("SPARK_GRAFT_RULES")) {
      val fn = SparkEntry.queries(args.head)
      for (_ <- 1 to 3) fn(spark, sfDir).queryExecution.executedPlan // warm
      org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      val t0 = System.nanoTime()
      for (_ <- 1 to 20) fn(spark, sfDir).queryExecution.executedPlan
      println(f"20 plan reps: ${(System.nanoTime() - t0) / 1e6}%.0f ms total")
      println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
        .linesIterator.take(40).mkString("\n"))
      return
    }

    // SPARK_GRAFT_Q21AB=1: shipped q21 (repartition + partition-local
    // agg) vs the no-repartition two-level variant, same downstream
    if (sys.env.contains("SPARK_GRAFT_Q21AB")) {
      val t = graft.engine.Tables(spark, sfDir)
      def downstream(perOrder: org.apache.spark.sql.DataFrame) = {
        val ordF = t.orders.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
        val supp = t.supplier.join(
            broadcast(t.nation.filter(col("n_name") === "NATION_7").select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"))
        perOrder
          .join(ordF, col("l_orderkey") === col("o_orderkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(sum(col("n_r_lines")).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name")).limit(100)
      }
      val li = t.lineitem.select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("is_r"))
      def aggCols = Seq(
        min(col("l_suppkey")).as("sk_min"),
        max(col("l_suppkey")).as("sk_max"),
        min(when(col("is_r") === 1L, col("l_suppkey"))).as("late_min"),
        max(when(col("is_r") === 1L, col("l_suppkey"))).as("late_max"),
        sum(col("is_r")).as("n_r_lines"))
      def post(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("sk_min") =!= col("sk_max")
          && col("late_min").isNotNull && col("late_min") === col("late_max"))
        .select(col("l_orderkey"), col("late_min").as("l_suppkey"), col("n_r_lines"))
      val shipped = downstream(post(
        li.repartition(col("l_orderkey")).groupBy(col("l_orderkey"))
          .agg(aggCols.head, aggCols.tail: _*)))
      val twoLevel = downstream(post(
        li.groupBy(col("l_orderkey")).agg(aggCols.head, aggCols.tail: _*)))
      time("q21 shipped (repartition+local)") {
        shipped.write.format("noop").mode("overwrite").save() }
      time("q21 two-level (no repartition)") {
        twoLevel.write.format("noop").mode("overwrite").save() }
      return
    }

    // SPARK_GRAFT_JPAB=1: shipped jaccard-prefix vs array-intersect
    // verification (PPJoin-style: per-doc shingle arrays, row-local
    // intersection instead of the cand×shingles fan-out joins)
    if (sys.env.contains("SPARK_GRAFT_JPAB")) {
      import org.apache.spark.sql.expressions.Window
      val t = graft.engine.Tables(spark, sfDir)
      def shipped = SparkEntry.queries("q_dedup_jaccard_prefix")(spark, sfDir)
      def arrayVariant = {
        val docArr = t.documents.select(col("doc_id"),
          graft.queries.DedupQueries.shingleHashArray(13).as("arr"))
          .localCheckpoint()
        val sh = docArr.select(col("doc_id"), col("arr"),
          explode(col("arr")).as("sh"))
          .select(col("doc_id"), size(col("arr")).cast("long").as("n"), col("sh"))
        val dfc = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
        val pre = sh.join(dfc, "sh")
          .withColumn("rk", row_number().over(wDoc))
          .filter(col("rk") <= col("n") - ceil(col("n") * 0.5) + 1)
          .select(col("doc_id"), col("sh"))
        val cand = pre.select(col("doc_id").as("d1"), col("sh"))
          .join(pre.select(col("doc_id").as("d2"), col("sh").as("shb")),
            col("sh") === col("shb") && col("d1") < col("d2"))
          .select(col("d1"), col("d2")).distinct()
        cand
          .join(docArr.select(col("doc_id").as("d1"), col("arr").as("a1")), "d1")
          .join(docArr.select(col("doc_id").as("d2"), col("arr").as("a2")), "d2")
          .withColumn("i", size(array_intersect(col("a1"), col("a2"))).cast("long"))
          .withColumn("jac_raw",
            col("i") * 1.0 / (size(col("a1")) + size(col("a2")) - col("i")))
          .filter(col("jac_raw") >= 0.5)
          .select(col("d1"), col("d2"), round(col("jac_raw"), 9).as("jaccard"))
          .orderBy(col("d1"), col("d2"))
      }
      time("jp shipped") { shipped.write.format("noop").mode("overwrite").save() }
      time("jp array-intersect") { arrayVariant.write.format("noop").mode("overwrite").save() }
      println("rows shipped=" + shipped.count() + " array=" + arrayVariant.count())
      return
    }

    // SPARK_GRAFT_BJAB=1: shipped bucket jaccard vs distinct-pair +
    // rare-array intersection
    if (sys.env.contains("SPARK_GRAFT_BJAB")) {
      val t = graft.engine.Tables(spark, sfDir)
      def shipped = SparkEntry.queries("q_dedup_jaccard")(spark, sfDir)
      def arrayVariant = {
        val sh = graft.queries.DedupQueries.hashedShinglesWithN(t.documents)
          .localCheckpoint()
        val dfc = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df").between(2, 1000))
        val shr = sh.join(dfc.select("sh"), "sh")
        val rareArr = shr.groupBy(col("doc_id"), col("n"))
          .agg(collect_list(col("sh")).as("arr"))
        val buckets = shr.groupBy(col("sh"))
          .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        val pairArr = flatten(transform(col("ds"), (x, i) =>
          transform(slice(col("ds"), i + 2, greatest(size(col("ds")) - i - 1, lit(0))),
            y => struct(x.as("d1"), y.as("d2")))))
        val cand = buckets.select(explode(pairArr).as("p"))
          .select(col("p.d1").as("d1"), col("p.d2").as("d2")).distinct()
        cand
          .join(rareArr.select(col("doc_id").as("d1"), col("arr").as("a1"), col("n").as("na")), "d1")
          .join(rareArr.select(col("doc_id").as("d2"), col("arr").as("a2"), col("n").as("nb")), "d2")
          .withColumn("i", size(array_intersect(col("a1"), col("a2"))).cast("long"))
          .withColumn("jac_raw", col("i") * 1.0 / (col("na") + col("nb") - col("i")))
          .filter(col("jac_raw") >= 0.5)
          .select(col("d1"), col("d2"), round(col("jac_raw"), 9).as("jaccard"))
          .orderBy(col("d1"), col("d2"))
      }
      time("bj shipped") { shipped.write.format("noop").mode("overwrite").save() }
      time("bj rare-array") { arrayVariant.write.format("noop").mode("overwrite").save() }
      println("rows shipped=" + shipped.count() + " array=" + arrayVariant.count())
      return
    }

    val names = if (args.nonEmpty) args.toSeq else Seq("q_agg_percentile")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      // planning-vs-execution split: construction + analysis +
      // optimization + physical planning, then the run itself
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        println(f"$n plan rep$i: construct ${(t1 - t0) / 1e6}%.0f ms, plan ${(t2 - t1) / 1e6}%.0f ms")
      }
      time(n) { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
    }
  }
}
