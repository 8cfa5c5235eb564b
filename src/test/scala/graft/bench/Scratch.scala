package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.FixedPointSum.sumFix
import graft.functions.DoubleToScaledLong

/** Ad-hoc measurement scratchpad (not part of the driver contract —
  * lives in the TEST source set so the product tree stays product-only).
  * Edit, `sbt 'Test/runMain graft.Scratch'`, read timings. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf3")
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    if (!sys.env.contains("SPARK_GRAFT_AQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4194304")
    val t = graft.engine.Tables(spark, sfDir)

    def time(name: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        best = math.min(best, dt)
        println(f"$name rep$i: $dt%.3f s")
      }
      println(f"$name BEST: $best%.3f s")
    }

    def cents(c: String) = DoubleToScaledLong.cents(col(c))
    val revenue = (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("rev")
    def unscaleRev(c: org.apache.spark.sql.Column) = (c / 10000).cast("double")

    // ---- q3 shape A (shipped): join raw lineitem, aggregate after
    def q3A = {
      val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t.orders.filter(col("o_orderdate") < lit("1997-06-15"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = t.lineitem.filter(col("l_shipdate") > lit("1997-06-15"))
        .select(col("l_orderkey"), revenue)
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(unscaleRev(sumFix(col("rev"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    }

    // ---- q3 shape B: pre-aggregate lineitem per orderkey BELOW the join
    def q3B = {
      val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t.orders.filter(col("o_orderdate") < lit("1997-06-15"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val liAgg = t.lineitem.filter(col("l_shipdate") > lit("1997-06-15"))
        .select(col("l_orderkey"), revenue)
        .groupBy(col("l_orderkey"))
        .agg(sumFix(col("rev")).as("rev_dec"))
      liAgg.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), unscaleRev(col("rev_dec")).as("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    }

    val liProj = t.lineitem.filter(col("l_shipdate") > lit("1997-06-15"))
      .select(col("l_orderkey"), revenue)

    val ordc = t.orders.filter(col("o_orderdate") < lit("1997-06-15"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .join(t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey"),
        col("o_custkey") === col("c_custkey"))

    val docs = t.documents
    def tfidfA = {
      val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("f"))
      val df = tf.groupBy(col("word")).agg(count(lit(1)).as("d"))
      val n = docs.agg(count(lit(1)).cast("double").as("total"))
      tf.join(broadcast(df), "word")
        .filter(col("word").isin("spark", "join", "window"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("word"),
          round(col("f") * log(col("total") / col("d")), 9).as("tfidf"))
        .orderBy(col("doc_id"), col("word")).limit(600)
    }
    def tfidfB = {
      val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word").isin("spark", "join", "window"))
      val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("f"))
      val df = tf.groupBy(col("word")).agg(count(lit(1)).as("d"))
      val n = docs.agg(count(lit(1)).cast("double").as("total"))
      tf.join(broadcast(df), "word")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("word"),
          round(col("f") * log(col("total") / col("d")), 9).as("tfidf"))
        .orderBy(col("doc_id"), col("word")).limit(600)
    }
    tfidfA.explain("formatted")
    time("tfidfA shipped") { tfidfA.write.format("noop").mode("overwrite").save() }
    time("tfidfB filter@explode") { tfidfB.write.format("noop").mode("overwrite").save() }
    time("explode only") { docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .write.format("noop").mode("overwrite").save() }
    val wordsF = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word").isin("spark", "join", "window"))
    time("explode+filter") { wordsF.write.format("noop").mode("overwrite").save() }
    val tfX = wordsF.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("f"))
    time("tf only") { tfX.write.format("noop").mode("overwrite").save() }
    time("count docs") { docs.agg(count(lit(1)).cast("double").as("total")).write.format("noop").mode("overwrite").save() }
    def tfidfC = {
      import org.apache.spark.sql.expressions.Window
      val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word").isin("spark", "join", "window"))
      val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("f"))
      val n = docs.agg(count(lit(1)).cast("double").as("total"))
      tf.withColumn("d", count(lit(1)).over(Window.partitionBy(col("word"))))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("word"),
          round(col("f") * log(col("total") / col("d")), 9).as("tfidf"))
        .orderBy(col("doc_id"), col("word")).limit(600)
    }
    time("tfidfC window-df") { tfidfC.write.format("noop").mode("overwrite").save() }
    def tfidfD = {
      val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word").isin("spark", "join", "window"))
      val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("f"))
        .localCheckpoint()
      val df = tf.groupBy(col("word")).agg(count(lit(1)).as("d"))
      val n = docs.agg(count(lit(1)).cast("double").as("total"))
      tf.join(broadcast(df), "word")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("word"),
          round(col("f") * log(col("total") / col("d")), 9).as("tfidf"))
        .orderBy(col("doc_id"), col("word")).limit(600)
    }
    time("tfidfD ckpt-tf") { tfidfD.write.format("noop").mode("overwrite").save() }
  }
}
