package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Ad-hoc measurement scratchpad (not part of the driver contract).
  * Edit, `runMain graft.Scratch`, read timings; keep out of Bench. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf3")
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4194304")
    val t = graft.engine.Tables(spark, sfDir)

    def time(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    val decRev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(18, 2)))).as("rev")
    // scaled-long: cents * (100 - disc100) → exact 1e-4-scaled long
    val longRev = (round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev")

    def q3(rev: org.apache.spark.sql.Column, finalCast: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t.orders.filter(col("o_orderdate") < lit("1997-06-15"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = t.lineitem.filter(col("l_shipdate") > lit("1997-06-15"))
        .select(col("l_orderkey"), rev)
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(finalCast(sum(col("rev"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    }

    time("q3 decimal") { q3(decRev, _.cast("double")).write.format("noop").mode("overwrite").save() }
    time("q3 long   ") { q3(longRev, c => (c.cast(DecimalType(38, 4)) / 10000).cast("double")).write.format("noop").mode("overwrite").save() }
    val longDecRev = (round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))).cast(DecimalType(18, 0)).as("rev")
    def q3b(rev: org.apache.spark.sql.Column) = {
      val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t.orders.filter(col("o_orderdate") < lit("1997-06-15"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = t.lineitem.filter(col("l_shipdate") > lit("1997-06-15"))
        .select(col("l_orderkey"), rev)
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg((sum(col("rev")) / 10000).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    }
    time("q3 long+decsum") { q3b(longDecRev).write.format("noop").mode("overwrite").save() }

    // isolate: scan+filter+project only
    time("q3 scan-only dec ") {
      t.lineitem.filter(col("l_shipdate") > lit("1997-06-15"))
        .select(col("l_orderkey"), decRev).write.format("noop").mode("overwrite").save()
    }
    time("q3 scan-only long") {
      t.lineitem.filter(col("l_shipdate") > lit("1997-06-15"))
        .select(col("l_orderkey"), longRev).write.format("noop").mode("overwrite").save()
    }
  }
}
