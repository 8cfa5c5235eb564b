package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up fixture generator (VERDICT r5 item 5: measure
  * the scale claim instead of extrapolating it).
  *
  * Replicates the sf0.1 fixture K× (default 10 ≈ sf1) with disjoint key
  * spaces per replica so referential joins stay valid and row counts
  * scale linearly. Fixed-size dims (nation, region) are NOT replicated —
  * they are fixed-size at any scale by construction. Content columns are
  * perturbed per replica so similarity-structured workloads keep their
  * character instead of gaining K−1 exact twins per row:
  *   - documents.text: every word gets a per-replica suffix — within-
  *     replica near-dup structure is preserved verbatim, cross-replica
  *     similarity drops to ~0 (dup pairs grow ×K, not ×K²)
  *   - embeddings.embedding: small per-replica offset — neighbor
  *     structure preserved within a replica
  * Deterministic: same inputs, same replica transforms, no randomness.
  *
  * Usage: sbt 'runMain graft.ScaleUp [srcDir] [dstDir] [K]'
  *   defaults: /root/testdata/sf0.1 → /root/repo/target/sf1, K=10
  */
object ScaleUp {
  private val OFF = 1000000000L // replica key offset, > any sf0.1 key

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/target/sf1")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    def replicate(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      val out = (0 until k).map(i => f(base, i)).reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t: ${base.count()} -> ${out.count()} rows")
    }

    // fixed-size dims: copy through
    Seq("nation", "region").foreach { t =>
      read(t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    def off(c: String, i: Int) = (col(c) + lit(i * OFF)).as(c)

    replicate("customer")((d, i) => d.select(off("c_custkey", i),
      col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))
    replicate("supplier")((d, i) => d.select(off("s_suppkey", i),
      col("s_name"), col("s_nationkey"), col("s_acctbal")))
    replicate("part")((d, i) => d.select(off("p_partkey", i),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")))
    replicate("orders")((d, i) => d.select(off("o_orderkey", i), off("o_custkey", i),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")))
    replicate("lineitem")((d, i) => d.select(off("l_orderkey", i), off("l_partkey", i),
      off("l_suppkey", i), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate")))
    replicate("events")((d, i) => d.select(off("event_id", i), col("ts"),
      off("user_id", i), col("event_type"), col("value"), col("props")))
    replicate("documents") { (d, i) =>
      val text = if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1_" + i)
      d.select(off("doc_id", i), text.as("text"), col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }
    replicate("embeddings") { (d, i) =>
      val emb = if (i == 0) col("embedding")
        else transform(col("embedding"), x => (x + lit(i * 0.001f)).cast("float"))
      // label offset per replica (r12): like documents' per-word suffix,
      // this keeps BLOCK sizes constant as K grows — near-dup pairs and
      // label-blocked join work scale ×K, not ×K² (an unreplicated label
      // made sf10's embedding-dedup blocks 100× denser than any real
      // corpus at 100× data: more data means more shards, not denser
      // ones). Replica 0 keeps the original labels verbatim.
      d.select(off("vec_id", i), emb.as("embedding"),
        (col("label") + lit(i * 1000)).as("label"))
    }
    spark.stop()
  }
}
