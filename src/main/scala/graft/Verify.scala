package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = graft.engine.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    // oracle dumps are result-sized and coalesced to one file anyway:
    // the root ORDER BY is presentation order (plans/PresentationSort)
    spark.conf.set(graft.plans.PresentationSort.ConfKey, "true")
    new java.io.File(outDir).mkdirs()
    // iteration aid (driver never sets it): restrict the dumped corpus
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(name.matches) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a STALE dump from a previous run must not mask the failure
        // as a value mismatch (or worse, a pass) — remove it so the
        // compare reports the query as missing
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(new java.io.File(s"$outDir/$name"))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
