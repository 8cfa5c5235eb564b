package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one JVM-wide session (getOrCreate)
  * with the production config from GraftSession so test semantics match
  * Verify/Bench exactly. */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.GraftSession.local("4")
  val sf = "/root/testdata/sf0.001"
}
