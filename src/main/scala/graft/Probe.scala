package graft
import org.apache.spark.sql.SparkSession
/** Dev scratch: print fixture schemas as Spark sees them. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- graft.engine.Tables.names) {
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      println(s"== $t: ${df.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(", ")}")
    }
    spark.sql("SELECT version() AS v").show(false)
    // entry-point + dialect smoke
    println("entry rows=" + SparkEntry.entry(spark).count())
    graft.functions.GraftFunctions.registerAll(spark)
    spark.sql(
      """SELECT typeof(1.5) AS t, strftime(DATE '2024-03-01', '%Y/%m/%d') AS d,
        |  list_extract(list_value(10,20,30), 2) AS le, sha256('x') AS h,
        |  product(c) AS p FROM (SELECT 2.0 AS c UNION ALL SELECT 3.0)""".stripMargin)
      .show(false)
    spark.stop()
  }
}
