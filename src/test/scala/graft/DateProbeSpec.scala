package graft
class DateProbeSpec extends SparkSpecBase {
  test("date literal decodes via toLocalIterator") {
    val df = spark.sql("select date '2024-02-05' as d")
    try {
      val it = df.toLocalIterator()
      println("GOT: " + it.next())
    } catch { case e: Throwable =>
      var c: Throwable = e
      while (c != null) { println("CAUSE: " + c.getClass.getName + ": " + c.getMessage); c = c.getCause }
      throw e
    }
  }
}
