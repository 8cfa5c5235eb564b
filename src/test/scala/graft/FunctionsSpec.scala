package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.GraftFunctions

class StrftimeSpec extends SparkSpecBase {
  import GraftFunctions.translateStrftime

  test("strftime %-codes translate to Spark datetime patterns") {
    assert(translateStrftime("%Y-%m-%d") == "yyyy-MM-dd")
    assert(translateStrftime("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    assert(translateStrftime("%d/%b/%Y") == "dd/MMM/yyyy")
    assert(translateStrftime("%I %p") == "hh a")
  }

  test("literal text runs are quoted, %% stays a literal percent") {
    assert(translateStrftime("year %Y!") == "'year 'yyyy!")
    assert(translateStrftime("%Y%%") == "yyyy%")
  }

  test("strftime alias evaluates through SQL") {
    val r = spark.sql("SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%Y/%m/%d %H:%M') AS s")
      .head().getString(0)
    assert(r == "2024/03/05 07:08")
  }
}

class TypeOfSpec extends SparkSpecBase {
  test("typeof reports DuckDB-style names and folds to a literal") {
    val rows = spark.sql(
      """SELECT typeof(1) a, typeof(CAST(1 AS BIGINT)) b, typeof(1.5) c,
        |  typeof('x') d, typeof(true) e, typeof(array(1)) f,
        |  typeof(CAST(2.5 AS DOUBLE)) g""".stripMargin).head()
    assert(rows.getString(0) == "INTEGER")
    assert(rows.getString(1) == "BIGINT")
    assert(rows.getString(2) == "DECIMAL(2,1)")
    assert(rows.getString(3) == "VARCHAR")
    assert(rows.getString(4) == "BOOLEAN")
    assert(rows.getString(5) == "INTEGER[]")
    assert(rows.getString(6) == "DOUBLE")
  }
}

class ProductAggSpec extends SparkSpecBase {
  test("product multiplies, ignores nulls, yields null on empty") {
    val r = spark.sql(
      """SELECT g, product(v) AS p FROM VALUES
        |  (1, 2.0), (1, 3.0), (1, CAST(NULL AS DOUBLE)),
        |  (2, CAST(NULL AS DOUBLE)) AS t(g, v)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(r(0).getDouble(1) == 6.0)
    assert(r(1).isNullAt(1))
  }
}

class VectorDotSpec extends SparkSpecBase {
  import graft.functions.VectorFunctions

  test("vector_dot matches sequential double fold (codegen path)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.vectorDot(df("a"), df("b"))).head().getDouble(0)
    assert(got == (1.0 * 4 + 2.0 * 5 + 3.0 * 6))
  }

  test("vector_dot property: equals reference fold on random vectors") {
    import spark.implicits._
    val gen = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    val prop = Prop.forAll(gen, gen) { (a: List[Float], b: List[Float]) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val got = df.select(VectorFunctions.vectorDot(df("a"), df("b"))).head().getDouble(0)
      var ref = 0.0
      a.zip(b).foreach { case (x, y) => ref += x.toDouble * y.toDouble }
      got == ref
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("cosine similarity of identical vectors is 1") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(0.5f, -1.5f, 2.0f))).toDF("a")
    val got = df.select(VectorFunctions.cosineSimilarity(df("a"), df("a"))).head().getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }
}

class AliasSpec extends SparkSpecBase {
  test("DuckDB aliases resolve to native functions") {
    val r = spark.sql(
      """SELECT list_extract(list_value(10, 20, 30), 2) AS le,
        |  list_contains(list_value(1, 2), 2) AS lc,
        |  sha256('x') AS h,
        |  ucase('ab') AS uc,
        |  array_positions(array(1), 1) AS ap,
        |  timezone() AS tz""".stripMargin).head()
    assert(r.getInt(0) == 20)
    assert(r.getBoolean(1))
    assert(r.getString(2).startsWith("2d711642"))
    assert(r.getString(3) == "AB")
    assert(r.getInt(4) == 0)
    assert(r.getString(5) == "utc")
  }

  test("DoubleToDec6 fast path is bit-identical to CAST(v AS DECIMAL(18,6))") {
    import graft.functions.DoubleToDec6
    def oracle(v: Double) =
      java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP)
    // adversarial fixed points: rounding boundaries, negatives, big mags
    for (v <- Seq(0.0, 1.0, -1.0, 0.0000005, -0.0000005, 2.5e-6, 123.4567895,
                  -123.4567895, 99999999999.999999, 1.0/3.0, -1.0/3.0, 9876.54 * 0.95 * 1.08))
      assert(DoubleToDec6.toDec(v).toJavaBigDecimal == oracle(v), s"v=$v")
    val gen = Gen.chooseNum(-9.9e11, 9.9e11).map(_.asInstanceOf[Double])
    val prop = Prop.forAll(gen) { v =>
      DoubleToDec6.toDec(v).toJavaBigDecimal == oracle(v)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5000), prop)
    assert(res.passed, res.status.toString)
  }
}

class TopKByScoreSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.functions.{ScoredId, TopKByScore}

  test("NaN scores rank FIRST (Spark/DuckDB descending NaN semantics)") {
    val agg = new TopKByScore(3)
    val in = Seq(ScoredId(1, 0.9), ScoredId(2, Double.NaN), ScoredId(3, 0.5), ScoredId(4, 0.99))
    val out = in.foldLeft(agg.zero)(agg.reduce)
    assert(out.map(_.id) == List(2L, 4L, 1L), s"got $out")
    // merge path sees the same order
    val (l, r) = in.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.map(_.id) == List(2L, 4L, 1L))
    // equal scores tiebreak by ascending id, NaN ties included
    val ties = Seq(ScoredId(9, Double.NaN), ScoredId(2, Double.NaN), ScoredId(5, 1.0))
    assert(ties.foldLeft(agg.zero)(agg.reduce).map(_.id) == List(2L, 9L, 5L))
  }
}
