package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.DoubleSortKey

/** The bit-bucket percentile plan is only correct if double_sort_key is
  * STRICTLY order-preserving over the reals (functions/DoubleSortKey):
  * k(a) < k(b) ⇔ a < b for all finite doubles, and the top-bit bucket
  * (shiftright 48) is therefore monotone too. */
class DoubleSortKeySpec extends SparkSpecBase {

  private def key(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    if (b >= 0L) b else b ^ 0x7FFFFFFFFFFFFFFFL
  }

  private val finiteDouble: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e300, 1e300),
    Gen.choose(-1e-300, 1e-300),
    Gen.choose(-1e6, 1e6),
    Gen.oneOf(0.0, -0.0, 1.0, -1.0, Double.MinPositiveValue,
      -Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("key is order-preserving over finite doubles") {
    check(Prop.forAll(finiteDouble, finiteDouble) { (a: Double, b: Double) =>
      if (a < b) key(a) < key(b)
      else if (a > b) key(a) > key(b)
      else true // a == b (covers -0.0 == 0.0: adjacent keys, same order)
    })
  }

  test("bucket id (top 16 bits) is monotone") {
    check(Prop.forAll(finiteDouble, finiteDouble) { (a: Double, b: Double) =>
      a >= b || (key(a) >> 48) <= (key(b) >> 48)
    })
  }

  test("catalyst expression agrees with the reference impl, codegen and interpreted") {
    import org.apache.spark.sql.functions.col
    import graft.functions.DoubleSortKeyFn.doubleSortKey
    val vals = Seq(-1e300, -2.5, -0.0, 0.0, 1.0, 49.9999, 1e300)
    import spark.implicits._
    val got = vals.toDF("v").select(doubleSortKey(col("v")).as("k")).as[Long].collect()
    assert(got.toSeq == vals.map(key))
    val e = DoubleSortKey(org.apache.spark.sql.catalyst.expressions.Literal(3.25))
    assert(e.eval(null) == key(3.25))
  }
}
