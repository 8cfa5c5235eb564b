package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** `product(x)` aggregate — DuckDB built-in with no Spark counterpart
  * (SURVEY §2-B.4). Typed Aggregator: merge-able buffer, so Spark plans
  * it as partial + final (map-side combine) exactly like a built-in
  * agg — no extra shuffle versus sum(). NULL inputs are ignored; the
  * empty group yields NULL (DuckDB semantics).
  */
case class ProductBuf(var prod: Double, var seen: Boolean)

object ProductAgg extends Aggregator[java.lang.Double, ProductBuf, java.lang.Double] {
  override def zero: ProductBuf = ProductBuf(1.0, seen = false)
  override def reduce(b: ProductBuf, a: java.lang.Double): ProductBuf = {
    if (a != null) { b.prod *= a; b.seen = true }
    b
  }
  override def merge(b1: ProductBuf, b2: ProductBuf): ProductBuf =
    ProductBuf(b1.prod * b2.prod, b1.seen || b2.seen)
  override def finish(b: ProductBuf): java.lang.Double = if (b.seen) b.prod else null
  override def bufferEncoder: Encoder[ProductBuf] = Encoders.product[ProductBuf]
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
