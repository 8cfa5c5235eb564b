package graft

import graft.server.Engine

/** DuckDB dialect coverage through the server rewrite + function
  * registry: list literals, named struct args, dynamic list
  * aggregation, unit-string datetime functions, fmt-style format. */
class DialectFunctionsSpec extends SparkSpecBase {

  private lazy val engine = new Engine(spark)

  private def one(sql: String): Any =
    spark.sql(engine.rewrite(sql)).head().get(0)

  test("bracket list literals (incl. nested) rewrite outside strings") {
    assert(one("select [1,2,3]") == Seq(1, 2, 3))
    assert(one("select [[1],[2]]") == Seq(Seq(1), Seq(2)))
    assert(one("select 'a [not] literal'") == "a [not] literal")
    // subscript untouched by the rewrite (NB: Spark [] is 0-based —
    // DuckDB-style 1-based access is the element_at/list_extract path)
    assert(one("select ([10,20])[1]") == 20)
  }

  test("struct_pack named args and list_aggregate dispatch") {
    assert(one("select struct_pack(a:=1).a") == 1)
    assert(one("select list_aggregate([1,2,3], 'sum')") == 6.0)
    assert(one("select list_aggregate([1,2,3], 'max')") == 3)
    assert(one("select list_aggregate([1.0,2.0,3.0,4.0], 'avg')") == 2.5)
    intercept[Exception](one("select list_aggregate([1], 'nope')"))
  }

  test("date_diff unit-string and format fmt-string rewrites") {
    assert(one("select date_diff('day', date '2024-01-01', date '2024-01-11')") == 10L)
    assert(one("select datediff('month', date '2024-01-15', date '2024-04-16')") == 3L)
    assert(one("select format('{} x {}', 1, 'two')") == "1 x two")
    assert(one("select list_slice([1,2,3,4], 2, 3)") == Seq(2, 3))
    assert(one("select date_add(date '2024-01-01', interval 3 day)").toString == "2024-01-04")
    assert(one("select date_add(date '2024-01-01', 3)").toString == "2024-01-04")
  }
}
