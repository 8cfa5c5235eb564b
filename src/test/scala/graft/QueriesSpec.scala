package graft

/** Smoke: every declared query runs at sf0.001, returns a non-empty
  * schema, and its oracle (when present) is syntactically non-empty.
  * The cell-exact DuckDB comparison happens in the driver gate /
  * tools/compare.py; this spec catches analysis errors and accidental
  * name/entry drift early and cheaply. */
class QueriesSpec extends SparkSpecBase {

  test("registry is consistent: unique names, oracle keys subset") {
    val names = SparkEntry.defs.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.defs.foreach { d =>
    test(s"${d.name} executes at sf0.001") {
      val df = d.run(spark, sf)
      assert(df.schema.nonEmpty)
      df.limit(1).collect() // force execution of at least one task chain
      // DML oracles are statement batteries ending in the compared
      // SELECT (DuckDB executes multi-statement SQL, result = last)
      d.oracle.foreach(sql => assert(sql.trim.toLowerCase.startsWith("select")
        || sql.trim.toLowerCase.startsWith("with")
        || sql.trim.toLowerCase.startsWith("create")))
    }
  }

  test("approx_count_distinct within 2% of exact") {
    val t = graft.engine.Tables(spark, sf)
    import org.apache.spark.sql.functions._
    val r = t.orders.agg(
      approx_count_distinct(col("o_custkey")).as("a"),
      countDistinct(col("o_custkey")).as("e")).head()
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.02, s"approx=$a exact=$e")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // The oracle compares array_agg in exploded form (the driver's
  // row-sorting hash can't order array cells), so the packed
  // array-typed shape is asserted here: construction, in-cell order,
  // and the PG wire serialization of the list cell.
  test("array_agg packed form: array column, sorted cells, wire render") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.ArrayType
    val t = graft.engine.Tables(spark, sf)
    val packed = t.customer.filter(col("c_custkey") <= 60)
      .groupBy(col("c_nationkey"))
      .agg(sort_array(collect_list(col("c_custkey"))).as("custs"))
      .orderBy(col("c_nationkey"))
    assert(packed.schema("custs").dataType.isInstanceOf[ArrayType])
    val rows = packed.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cells = r.getSeq[Long](1)
      assert(cells == cells.sorted, "array cells not sorted inside the aggregate")
    }
    val rendered = graft.server.pg.PgTypes.render(rows.head.getSeq[Long](1)).get
    assert(rendered.matches("""\{\d+(,\d+)*\}"""), s"unexpected wire render: $rendered")
  }
}
