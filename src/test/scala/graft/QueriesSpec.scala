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

  // r16 (VERDICT r15 item 4, guide §5): the bucket membership buffer is
  // bounded DURING collection — a generous cap is a transparent drop-in
  // for collect_list, and a bucket past the cap fails the query loudly
  // with the conf named in the message (instead of a task OOM).
  test("bounded bucket collection: collect_list drop-in below the cap, loud failure past it") {
    val docs = graft.engine.Tables(spark, sf).documents
    def minhash(): Set[(Long, Long)] = graft.queries.DedupQueries.minhashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dflt = minhash()
    assert(dflt.nonEmpty, "fixture produced no minhash pairs — the test is vacuous")
    spark.conf.set("spark.graft.dedup.bucketExplodeCap", "1000000")
    try assert(minhash() == dflt, "raising the cap changed the pair set")
    finally spark.conf.unset("spark.graft.dedup.bucketExplodeCap")
    spark.conf.set("spark.graft.dedup.bucketExplodeCap", "1")
    try {
      val e = intercept[Throwable](minhash())
      val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
      assert(chain.contains("bucketExplodeCap"),
        s"overflow failure does not name the conf: $chain")
    } finally spark.conf.unset("spark.graft.dedup.bucketExplodeCap")
  }

  // ADVICE r15: the entropy fold reaches through catalyst internals
  // (MakeDecimal over an exact unscaled-long accumulator); pin its
  // result against the oracle-shaped sum(CAST(... AS DECIMAL(28,15)))
  // — Spark's own decimal sum accumulator — so a Spark upgrade that
  // changes MakeDecimal semantics fails fast, on crafted docs with
  // hand-checkable anchors.
  test("char entropy decimal fold matches the oracle-shaped sum(decimal) exactly") {
    import spark.implicits._
    val docs = Seq((1L, "aab"), (2L, "abcd"), (3L, "aaaa"),
        (4L, "mississippi banana mississippi riverbank"))
      .toDF("doc_id", "text")
    val got = graft.queries.TextQueries.charEntropy(docs).collect()
    docs.createOrReplaceTempView("ent_docs")
    val ref = spark.sql(
      """WITH c AS (SELECT doc_id, explode(split(text, '')) AS ch FROM ent_docs),
        |cc AS (SELECT doc_id, ch, count(*) AS n FROM c WHERE ch <> '' GROUP BY doc_id, ch),
        |tot AS (SELECT doc_id, sum(n) AS nt FROM cc GROUP BY doc_id)
        |SELECT cc.doc_id,
        |  CAST(max(nt) AS BIGINT) AS n_chars,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round(CAST(-sum(CAST((n * 1.0 / nt) * log2(n * 1.0 / nt) AS DECIMAL(28,15))) AS DOUBLE), 9) AS entropy
        |FROM cc JOIN tot ON cc.doc_id = tot.doc_id
        |GROUP BY cc.doc_id ORDER BY cc.doc_id""".stripMargin).collect()
    assert(got.toSeq.map(_.toSeq) == ref.toSeq.map(_.toSeq),
      s"fold diverged from sum(decimal): ${got.toSeq} vs ${ref.toSeq}")
    val byId = got.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byId(2L) == 2.0, "uniform 4-char doc must be exactly 2 bits")
    assert(byId(3L) == 0.0, "constant doc must be exactly 0 bits")
  }
}
