package graft

import org.apache.spark.sql.functions._

/** Property checks for the training-pipeline operators beyond the
  * driver's oracle hash (which pins exact values at sf0.01): the
  * structural invariants that must hold at ANY scale.
  */
class PipelineSpec extends SparkSpecBase {

  private def run(name: String) =
    SparkEntry.defs.find(_.name == name).get.run(spark, sf)

  test("sequence packing: bins are contiguous doc ranges and cover every document") {
    val bins = run("q_pipeline_pack_sequences").collect()
    assert(bins.nonEmpty)
    val sorted = bins.sortBy(_.getLong(0))
    // bin ids dense from 0, doc ranges ascending and non-overlapping
    sorted.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i, s"bin ids not dense at $i")
    }
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(4) < b.getLong(3),
          s"bin ${a.getLong(0)} last_doc overlaps bin ${b.getLong(0)} first_doc")
      case _ =>
    }
    val totalDocs = sorted.map(_.getLong(1)).sum
    val nDocs = graft.engine.Tables(spark, sf).documents.count()
    assert(totalDocs == nDocs, s"packing dropped docs: $totalDocs != $nDocs")
    // every bin except the last starts a new capacity window: its first
    // doc's predecessor cumsum crossed the boundary, so each bin's
    // token count is at least 1 and the grand total matches the corpus
    val totalTokens = sorted.map(_.getLong(2)).sum
    val expectTokens = graft.engine.Tables(spark, sf).documents
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(totalTokens == expectTokens, "token totals drifted through the prefix sum")
  }

  test("stratified sample: every kept row satisfies its language quota, rates track") {
    val rows = run("q_pipeline_stratified_sample").collect()
    assert(rows.nonEmpty)
    val quota = Map("en" -> 60L, "de" -> 30L).withDefaultValue(15L)
    rows.foreach { r =>
      assert(r.getLong(2) < quota(r.getString(1)),
        s"doc ${r.getLong(0)} bucket ${r.getLong(2)} exceeds ${r.getString(1)} quota")
    }
    // deterministic: same fixture, same sample — rerun is identical
    val again = run("q_pipeline_stratified_sample").collect()
    assert(rows.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("chunking: windows bounded by 64 tokens, strides cover every word") {
    val chunks = run("q_pipeline_chunk_documents").collect()
    assert(chunks.nonEmpty)
    chunks.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 64,
        s"chunk ${r.getLong(0)}/${r.getLong(1)} has ${r.getLong(2)} words")
    }
    // per doc: chunk ids dense from 0, and stride coverage means the
    // word count implied by the last chunk reaches the doc's word count
    val byDoc = chunks.groupBy(_.getLong(0))
    val wordCounts = graft.engine.Tables(spark, sf).documents
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, rs) =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.zipWithIndex.forall { case (id, i) => id == i },
        s"doc $doc chunk ids not dense: ${ids.take(5)}")
      val last = rs.maxBy(_.getLong(1))
      val covered = last.getLong(1) * 48 + last.getLong(2)
      assert(covered == wordCounts(doc),
        s"doc $doc: chunks cover $covered of ${wordCounts(doc)} words")
    }
  }

  test("dup clusters: ids are member minima, sizes >= 2, members exist") {
    val clusters = run("q_pipeline_dup_clusters").collect()
    clusters.foreach { r =>
      assert(r.getLong(1) >= 2, "singleton cluster reported")
      assert(r.getLong(0) < r.getLong(2), "cluster id is not the min member")
    }
    val ids = clusters.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "duplicate cluster ids")
  }
}
