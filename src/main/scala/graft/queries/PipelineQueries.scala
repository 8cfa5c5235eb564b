package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.engine.Tables
import QueryDef.q

/** Large-scale training-data-pipeline operators beyond the per-document
  * suites (builder-prompt extension surface; the reference stops at SQL
  * pass-through):
  *
  *  - sequence packing: assign documents to fixed token-capacity
  *    training bins by a global prefix sum over a total document order —
  *    the "concat-and-chunk" packing every LLM pretraining pipeline
  *    runs. The prefix sum is the textbook two-pass distributed scan
  *    (per-partition subtotals → cumulative offsets → in-partition
  *    running sum), never a single-partition window.
  *  - stratified sampling: deterministic per-language hash-mod keep
  *    rates (data mixing). Row-local — a filter that pushes to the
  *    scan; the only shuffle is presentation order.
  *  - duplicate clustering: connected components over the banded-
  *    minhash candidate-pair graph (DedupQueries.minhashPairs), by
  *    iterative min-label propagation to a convergence fixpoint — the
  *    canonical-document assignment step that turns pair lists into
  *    dedup decisions.
  */
object PipelineQueries {

  /** Token-capacity of one packed training sequence (tokens ≈ whitespace
    * words here; the packing shape is what scales, not the tokenizer). */
  private val PackCapacity = 2048L

  /** Connected components of an undirected edge list. Returns (u, c):
    * every node that appears in an edge, mapped to its component's
    * minimum node id.
    *
    * ADAPTIVE, like the q5 broadcast (the r14 pattern for anything
    * that scales with data): the edge count is already known from the
    * materializing count, so
    *  - at or under `driverLimit` edges the graph is metadata-sized —
    *    driver union-find (path-compressed, min-rooted) answers in
    *    microseconds where even ONE distributed round costs ~10 stage
    *    floors (measured 1.0-1.5 s/round on a 276-edge residual);
    *  - past the limit, alternating LARGE-STAR / SMALL-STAR rounds
    *    (Kiveris et al., "Connected Components in MapReduce and
    *    Beyond") — O(log n) rounds on ANY topology, including the
    *    chain graphs where plain min-label propagation needs
    *    O(diameter) rounds (the r14-declared boundary, closed r15).
    *    Convergence is an EXACT set comparison; localCheckpoint
    *    truncates per-round lineage.
    * The default limit collects ≤ ~16 MB of edge pairs — same class
    * as a broadcast-join build side, with the distributed path as the
    * overflow, never a failure. */
  private[graft] def starComponents(edges0: DataFrame,
      driverLimit: Long = 1000000L): DataFrame = {
    val spark = edges0.sparkSession
    var star = edges0
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u").cast("long"), col("v").cast("long")).as("u"),
        least(col("u").cast("long"), col("v").cast("long")).as("v"))
      .distinct()
      .localCheckpoint(false)
    var residual = star.count()
    if (residual <= driverLimit) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      val nodes = scala.collection.mutable.HashSet.empty[Long]
      star.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        nodes += a; nodes += b
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val rows = nodes.toSeq.map(n => Row(n, find(n)))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("u", LongType), StructField("c", LongType))))
    }
    var iter = 0
    var converged = false
    while (!converged && iter < 30) {
      // LARGE-STAR: for each node u, every strictly-larger neighbor v
      // re-attaches to m = min(N(u) ∪ {u})
      val nbrs = star.select(col("u"), col("v"))
        .union(star.select(col("v").as("u"), col("u").as("v"))) // both directions
      val mu = nbrs.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = nbrs.join(mu, "u")
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // SMALL-STAR: edges point large→small already (u > v); every
      // smaller neighbor and u itself attach to the smallest
      val mv = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val withM = large.join(mv, "u")
      val small = withM
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .union(withM.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(false)
      // exact fixpoint test: equal count + containment ⇒ equal sets
      val n2 = small.count()
      converged = n2 == residual && small.exceptAll(star).isEmpty
      star = small
      residual = n2
      iter += 1
    }
    // at the fixpoint every component is a star around its min: each
    // non-center node carries exactly one edge to the center
    star.groupBy(col("u")).agg(min(col("v")).as("c"))
      .union(star.select(col("v").as("u"), col("v").as("c")).distinct())
      .groupBy(col("u")).agg(min(col("c")).as("c"))
  }

  /** Fixed-weight logistic quality score over a `text` column — the
    * deployment artifact shared by the batch operator
    * (q_pipeline_quality_score) and the streaming gate
    * (streaming/EventStreams.qualityGate), so the two can never drift.
    * Row-local codegen'd arithmetic, no UDF. */
  private[graft] val QualityStops =
    Seq("the", "a", "of", "and", "der", "el", "le", "de", "la")
  private[graft] def qualityScore: org.apache.spark.sql.Column = {
    val words = split(col("text"), " ")
    val nw = size(words)
    val logit = lit(-2.0) + lit(0.3) * log(nw.cast("double")) +
      lit(0.2) * ((length(col("text")) - (nw - 1)) * 1.0 / nw) -
      lit(1.5) * (size(filter(words, x => x.isin(QualityStops.map(lit): _*))) * 1.0 / nw) +
      lit(2.0) * (size(array_distinct(words)) * 1.0 / nw)
    lit(1.0) / (lit(1.0) + exp(-logit))
  }

  val all: Seq[QueryDef] = Seq(

    q("q_pipeline_pack_sequences",
      s"""WITH tok AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |        sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS prev
        |      FROM tok)
        |SELECT CAST(prev // $PackCapacity AS BIGINT) AS bin_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY bin_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // Documents are packed in doc_id order: bin = floor(prefix-sum of
      // token counts before this doc / capacity) — each doc lands in the
      // bin where its first token falls. The oracle states this as an
      // unpartitioned window cumsum (fine single-node); HERE the prefix
      // sum is distributed: range-repartition to a global order, one
      // pass for per-partition token subtotals (a #partitions-sized
      // driver array — metadata, not data), one pass assigning
      // offset + running sum. Both passes are fully parallel; no task
      // ever sees more than its partition.
      val tok = t.documents
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
        .repartitionByRange(col("doc_id"))
        .sortWithinPartitions(col("doc_id"))
      // the RDD feeds TWO passes (subtotal collect, assignment), but
      // the scan+tokenize does NOT run twice: both jobs share the
      // range-repartition exchange above, and Spark reuses the shuffle
      // map outputs across actions on the same RDD graph — measured by
      // PackSequencesScanSpec (parquet bytesRead ≈ one scan for the
      // whole query, with or without an explicit checkpoint)
      val rdd = tok.select(col("doc_id"), col("n_tok")).rdd
      val subtotals = rdd
        .mapPartitionsWithIndex { (i, it) =>
          var sum = 0L; it.foreach(r => sum += r.getLong(1)); Iterator((i, sum))
        }
        .collect().sortBy(_._1).map(_._2)
      val offsets = subtotals.scanLeft(0L)(_ + _)
      val prevRows = rdd.mapPartitionsWithIndex { (i, it) =>
        var acc = offsets(i)
        it.map { r => val o = acc; acc += r.getLong(1); Row(r.getLong(0), r.getLong(1), o) }
      }
      val prev = s.createDataFrame(prevRows, StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n_tok", LongType, nullable = false),
        StructField("prev", LongType, nullable = false))))
      prev.groupBy((col("prev") / PackCapacity).cast("long").as("bin_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("bin_id"))
    },

    q("q_pipeline_stratified_sample",
      """SELECT doc_id, lang,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 <
        |  CASE WHEN lang = 'en' THEN 60 WHEN lang = 'de' THEN 30 ELSE 15 END
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // Data mixing by deterministic hash-mod quotas: md5 of the doc key
      // → bucket 0–99, keep while bucket < per-language rate. Stable
      // across runs/engines (both hash the same decimal rendering of
      // doc_id), embarrassingly parallel, and reproducible — re-running
      // the pipeline keeps the SAME documents, the property that makes
      // hash sampling the standard over rand() at 100 TB.
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
      val quota = when(col("lang") === "en", 60)
        .when(col("lang") === "de", 30).otherwise(15)
      t.documents
        .select(col("doc_id"), col("lang"), bucket.as("bucket"), quota.as("quota"))
        .filter(col("bucket") < col("quota"))
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy(col("doc_id"))
    },

    q("q_pipeline_chunk_documents",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |chunks AS (
        |  SELECT doc_id, CAST((i - 1) / 48 AS BIGINT) AS chunk_id,
        |    len(words[i : least(i + 63, len(words))]) AS n_words,
        |    words[i] AS first_word
        |  FROM w, UNNEST(generate_series(1, len(words), 48)) AS t(i))
        |SELECT doc_id, chunk_id, CAST(n_words AS BIGINT) AS n_words, first_word
        |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // Overlapping-window chunking (64-token windows, stride 48 — the
      // long-document split every context-bounded training pipeline
      // runs between cleaning and packing). Row-local: one explode of
      // the stride positions per document, chunk content addressed by
      // slice — no shuffle except presentation order. chunk_id is the
      // stride index so downstream joins can reassemble a document's
      // chunks in order.
      val words = split(col("text"), " ")
      t.documents
        .select(col("doc_id"), words.as("words"))
        .select(col("doc_id"),
          explode(sequence(lit(1), size(col("words")), lit(48))).as("i"),
          col("words"))
        .select(col("doc_id"),
          ((col("i") - 1) / 48).cast("long").as("chunk_id"),
          least(col("i") + 63, size(col("words")))
            .minus(col("i")).plus(1).cast("long").as("n_words"),
          element_at(col("words"), col("i")).as("first_word"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    q("q_pipeline_domain_mix",
      """SELECT doc_id, source, lang, copy_id
        |FROM documents,
        |  UNNEST(generate_series(1, CASE WHEN source IN ('src0','src1','src2') THEN 3
        |                                 WHEN lang = 'en' THEN 2 ELSE 1 END)) AS t(copy_id)
        |ORDER BY doc_id, copy_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // Deterministic up-sampling for domain mixing: the mix recipe
      // (domain → weight) replicates each document weight times via an
      // exploded sequence — row-local, reproducible, and the weights
      // are plan literals so the same recipe re-runs identically (the
      // property rand()-based resampling lacks). Downstream packing/
      // shuffling sees copy_id to keep replicas distinguishable.
      val weight = when(col("source").isin("src0", "src1", "src2"), 3)
        .when(col("lang") === "en", 2).otherwise(1)
      t.documents
        .select(col("doc_id"), col("source"), col("lang"),
          explode(sequence(lit(1), weight)).as("copy_id"))
        .orderBy(col("doc_id"), col("copy_id"))
    },

    q("q_pipeline_dup_clusters",
      """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS sh
        |       FROM w, UNNEST(generate_series(1, len(words)-2)) AS t(i)),
        |vs AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS v FROM sh),
        |seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
        |sigs AS (SELECT doc_id, seed,
        |           min((v * (1000003 + 999983 * seed) + seed) % 4294967291) AS mh
        |         FROM vs CROSS JOIN seeds GROUP BY doc_id, seed),
        |bands AS (SELECT doc_id, seed // 2 AS band,
        |            string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY doc_id, seed // 2),
        |pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |          FROM bands a JOIN bands b
        |            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
        |          UNION ALL SELECT d2, d1 FROM pairs),
        |walk(doc_id, lbl) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, wk.lbl FROM walk wk JOIN edges e ON e.src = wk.doc_id),
        |comp AS (SELECT doc_id, min(lbl) AS cluster FROM walk GROUP BY doc_id)
        |SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs, max(doc_id) AS last_doc
        |FROM comp GROUP BY cluster HAVING count(*) >= 2
        |ORDER BY cluster""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // Near-duplicate clusters = connected components of the minhash
      // candidate-pair graph; the cluster id is the component's min
      // doc_id (the canonical document a dedup pass would keep).
      //
      // r15 shape (closes the r14-declared pathological-chain boundary):
      //   1. SEED (round-0 contraction): each doc's label = min doc_id
      //     over every band bucket it belongs to — a bucket is a clique
      //     in the pair graph, so this resolves intra-bucket structure
      //     with two groupBys, no edge iteration.
      //   2. CONTRACT: pairs project onto seed labels; only pairs whose
      //     endpoints carry DIFFERENT labels survive (docs bridging two
      //     buckets). The residual graph is label-count-sized — empty
      //     for bucket-disjoint corpora (checked with one count: the
      //     common case runs ZERO rounds).
      //   3. LARGE-STAR / SMALL-STAR alternation (Kiveris et al.,
      //     "Connected Components in MapReduce and Beyond") on the
      //     residual graph — O(log n) rounds on ANY topology, including
      //     the chain shapes where plain min-label propagation needs
      //     O(diameter). Each round is two groupBy+join dataflows over
      //     edges; convergence = (count, endpoint-sum) signature
      //     fixpoint (both ops only shrink endpoints, so the signature
      //     is monotone). localCheckpoint truncates per-round lineage.
      // The band table is checkpointed ONCE and feeds both the edge
      // list and the label seed — the shingle→minhash pipeline (the
      // expensive part) runs exactly one job.
      val bands = DedupQueries.minhashBands(t.documents).localCheckpoint()
      val bmin = bands.groupBy(col("band"), col("bkey"))
        .agg(min(col("doc_id")).as("bmin"))
      val seed = bands.join(bmin, Seq("band", "bkey"))
        .groupBy(col("doc_id")).agg(min(col("bmin")).as("lbl"))
        .localCheckpoint()
      // Residual graph over LABELS, usually empty; [[starComponents]]
      // resolves it in O(log n) rounds regardless of topology.
      // NO pair self-join anywhere: a bucket is a clique, so its
      // connectivity is fully captured by star edges to the bucket min
      // — every member doc contributes (its label, the bucket min);
      // a doc in two buckets is exactly what bridges them. This is both
      // the correctness-preserving contraction of the pair graph AND
      // the scale shape (|bands| rows, never the quadratic bucket
      // blow-up a hot bucket's explicit pair list would cost).
      val residualEdges = bands.join(bmin, Seq("band", "bkey"))
        .join(seed, "doc_id")
        .filter(col("lbl") =!= col("bmin"))
        .select(col("lbl").as("u"), col("bmin").as("v"))
      // star map: residual-component members → component min; identity
      // for labels the contraction never touched
      val center = starComponents(residualEdges)
      val labels = t.documents.select(col("doc_id"))
        .join(seed, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("lbl"))
        .join(center, col("lbl") === col("u"), "left")
        .select(col("doc_id"), coalesce(col("c"), col("lbl")).as("lbl"))
      labels.groupBy(col("lbl").as("cluster"))
        .agg(count(lit(1)).as("n_docs"), max(col("doc_id")).as("last_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("cluster"))
    },

    // Boilerplate removal (RefinedWeb-style): segment every document
    // into fixed 10-word chunks, count each chunk's document frequency
    // across the corpus, drop chunks shared by >= 2 documents
    // (headers/footers/templates — near-dup docs share exactly these),
    // and REASSEMBLE the surviving chunks in original order. Unlike the
    // clean-corpus filter (drops whole docs) this REWRITES documents.
    // Scale: chunk-df is one map-side-combined shuffle; the boilerplate
    // set is corpus-frequency-skew small → broadcastable anti-join;
    // reassembly groups by doc (bounded by doc length).
    q("q_pipeline_boilerplate",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |ch AS (SELECT doc_id, i AS cpos,
        |         array_to_string(words[(i*10+1):(i*10+10)], ' ') AS chunk
        |       FROM w, UNNEST(generate_series(0, CAST(ceil(len(words) / 10.0) AS BIGINT) - 1)) AS t(i)),
        |df AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM ch GROUP BY chunk),
        |kept AS (SELECT ch.doc_id, ch.cpos, ch.chunk
        |         FROM ch JOIN df USING (chunk) WHERE df < 2)
        |SELECT doc_id, count(*) AS n_kept,
        |  string_agg(chunk, ' ' ORDER BY cpos) AS cleaned
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val chunkArr = transform(
        sequence(lit(0), (ceil(size(col("words")) / lit(10.0)) - 1).cast("int")),
        i => array_join(slice(col("words"), i * 10 + 1, lit(10)), " "))
      val chunks = t.documents
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(col("doc_id"), posexplode(chunkArr).as(Seq("cpos", "chunk")))
      // df counts DISTINCT docs per chunk, and a (chunk, doc) pair can
      // only repeat inside one document's own row — dedup ROW-LOCALLY
      // (array_distinct before the explode) so the boiler side is a
      // plain count with map-side partial aggregation, not the
      // two-phase distinct aggregate (one exchange fewer, and the
      // surviving exchange carries one row per (doc, distinct chunk)
      // instead of every chunk occurrence). Same r9 move as the
      // shingle suites.
      val boiler = t.documents
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(explode(array_distinct(chunkArr)).as("chunk"))
        .groupBy(col("chunk")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("chunk"))
      chunks.join(boiler, Seq("chunk"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(
            sort_array(collect_list(struct(col("cpos"), col("chunk")))),
            x => x.getField("chunk")), " ").as("cleaned"))
        .orderBy(col("doc_id"))
    },

    // Deterministic global training-order shuffle: the export step that
    // turns a corpus into a reproducible training stream. Each doc gets
    // a 60-bit md5 key (engine-independent), the corpus is globally
    // sorted by it, sharded by the key's top 3 bits (RANGE shards, so
    // shard boundaries are contiguous in the sort), and every doc gets
    // its 0-based position WITHIN its shard. The global rank uses the
    // distributed zipWithIndex shape (range-partition + in-partition
    // sort + per-partition offsets — q_evt_positional's); per-shard
    // positions derive from an 8-row broadcast of shard offsets. No
    // single-partition window at any step; correctness is independent
    // of the range sampler because (key, doc_id) is a unique total
    // order.
    q("q_pipeline_train_order",
      """WITH k AS (SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS key
        |  FROM documents),
        |r AS (SELECT doc_id, key, key >> 57 AS shard,
        |        row_number() OVER (ORDER BY key, doc_id) - 1 AS gix FROM k),
        |s AS (SELECT shard, min(gix) AS s0 FROM r GROUP BY shard)
        |SELECT doc_id, r.shard, gix - s0 AS shard_pos
        |FROM r JOIN s ON r.shard = s.shard
        |ORDER BY r.shard, shard_pos""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val keyed = t.documents.select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("key"))
      val sorted = keyed
        .repartitionByRange(col("key"), col("doc_id"))
        .sortWithinPartitions(col("key"), col("doc_id"))
      val rows = sorted.rdd.zipWithIndex.map { case (r, i) =>
        Row(r.getLong(0), r.getLong(1), i) }
      val ranked = s.createDataFrame(rows, StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("key", LongType, nullable = false),
          StructField("gix", LongType, nullable = false))))
        .withColumn("shard", shiftright(col("key"), 57))
      val offsets = ranked.groupBy(col("shard")).agg(min(col("gix")).as("s0"))
      ranked.join(broadcast(offsets), Seq("shard"))
        .select(col("doc_id"), col("shard"), (col("gix") - col("s0")).as("shard_pos"))
        .orderBy(col("shard"), col("shard_pos"))
    },

    // Model-scoring filter: a fixed-weight logistic quality classifier
    // (the fasttext-style "is this page trainable" gate) evaluated
    // IN-PLAN — features are row-local arithmetic over the word array,
    // the sigmoid is one codegen'd expression, no UDF. The weights are
    // a deployment artifact (literals), so the whole operator is a
    // scan-side filter that pushes column pruning to parquet and
    // pipelines into whatever consumes the kept docs.
    // Dedup APPLY: materialize the kept corpus after exact dedup — for
    // every md5(text) group keep the lowest doc_id (the canonical),
    // drop the rest. This is the decision step the counting operator
    // (q_dedup_exact) and the clustering operator (dup_clusters) feed;
    // output is per-source kept/dropped accounting plus the canonical
    // id range, so the result stays result-sized while the kept-doc
    // assignment itself is checked through the min/max/sum columns.
    // One map-side-combined shuffle on the 16-byte content hash, one
    // tiny per-source roll-up — at 100 TB the hash groupBy IS the
    // dedup; no sort, no window.
    q("q_pipeline_dedup_apply",
      """WITH canon AS (
        |  SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS grp_n
        |  FROM documents GROUP BY md5(text)),
        |kept AS (SELECT d.source, d.doc_id, c.grp_n
        |         FROM documents d JOIN canon c ON md5(d.text) = c.h AND d.doc_id = c.keep_id)
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(grp_n - 1) AS BIGINT) AS n_dropped,
        |  min(doc_id) AS first_keep, max(doc_id) AS last_keep,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_keep
        |FROM kept GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // keep_id and the group's source ride the SAME aggregate via
      // min(struct(doc_id, source)) — no join back to documents, one
      // shuffle on the content hash (the oracle's join spelling reads
      // the same rows; min-by-doc_id of (doc_id, source) is exactly the
      // kept row's columns)
      val canon = t.documents
        .groupBy(md5(col("text")).as("h"))
        .agg(min(struct(col("doc_id"), col("source"))).as("k"),
          count(lit(1)).as("grp_n"))
        .select(col("k.doc_id").as("keep_id"), col("k.source").as("source"), col("grp_n"))
      canon.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("grp_n") - 1).as("n_dropped"),
          min(col("keep_id")).as("first_keep"),
          max(col("keep_id")).as("last_keep"),
          sum(col("keep_id")).as("sum_keep"))
        .orderBy(col("source"))
    },

    // Token-budget data selection: aggregate token counts per source,
    // rank sources by contribution, and greedily admit whole sources
    // until half the corpus token budget is spent — the "choose which
    // crawls/domains fit this training run" step. The fact-table work
    // is ONE map-side-combined aggregation; everything after (ordering,
    // prefix sum, budget cut) runs on the per-source table, whose
    // cardinality is bounded by the number of domains — a window there
    // is fine at any corpus size, because it never touches fact rows.
    q("q_pipeline_token_budget",
      """WITH src AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |ranked AS (
        |  SELECT source, toks,
        |    CAST(sum(toks) OVER (ORDER BY toks DESC, source
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS BIGINT) AS prior,
        |    CAST(sum(toks) OVER () AS BIGINT) AS total
        |  FROM src)
        |SELECT source, toks, prior
        |FROM ranked WHERE prior < total * 0.5
        |ORDER BY toks DESC, source""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val src = t.documents.groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("toks"))
      // prefix sum WITHOUT a global window (even a bounded one would
      // plan a single-partition WindowExec): prior = sum over the
      // strictly-higher-ranked sources via a broadcast theta-join on
      // the per-source table — O(domains²) pairs, trivial at any
      // corpus size, and every stage stays partitioned
      val other = src.select(col("source").as("s2"), col("toks").as("t2"))
      val prior = src.join(broadcast(other),
          col("t2") > col("toks") ||
            (col("t2") === col("toks") && col("s2") < col("source")), "left")
        .groupBy(col("source"), col("toks"))
        .agg(coalesce(sum(col("t2")), lit(0L)).as("prior"))
      val total = src.agg(sum(col("toks")).as("total"))
      prior.crossJoin(broadcast(total))
        .filter(col("prior") < col("total") * 0.5)
        .select(col("source"), col("toks"), col("prior"))
        .orderBy(col("toks").desc, col("source"))
    },

    q("q_pipeline_quality_score",
      """WITH f AS (
        |  SELECT doc_id, string_split(text, ' ') AS words, length(text) AS nc FROM documents
        |), feat AS (
        |  SELECT doc_id,
        |    len(words) AS n_words,
        |    (nc - (len(words) - 1)) * 1.0 / len(words) AS mean_wlen,
        |    len(list_filter(words, x -> x IN ('the', 'a', 'of', 'and', 'der', 'el', 'le', 'de', 'la'))) * 1.0 / len(words) AS stop_ratio,
        |    len(list_distinct(words)) * 1.0 / len(words) AS uniq_ratio
        |  FROM f)
        |SELECT doc_id, n_words,
        |  round(1.0 / (1.0 + exp(-(-2.0 + 0.3 * ln(n_words) + 0.2 * mean_wlen
        |    - 1.5 * stop_ratio + 2.0 * uniq_ratio))), 9) AS quality,
        |  1.0 / (1.0 + exp(-(-2.0 + 0.3 * ln(n_words) + 0.2 * mean_wlen
        |    - 1.5 * stop_ratio + 2.0 * uniq_ratio))) >= 0.5 AS keep
        |FROM feat ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val score = qualityScore
      t.documents.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          round(score, 9).as("quality"), (score >= 0.5).as("keep"))
        .orderBy(col("doc_id"))
    }
  )
}
