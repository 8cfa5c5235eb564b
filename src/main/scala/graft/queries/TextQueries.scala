package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import QueryDef.q

/** Text analysis suite over `documents` (builder-prompt extension
  * surface): language ID, quality scoring, tokenization, rolling-hash
  * fingerprinting. Everything is a deterministic row-local expression
  * over the text column — embarrassingly parallel, no shuffle except
  * final presentation order, so the per-row cost is the whole story at
  * 100 TB. The DuckDB oracles state the same computation with DuckDB's
  * list/lambda vocabulary (list_filter/list_reduce ↔ filter/aggregate).
  */
object TextQueries {

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Deliberately small: the operator's shape
    * (score = |words ∩ profile|, argmax over languages) is what scales,
    * not the profile size. */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "nicht", "das"),
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo"))

  private def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Shannon character entropy per document — the cheap gibberish /
    * binary-noise detector (very low entropy = repeated filler, very
    * high = random bytes). The (doc, char) explode + hash aggregate
    * stays in whole-stage codegen (an all-row-local HOF run-length
    * variant was A/B'd in r15 and measured SLOWER — higher-order
    * lambdas are interpreted, and they ran per CHARACTER); what the
    * r15 rework removes is everything AFTER the histogram: the
    * former second aggregate (per-doc totals) and the join back are
    * replaced by ONE groupBy(doc) that carries the run counts out as
    * a doc-sized list and folds the entropy terms row-locally — per
    * DISTINCT char, not per char. 2 exchanges instead of 4 + join.
    *
    * Factored over an arbitrary (doc_id, text) frame so the exactness
    * argument below is pinned by a unit test on crafted docs
    * (ADVICE r15: MakeDecimal is a catalyst-internal API whose
    * semantics a Spark upgrade could change silently). */
  private[graft] def charEntropy(docs: DataFrame): DataFrame = {
    val chars = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
    val cc = chars.groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("n"))
    val agg2 = cc.groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_chars"),
        count(lit(1)).as("n_distinct"),
        collect_list(col("n")).as("ns"))
    // the fold accumulates the EXACT unscaled decimal sum in a long:
    // each term is the oracle's cast((n/nt)·log2(n/nt) as
    // decimal(28,15)); |term| < 1, so term × 10^15 is an integer
    // < 10^15 (the decimal multiply is exact — integer value, no
    // scale rounding) and all terms share a sign, so every partial
    // sum is bounded by |Σ| ≤ log2(nt) × 10^15 ≪ Long.Max. A direct
    // decimal(38,15) fold is impossible — ANSI addition at precision
    // 38 must shed a scale digit. MakeDecimal rebuilds decimal(38,15)
    // from the unscaled sum, bit-identical to Spark's own
    // sum(decimal(28,15)) accumulator, so the final double equals the
    // oracle's CAST(sum AS DOUBLE) exactly, in any term order.
    val terms = transform(col("ns"), n => {
      val p = n * 1.0 / col("n_chars")
      ((p * log2(p)).cast("decimal(28,15)") * lit(1000000000000000L)).cast("long")
    })
    val sumU = aggregate(terms, lit(0L), (acc, x) => acc + x)
    val entDec = org.apache.spark.sql.GraftBridge.toColumn(
      org.apache.spark.sql.catalyst.expressions.MakeDecimal(
        org.apache.spark.sql.GraftBridge.toExpression(-sumU), 38, 15, false))
    agg2.select(col("doc_id"), col("n_chars"), col("n_distinct"),
        round(entDec.cast("double"), 9).as("entropy"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[QueryDef] = Seq(

    q("q_fn_lambda",
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(words, w -> CAST(length(w) AS BIGINT))),
        |              (a, b) -> a + b) AS total_len,
        |  len(list_filter(words, w -> length(w) >= 6)) > 0 AS has_long,
        |  len(list_filter(words, w -> length(w) <= 9)) = len(words) AS all_short,
        |  list_transform(list_filter(words, w -> w LIKE 's%'), w -> upper(w))[1] AS first_s_up
        |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        |ORDER BY doc_id LIMIT 400""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // Spark's dedicated higher-order functions (aggregate/exists/
      // forall) against DuckDB's list_reduce/list_filter spellings
      val words = split(col("text"), " ")
      t.documents.select(
        col("doc_id"),
        aggregate(words, lit(0L), (acc, w) => acc + length(w)).as("total_len"),
        exists(words, w => length(w) >= 6).as("has_long"),
        forall(words, w => length(w) <= 9).as("all_short"),
        // try_element_at: DuckDB's l[1] is NULL on an empty list, while
        // ANSI element_at errors
        try_element_at(transform(filter(words, w => w.like("s%")), w => upper(w)), lit(1))
          .as("first_s_up"))
        .orderBy(col("doc_id")).limit(400)
    },

    q("q_pipeline_clean_corpus",
      """WITH scored AS (
        |  SELECT doc_id, lang, source, text,
        |    len(string_split(text, ' ')) AS n_words,
        |    length(text) AS n_chars
        |  FROM documents
        |), quality AS (
        |  SELECT * FROM scored
        |  WHERE n_chars BETWEEN 20 AND 2000 AND n_words >= 5
        |), keyed AS (
        |  SELECT *, md5(text) AS h FROM quality
        |), exact_kept AS (
        |  SELECT * FROM keyed
        |  WHERE doc_id = (SELECT min(k2.doc_id) FROM keyed k2 WHERE k2.h = keyed.h)
        |), w AS (SELECT doc_id, string_split(text, ' ') AS words FROM exact_kept),
        |sh AS (SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS sh
        |       FROM w, UNNEST(generate_series(1, len(words)-2)) AS t(i)),
        |vs AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS v FROM sh),
        |sigs AS (
        |  SELECT doc_id,
        |    CAST(min((v * 1000003) % 4294967291) AS VARCHAR) || ',' ||
        |    CAST(min((v * 1999966 + 1) % 4294967291) AS VARCHAR) AS bkey
        |  FROM vs GROUP BY doc_id
        |), near_dropped AS (
        |  SELECT DISTINCT b.doc_id
        |  FROM sigs a JOIN sigs b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
        |)
        |SELECT e.lang, e.source,
        |  count(*) AS n_docs,
        |  CAST(sum(e.n_words) AS BIGINT) AS total_words,
        |  round(avg(e.n_chars), 6) AS avg_chars
        |FROM exact_kept e
        |WHERE e.doc_id NOT IN (SELECT doc_id FROM near_dropped)
        |GROUP BY e.lang, e.source
        |ORDER BY e.lang, e.source""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // The whole training-data story in one dataflow: quality gate →
      // exact dedup (keep min doc per digest) → MinHash near-dedup
      // (2-hash band) → per-(lang, source) corpus stats.
      //
      // Fused single-pass shape (r15, closes the last >2× data-path
      // row): BOTH text digests — the exact-dedup md5 and the minhash
      // band key — are computed row-locally in ONE projection over the
      // scan, so the text is read once and DROPPED before the first
      // exchange. Exact dedup is then min_by(struct(…)) in a single
      // hash aggregate — no keep-list semi-join, no second pass over
      // text, and no localCheckpoint (the r8 materialization existed
      // only because the old two-consumer subtree re-read the corpus;
      // with text gone pre-shuffle, the shared subtree below the
      // aggregate is identical at every consumer and the recompute,
      // if exchange reuse ever misses, is a compact-row shuffle, not
      // a corpus scan). At 100 TB: one pass over text, one shuffle of
      // digest-width rows, then joins over doc-count-sized sides.
      val words = split(col("text"), " ")
      val scored0 = t.documents
        .withColumn("n_words", size(words).cast("long"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .filter(col("n_chars").between(20, 2000) && col("n_words") >= 5)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_words"), col("n_chars"), md5(col("text")).as("h"),
          // both (a·v + b) mod p universal min-hashes in ONE row-local
          // expression pass (functions.MinHashSigs) — no shingle
          // explode, no groupBy(doc) shuffle
          graft.functions.TextHashColumns.minHashSigs(col("text"),
            Seq(1000003L, 1999966L), Seq(0L, 1L), 4294967291L).as("mh0"))
      // the singleton explode is the CollapseProject barrier: without
      // it the two element_at reads inline minHashSigs twice
      val scored = scored0
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_words"), col("n_chars"), col("h"),
          explode(array(col("mh0"))).as("mh"))
        .withColumn("bkey", when(col("mh").isNotNull, concat(
          element_at(col("mh"), 1).cast("string"), lit(","),
          element_at(col("mh"), 2).cast("string"))))
        .drop("mh")
      val kept = scored.groupBy(col("h"))
        .agg(min_by(struct(col("doc_id"), col("lang"), col("source"),
          col("n_words"), col("n_chars"), col("bkey")), col("doc_id")).as("r"))
        .select(col("r.*"))
      // near-dup drop, declaratively: the oracle drops doc b iff some
      // doc a shares its band key with a smaller doc_id — i.e. keep
      // exactly the min-doc_id doc of each bkey group. One unordered
      // window min over the band key (a single shuffle of compact
      // rows) replaces the self-join + DISTINCT + anti-join of the
      // pair formulation — same bucketed-by-band-key scale behavior,
      // three fewer exchanges, and no pair blow-up inside a hot band.
      // NULL bkeys (unreachable under the n_words ≥ 5 gate, which
      // guarantees ≥ 3 shingles) must NOT dedup against each other:
      // SQL window partitioning groups NULLs together.
      val wBand = org.apache.spark.sql.expressions.Window.partitionBy(col("bkey"))
      kept
        .withColumn("min_doc", min(col("doc_id")).over(wBand))
        .filter(col("bkey").isNull || col("doc_id") === col("min_doc"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_words"),
          round(avg(col("n_chars")), 6).as("avg_chars"))
        .orderBy(col("lang"), col("source"))
    },

    q("q_text_langid", {
      val scores = profiles.map { case (lang, ws) =>
        s"len(list_filter(words, w -> list_contains(${sqlList(ws)}, w))) AS s_$lang"
      }.mkString(",\n        |    ")
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    $scores
         |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents)
         |), best AS (
         |  SELECT doc_id, lang,
         |    CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
         |      WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
         |      WHEN s_fr THEN 'fr' ELSE 'zh' END AS pred,
         |    greatest(s_de, s_en, s_es, s_fr, s_zh) AS score
         |  FROM scored
         |)
         |SELECT pred, count(*) AS n,
         |  CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |  CAST(sum(score) AS BIGINT) AS total_score
         |FROM best GROUP BY pred ORDER BY pred""".stripMargin
    }) { (s, dir) =>
      val t = Tables(s, dir)
      val words = split(col("text"), " ")
      val scoreCols = profiles.map { case (lang, ws) =>
        size(filter(words, w => array_contains(array(ws.map(lit): _*), w)))
          .cast("long").as(s"s_$lang")
      }
      val scored = t.documents.select(col("doc_id") +: col("lang") +: scoreCols: _*)
      val best = greatest(profiles.map(p => col(s"s_${p._1}")): _*)
      // first-match tie-break in declared order, mirroring the CASE
      val pred = profiles.init.foldRight(lit(profiles.last._1): Column) {
        case ((lang, _), rest) => when(best === col(s"s_$lang"), lang).otherwise(rest)
      }
      scored
        .withColumn("pred", pred).withColumn("score", best)
        .groupBy(col("pred"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") === col("lang"), 1).otherwise(0)).as("n_correct"),
          sum(col("score")).as("total_score"))
        .orderBy(col("pred"))
    },

    q("q_text_quality",
      """SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(string_split(text, ' ')) AS n_words,
        |  round(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) * 1.0 / length(text), 9) AS punct_ratio,
        |  round(len(list_filter(string_split(text, ' '),
        |        w -> list_contains(['the','and','of','to','in','a','is'], w))) * 1.0
        |      / len(string_split(text, ' ')), 9) AS stop_ratio,
        |  round(length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')), 9) AS mean_word_len,
        |  CASE WHEN length(text) BETWEEN 20 AND 2000
        |        AND len(string_split(text, ' ')) >= 5 THEN 1 ELSE 0 END AS passes
        |FROM documents ORDER BY doc_id LIMIT 400""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val words = split(col("text"), " ")
      val stops = array(Seq("the", "and", "of", "to", "in", "a", "is").map(lit): _*)
      t.documents.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(words).cast("long").as("n_words"),
        round(length(regexp_replace(col("text"), lit("[a-z0-9 ]"), lit(""))) * 1.0
          / length(col("text")), 9).as("punct_ratio"),
        round(size(filter(words, w => array_contains(stops, w))) * 1.0
          / size(words), 9).as("stop_ratio"),
        round(length(regexp_replace(col("text"), lit(" "), lit(""))) * 1.0
          / size(words), 9).as("mean_word_len"),
        when(length(col("text")).between(20, 2000) && size(words) >= 5, 1)
          .otherwise(0).as("passes"))
        .orderBy(col("doc_id")).limit(400)
    },

    q("q_text_repetition",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS s
        |       FROM w, UNNEST(generate_series(1, len(words)-2)) AS t(i)),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |          CAST(count(DISTINCT s) AS BIGINT) AS n_uniq
        |        FROM sh GROUP BY doc_id)
        |SELECT doc_id, n_grams, n_uniq,
        |  round(1.0 - n_uniq * 1.0 / n_grams, 9) AS dup_frac,
        |  CASE WHEN 1.0 - n_uniq * 1.0 / n_grams > 0.3 THEN 1 ELSE 0 END AS repetitious
        |FROM agg ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // Gopher-style repetition filter: fraction of duplicate 3-grams
      // per document (Rae et al. 2021 use duplicate n-gram fractions to
      // drop boilerplate/repetitious pages). Both counts come from ONE
      // row-local projection over the shingle array — total vs distinct
      // size — so the filter costs one scan, no shuffle except
      // presentation order. (This is the rare case where the oracle's
      // GROUP BY count(DISTINCT) collapses to array arithmetic: the
      // grouping key is the row the array came from.)
      val words = split(col("text"), " ")
      // distinct 3-grams as distinct (w1,w2,w3) structs via arrays_zip
      // of shifted slices — identical to distinct joined strings (words
      // carry no spaces) and fully codegen'd, where the former
      // transform(sequence…) lambda was interpreted per gram
      val grams = arrays_zip(
        slice(col("words"), lit(1), size(col("words")) - 2),
        slice(col("words"), lit(2), size(col("words")) - 2),
        slice(col("words"), lit(3), size(col("words")) - 2))
      t.documents.select(col("doc_id"), words.as("words"))
        .select(col("doc_id"),
          (size(col("words")) - 2).cast("long").as("n_grams"),
          size(array_distinct(grams)).cast("long").as("n_uniq"))
        .select(col("doc_id"), col("n_grams"), col("n_uniq"),
          round(lit(1.0) - col("n_uniq") * 1.0 / col("n_grams"), 9).as("dup_frac"),
          when(lit(1.0) - col("n_uniq") * 1.0 / col("n_grams") > 0.3, 1)
            .otherwise(0).as("repetitious"))
        .orderBy(col("doc_id"))
    },

    q("q_text_char_entropy",
      """WITH c AS (SELECT doc_id, unnest(string_split_regex(text, '')) AS ch FROM documents),
        |cc AS (SELECT doc_id, ch, count(*) AS n FROM c WHERE ch <> '' GROUP BY doc_id, ch),
        |tot AS (SELECT doc_id, sum(n) AS nt FROM cc GROUP BY doc_id)
        |SELECT cc.doc_id,
        |  CAST(max(nt) AS BIGINT) AS n_chars,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round(CAST(-sum(CAST((n * 1.0 / nt) * log2(n * 1.0 / nt) AS DECIMAL(28,15))) AS DOUBLE), 9) AS entropy
        |FROM cc JOIN tot ON cc.doc_id = tot.doc_id
        |GROUP BY cc.doc_id ORDER BY cc.doc_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      charEntropy(t.documents)
    },

    q("q_text_tokens",
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
        |  len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS uniq_tokens,
        |  round(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))) * 1.0
        |      / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')), 9) AS ttr
        |FROM documents ORDER BY doc_id LIMIT 400""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val toks = regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
      t.documents.select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(toks).cast("long").as("bpe_tokens"),
        size(array_distinct(toks)).cast("long").as("uniq_tokens"),
        round(size(array_distinct(toks)) * 1.0 / size(toks), 9).as("ttr"))
        .orderBy(col("doc_id")).limit(400)
    },

    q("q_text_tfidf",
      """WITH tf AS (
        |  SELECT doc_id, word, count(*) AS f
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY doc_id, word
        |), df AS (
        |  SELECT word, count(*) AS d FROM tf GROUP BY word
        |), n AS (SELECT count(*) AS total FROM documents)
        |SELECT doc_id, word,
        |  round(f * ln(CAST(total AS DOUBLE) / d), 9) AS tfidf
        |FROM tf JOIN df USING (word) CROSS JOIN n
        |WHERE word IN ('spark', 'join', 'window')
        |ORDER BY doc_id, word LIMIT 600""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // classic two-aggregation shape: term frequency per (doc, word),
      // document frequency per word (broadcast — vocabulary ≪ corpus),
      // score in one codegen'd projection. At 100 TB both aggregations
      // are map-side-combined shuffles on their natural keys.
      // the word filter is applied AT the explode (Catalyst pushes it
      // below both aggregates anyway — making it explicit keeps the
      // shape honest), and tf is localCheckpointed because it feeds two
      // consumers (the df aggregation and the scoring join): without a
      // materialization point the scan+explode+tf subtree executes
      // twice — the diamond-over-aggregate never gets ReuseExchange.
      // Post-filter tf is ≤ |IN-list| rows per doc, so the checkpoint
      // is corpus-bounded at any scale. Measured sf0.1: 1.1 → 0.73 s.
      val words = t.documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word").isin("spark", "join", "window"))
      val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("f"))
        .localCheckpoint()
      val df = tf.groupBy(col("word")).agg(count(lit(1)).as("d"))
      // corpus size stays IN the plan (broadcast 1-row cross join, the
      // oracle's own CROSS JOIN n shape) — a driver-side .count() would
      // be a second Spark job per execution
      val n = t.documents.agg(count(lit(1)).cast("double").as("total"))
      tf.join(broadcast(df), "word")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("word"),
          round(col("f") * log(col("total") / col("d")), 9).as("tfidf"))
        .orderBy(col("doc_id"), col("word")).limit(600)
    },

    q("q_text_fingerprint",
      """WITH vals AS (
        |  SELECT doc_id,
        |    list_transform(string_split(text, ' '), w ->
        |      (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 4096 +
        |      (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) * 256 +
        |      (strpos('0123456789abcdef', substr(md5(w), 3, 1)) - 1) * 16 +
        |      (strpos('0123456789abcdef', substr(md5(w), 4, 1)) - 1)) AS vs
        |  FROM documents
        |)
        |SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), vs),
        |              (acc, v) -> (acc * 31 + v) % 1000000007) AS fp
        |FROM vals ORDER BY doc_id LIMIT 400""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // per-word 16-bit value from the first 4 md5 hex digits, then a
      // sequential polynomial fold mod 1e9+7 — aggregate() is Spark's
      // ordered fold, exactly list_reduce's semantics.
      t.documents.selectExpr("doc_id",
        """aggregate(
          |  transform(split(text, ' '), w ->
          |    (instr('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 4096 +
          |    (instr('0123456789abcdef', substr(md5(w), 2, 1)) - 1) * 256 +
          |    (instr('0123456789abcdef', substr(md5(w), 3, 1)) - 1) * 16 +
          |    (instr('0123456789abcdef', substr(md5(w), 4, 1)) - 1)),
          |  CAST(0 AS BIGINT),
          |  (acc, v) -> (acc * 31 + v) % 1000000007) AS fp""".stripMargin)
        .orderBy(col("doc_id")).limit(400)
    },

    // PII scrub: count + redact emails/phones. The fixture text has no
    // PII, so both sides append deterministic synthetic PII first —
    // the operator under test is the regex sweep, which is row-local
    // and embarrassingly parallel at any scale.
    q("q_text_pii_redact",
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or 555-123-4567 now' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(t, '555-[0-9]{3}-[0-9]{4}')) AS n_phones,
        |  substring(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '555-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'), greatest(1, length(t) - 59), 60) AS redacted_tail
        |FROM aug ORDER BY doc_id LIMIT 400""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phonePat = "555-[0-9]{3}-[0-9]{4}"
      val aug = t.documents.select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 555-123-4567 now")).as("t"))
      aug.select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(emailPat), lit(0))).cast("long").as("n_emails"),
          size(regexp_extract_all(col("t"), lit(phonePat), lit(0))).cast("long").as("n_phones"),
          regexp_replace(regexp_replace(col("t"), emailPat, "<EMAIL>"), phonePat, "<PHONE>")
            .substr(greatest(lit(1), length(col("t")) - 59), lit(60)).as("redacted_tail"))
        .orderBy(col("doc_id")).limit(400)
    },

    // Benchmark decontamination: find training docs sharing >= 3
    // distinct 3-gram shingles with a held-out eval split — the
    // inverted-index equi-join shape (never all-pairs), same scale
    // contract as the dedup suite.
    q("q_text_decontaminate",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         ('0x' || substr(md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2]), 1, 13))::BIGINT AS sh
        |       FROM w, UNNEST(generate_series(1, len(words)-2)) AS t(i)),
        |eval AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0),
        |hits AS (SELECT s.doc_id, count(*) AS n_overlap
        |         FROM sh s JOIN eval e USING (sh)
        |         WHERE s.doc_id % 20 <> 0
        |         GROUP BY s.doc_id)
        |SELECT doc_id, n_overlap FROM hits WHERE n_overlap >= 3
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val sh = DedupQueries.hashedShingles(t.documents)
      val eval = sh.filter(col("doc_id") % 20 === 0).select(col("sh")).distinct()
      sh.filter(col("doc_id") % 20 =!= 0)
        .join(eval, "sh")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
        .filter(col("n_overlap") >= 3)
        .select(col("doc_id"), col("n_overlap"))
        .orderBy(col("doc_id"))
    },

    // Corpus n-gram statistics: frequency + document frequency of every
    // bigram above a support threshold — the vocabulary/phrase-table
    // build step of a data pipeline. The bigram array is assembled
    // row-locally (one transform, no per-position explode of the words
    // copy); ONE map-side-combined shuffle on the bigram key does both
    // counts. At 100 TB the bigram key space is Zipf-bounded and the
    // HAVING threshold makes the output vocabulary-sized.
    q("q_text_ngram_stats",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |bg AS (SELECT doc_id, words[i] || ' ' || words[i+1] AS bg
        |       FROM w, UNNEST(generate_series(1, len(words)-1)) AS t(i))
        |SELECT bg, count(*) AS n, count(DISTINCT doc_id) AS df
        |FROM bg GROUP BY bg HAVING count(*) >= 20
        |ORDER BY n DESC, bg""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // bigram pairs via arrays_zip of the two shifted slices instead of
      // a transform(sequence...) lambda — higher-order functions are
      // CodegenFallback (interpreted per element, the minhash lesson);
      // slice/arrays_zip/explode stay inside whole-stage codegen
      val bigrams = arrays_zip(
        slice(col("words"), lit(1), size(col("words")) - 1),
        slice(col("words"), lit(2), size(col("words")) - 1))
      // count + countDistinct in ONE aggregate makes Spark Expand the
      // exploded bigram stream 2x (one replica per aggregate family)
      // before the shuffle; the two-level shape instead collapses
      // (bg, doc_id) duplicates map-side first — the second aggregate
      // then reads per-doc partials, and nothing is replicated
      t.documents
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(col("doc_id"), explode(bigrams).as("z"))
        .select(col("doc_id"), concat_ws(" ", col("z.0"), col("z.1")).as("bg"))
        .groupBy(col("bg"), col("doc_id")).agg(count(lit(1)).as("pn"))
        .groupBy(col("bg"))
        .agg(sum(col("pn")).as("n"), count(lit(1)).as("df"))
        .filter(col("n") >= 20)
        .orderBy(col("n").desc, col("bg"))
    },

    // Unigram language-model scoring: per-document mean log-likelihood
    // under the corpus unigram distribution, plus the rare-token
    // fraction — the perplexity-style quality signal pretraining
    // pipelines gate on. Two map-side-combined shuffles (vocabulary
    // count, per-doc mean); the corpus token total stays IN the plan
    // (broadcast 1-row cross join, same shape as tfidf). The log sum
    // goes through an exact DECIMAL intermediate so Spark partial-agg
    // order vs DuckDB morsel order cannot change the rounded result.
    q("q_text_unigram_lm",
      """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |vocab AS (SELECT word, count(*) AS n FROM words GROUP BY word),
        |tot AS (SELECT count(*) AS total FROM words)
        |SELECT doc_id, count(*) AS n_words,
        |  round(CAST(sum(CAST(ln(n * 1.0 / total) AS DECIMAL(28,15))) / count(*) AS DOUBLE), 9) AS avg_ll,
        |  round(sum(CASE WHEN n * 1.0 / total < 0.001 THEN 1 ELSE 0 END) * 1.0 / count(*), 9) AS rare_frac
        |FROM words JOIN vocab USING (word) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // (r15 negative A/B, measured at TWO scales: pre-aggregating
      // (doc, word) counts so the text is tokenized once instead of
      // three times won −11% at sf0.1 — but REGRESSED at sf1 and was
      // reverted. The pre-aggregation replaces this shape's probe side
      // — whose groupBy(doc) shuffle is map-side-combined down to one
      // partial row per (doc, partition) — with a (doc, word) exchange
      // of nearly every word occurrence: strictly more shuffled bytes
      // at every scale, and the shuffle, not the tokenize CPU, is what
      // grows with the corpus (guide §2.2). Three explode passes of a
      // row-local split stay cheaper than one extra wide exchange.)
      val words = t.documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val vocab = words.groupBy(col("word")).agg(count(lit(1)).as("n"))
      val tot = words.agg(count(lit(1)).as("total"))
      val p = col("n") * 1.0 / col("total")
      words.join(broadcast(vocab), "word")
        .crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          round((sum(log(p).cast("decimal(28,15)")) / count(lit(1))).cast("double"), 9).as("avg_ll"),
          round(sum(when(p < 0.001, 1).otherwise(0)) * 1.0 / count(lit(1)), 9).as("rare_frac"))
        .orderBy(col("doc_id"))
    },

    // BM25 ranked retrieval (k1 = 1.2, b = 0.75): top-10 documents for
    // a 3-term query — the search archetype (eval-set mining, nearest-
    // document lookup) the per-document scores above don't cover.
    // Scale shape (r10 rework — was 9-18x DuckDB at tiers): the query
    // terms are a FIXED short list, so term frequencies are ROW-LOCAL
    // array counters — the (doc, word) explode fan-out (docs x ~words
    // rows through a shuffle), the df join and the dl roll-up of the
    // posting-list shape all disappear. One scan of documents produces
    // a per-doc numeric table (dl + one tf per term, eagerly
    // checkpointed: O(#docs) x 5 numerics, a classic doc-stats table,
    // 1000x smaller than the text it summarizes); one 1-row aggregate
    // over it yields N/avgdl/df for every term at once, broadcast back;
    // scoring and the top-k are row-local from there. Per-term decimal
    // casts before the in-row sum keep the fold bit-identical to the
    // oracle's per-(doc,word) decimal sum (absent terms contribute an
    // exact decimal 0). Docs containing none of the terms are filtered
    // before ranking — the oracle's inner tf join has no row for them,
    // and with df > N/2 the idf goes negative, so a no-hit doc's 0.0
    // could otherwise outrank real hits.
    q("q_text_bm25",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |stats AS (SELECT count(*) AS n_docs, avg(len(words)) AS avgdl FROM d),
        |w AS (SELECT doc_id, len(words) AS dl, unnest(words) AS word FROM d),
        |tf AS (SELECT doc_id, word, max(dl) AS dl, count(*) AS tf FROM w
        |       WHERE word IN ('spark', 'query', 'join') GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |sc AS (SELECT doc_id,
        |         ln(1 + (n_docs - df + 0.5) / (df + 0.5)) *
        |           tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS s
        |       FROM tf JOIN df USING (word) CROSS JOIN stats)
        |SELECT doc_id, round(CAST(sum(CAST(s AS DECIMAL(28,15))) AS DOUBLE), 9) AS bm25
        |FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val terms = Seq("spark", "query", "join")
      // row-local counters: one split + three ArrayFilter counts. (A/B'd
      // against per-term lookaround-regex split counts — "codegen-
      // friendly" on paper but 2x SLOWER at sf3 (1.4 vs 0.73 s): three
      // extra regex passes over the text cost more than the HOF's
      // CodegenFallback. Measured, BENCH_NOTES r10.)
      val words = split(col("text"), " ")
      val perDocCols = Seq(col("doc_id"), size(words).cast("long").as("dl")) ++
        terms.map(w => size(filter(words, x => x === lit(w))).cast("long").as(s"tf_$w"))
      val perDoc = t.documents.select(perDocCols: _*).localCheckpoint(true)
      val gAggs = Seq(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")) ++
        terms.map(w => sum(when(col(s"tf_$w") > 0, 1L).otherwise(0L)).as(s"df_$w"))
      val g = perDoc.agg(gAggs.head, gAggs.tail: _*)
      def termScore(w: String): Column = {
        val tf = col(s"tf_$w"); val dfc = col(s"df_$w")
        val sc = log(lit(1) + (col("n_docs") - dfc + 0.5) / (dfc + 0.5)) *
          tf * 2.2 / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
        sc.cast("decimal(28,15)")
      }
      perDoc
        .filter(terms.map(w => col(s"tf_$w") > 0).reduce(_ || _))
        .crossJoin(broadcast(g))
        .select(col("doc_id"),
          round(terms.map(termScore).reduce(_ + _).cast("double"), 9).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(10)
    }
  )
}
