package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables
import QueryDef.q

/** Scalar function families (SURVEY §2-B.8): every family the reference
  * exposes through pass-through, exercised via codegen'd native
  * functions. Oracle SQL is written in DuckDB's dialect (its own
  * function names); the Spark side uses the native Catalyst name the
  * dialect layer would alias to — so this doubles as the alias-table
  * contract test.
  *
  * All functions here are deterministic row-local expressions: they
  * pipeline inside WholeStageCodegen with zero shuffle beyond the final
  * presentation ORDER BY, so per-row cost is identical at sf0.001 and
  * 100 TB.
  */
object FunctionQueries {

  val all: Seq[QueryDef] = Seq(

    q("q_fn_string",
      """SELECT p_partkey,
        |  lower(p_name) AS lo, upper(p_brand) AS up,
        |  substr(p_name, 3, 8) AS sub,
        |  replace(p_type, 'a', '_') AS rep,
        |  p_brand || ':' || p_type AS cat,
        |  split_part(p_type, ' ', 1) AS sp1,
        |  lpad(p_brand, 12, '.') AS lp, rpad(p_brand, 12, '.') AS rp,
        |  left(p_name, 4) AS l4, right(p_name, 4) AS r4,
        |  repeat('ab', p_size % 3) AS rpt,
        |  reverse(p_brand) AS rev,
        |  strpos(p_name, 'o') AS pos,
        |  starts_with(p_name, 'a') AS sw,
        |  contains(p_name, 'ee') AS ct,
        |  length(p_name) AS len,
        |  trim('  ' || p_brand || ' ') AS tr,
        |  ltrim('xx' || p_brand, 'x') AS ltr
        |FROM part ORDER BY p_partkey LIMIT 300""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.part.select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"), upper(col("p_brand")).as("up"),
        substring(col("p_name"), 3, 8).as("sub"),
        regexp_replace(col("p_type"), lit("a"), lit("_")).as("rep"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("cat"),
        split_part(col("p_type"), lit(" "), lit(1)).as("sp1"),
        lpad(col("p_brand"), 12, ".").as("lp"), rpad(col("p_brand"), 12, ".").as("rp"),
        substring(col("p_name"), 1, 4).as("l4"),
        expr("right(p_name, 4)").as("r4"),
        repeat(lit("ab"), (col("p_size") % 3).cast("int")).as("rpt"),
        reverse(col("p_brand")).as("rev"),
        instr(col("p_name"), "o").cast("long").as("pos"),
        col("p_name").startsWith("a").as("sw"),
        col("p_name").contains("ee").as("ct"),
        length(col("p_name")).cast("long").as("len"),
        trim(concat(lit("  "), col("p_brand"), lit(" "))).as("tr"),
        ltrim(concat(lit("xx"), col("p_brand")), "x").as("ltr"))
        .orderBy(col("p_partkey")).limit(300)
    },

    q("q_fn_regex",
      """SELECT o_orderkey,
        |  regexp_replace(o_orderpriority, '[0-9]-', '#') AS norm,
        |  regexp_extract(o_orderpriority, '([0-9])-([A-Z]+)', 2) AS word,
        |  regexp_matches(o_orderpriority, '^[12]-') AS hot
        |FROM orders
        |WHERE regexp_matches(o_orderstatus, 'O|F')
        |ORDER BY o_orderkey LIMIT 400""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.orders
        .filter(col("o_orderstatus").rlike("O|F"))
        .select(
          col("o_orderkey"),
          regexp_replace(col("o_orderpriority"), lit("[0-9]-"), lit("#")).as("norm"),
          regexp_extract(col("o_orderpriority"), "([0-9])-([A-Z]+)", 2).as("word"),
          col("o_orderpriority").rlike("^[12]-").as("hot"))
        .orderBy(col("o_orderkey")).limit(400)
    },

    q("q_fn_datetime",
      """SELECT o_orderkey,
        |  date_trunc('month', o_orderdate) AS mon,
        |  extract(year FROM o_orderdate) AS y,
        |  extract(month FROM o_orderdate) AS m,
        |  extract(day FROM o_orderdate) AS d,
        |  extract(hour FROM o_orderdate) AS h,
        |  CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS plus30,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom,
        |  CAST(o_orderdate AS DATE) AS od,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fmt,
        |  make_date(2024, CAST(extract(month FROM o_orderdate) AS INT), 1) AS firstday
        |FROM orders ORDER BY o_orderkey LIMIT 400""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.orders.select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("mon"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        hour(col("o_orderdate")).cast("long").as("h"),
        (col("o_orderdate").cast("date") + expr("INTERVAL 30 DAY")).cast("date").as("plus30"),
        last_day(col("o_orderdate").cast("date")).as("eom"),
        col("o_orderdate").cast("date").as("od"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("fmt"),
        make_date(lit(2024), month(col("o_orderdate")), lit(1)).as("firstday"))
        .orderBy(col("o_orderkey")).limit(400)
    },

    q("q_fn_math",
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  abs(l_quantity - 25) AS ab,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS ce,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS fl,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,6)), 1) AS DOUBLE) AS rnd,
        |  sqrt(l_quantity) AS sq,
        |  round(exp(l_discount), 9) AS ex,
        |  round(ln(l_quantity + 1), 9) AS lg,
        |  round(log10(l_extendedprice), 9) AS l10,
        |  pow(l_quantity, 2) AS p2,
        |  CAST(l_quantity AS BIGINT) % 7 AS md,
        |  CAST(sign(l_quantity - 25) AS BIGINT) AS sg,
        |  greatest(l_discount, l_tax) AS gr
        |FROM lineitem
        |WHERE l_orderkey <= 300
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_tax, l_extendedprice
        |LIMIT 500""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_orderkey") <= 300)
        // (l_orderkey, l_linenumber, l_quantity) is NOT unique in the
        // synthetic data — order by the full source tuple so the LIMIT
        // cut picks the same row set in both engines
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_tax"), col("l_extendedprice"))
        .limit(500)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          abs(col("l_quantity") - 25).as("ab"),
          // ceil/floor are rebound to DuckDB typing (DOUBLE in →
          // DOUBLE out) and functions.ceil resolves via the registry —
          // cast explicitly, mirroring the oracle's CAST AS BIGINT
          ceil(col("l_discount") * 100).cast("bigint").as("ce"),
          floor(col("l_tax") * 100).cast("bigint").as("fl"),
          round(col("l_extendedprice").cast(DecimalType(18, 6)), 1).cast("double").as("rnd"),
          sqrt(col("l_quantity")).as("sq"),
          round(exp(col("l_discount")), 9).as("ex"),
          round(log(col("l_quantity") + 1), 9).as("lg"),
          round(log10(col("l_extendedprice")), 9).as("l10"),
          pow(col("l_quantity"), 2).as("p2"),
          (col("l_quantity").cast("bigint") % 7).as("md"),
          signum(col("l_quantity") - 25).cast("bigint").as("sg"),
          greatest(col("l_discount"), col("l_tax")).as("gr"))
    },

    q("q_fn_list",
      """SELECT doc_id,
        |  len(words) AS n_words,
        |  words[1] AS w1,
        |  words[len(words)] AS wlast,
        |  list_contains(words, 'spark') AS has_spark,
        |  list_position(words, 'join') AS join_at,
        |  list_sort(list_distinct(words))[1] AS first_uniq,
        |  len(list_distinct(words)) AS n_uniq,
        |  list_transform(words, w -> upper(w))[2] AS w2up,
        |  len(list_filter(words, w -> length(w) > 4)) AS n_long,
        |  array_to_string(list_slice(words, 1, 3), '-') AS first3
        |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        |ORDER BY doc_id LIMIT 400""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val withWords = t.documents.select(col("doc_id"), split(col("text"), " ").as("words"))
      withWords.select(
        col("doc_id"),
        size(col("words")).cast("long").as("n_words"),
        element_at(col("words"), 1).as("w1"),
        element_at(col("words"), size(col("words"))).as("wlast"),
        array_contains(col("words"), "spark").as("has_spark"),
        array_position(col("words"), "join").as("join_at"),
        element_at(sort_array(array_distinct(col("words"))), 1).as("first_uniq"),
        size(array_distinct(col("words"))).cast("long").as("n_uniq"),
        upper(element_at(col("words"), 2)).as("w2up"),
        size(filter(col("words"), w => length(w) > 4)).cast("long").as("n_long"),
        array_join(slice(col("words"), 1, 3), "-").as("first3"))
        .orderBy(col("doc_id")).limit(400)
    },

    q("q_fn_struct",
      """SELECT n_nationkey,
        |  struct_pack(k := n_nationkey, nm := n_name).nm AS snm,
        |  {'a': n_nationkey, 'b': n_regionkey}.b AS sb,
        |  map_keys(MAP {n_name: n_regionkey})[1] AS mk,
        |  map_values(MAP {n_name: n_regionkey})[1] AS mv
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.nation.select(
        col("n_nationkey"),
        struct(col("n_nationkey").as("k"), col("n_name").as("nm"))
          .getField("nm").as("snm"),
        struct(col("n_nationkey").as("a"), col("n_regionkey").as("b"))
          .getField("b").as("sb"),
        element_at(map_keys(map(col("n_name"), col("n_regionkey"))), 1).as("mk"),
        element_at(map_values(map(col("n_name"), col("n_regionkey"))), 1).as("mv"))
        .orderBy(col("n_nationkey"))
    },

    q("q_fn_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |  json_extract_string(props, '$.missing') AS miss
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 = 0
        |ORDER BY event_id LIMIT 500""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.events
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k_int"),
          get_json_object(col("props"), "$.missing").as("miss"))
        .filter(col("k_int") % 5 === 0)
        .orderBy(col("event_id")).limit(500)
    },

    q("q_fn_hash",
      """SELECT doc_id,
        |  md5(text) AS h_md5,
        |  sha256(source) AS h_sha,
        |  md5(text || lang) AS h_cat
        |FROM documents ORDER BY doc_id LIMIT 300""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.documents.select(
        col("doc_id"),
        md5(col("text")).as("h_md5"),
        sha2(col("source"), 256).as("h_sha"),
        md5(concat(col("text"), col("lang"))).as("h_cat"))
        .orderBy(col("doc_id")).limit(300)
    },

    q("q_fn_cast",
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS dec2,
        |  CAST(o_orderkey AS VARCHAR) AS s,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS ds,
        |  TRY_CAST(o_orderpriority AS BIGINT) AS bad,
        |  TRY_CAST(split_part(o_orderpriority, '-', 1) AS BIGINT) AS prio,
        |  CAST(o_totalprice > 100000 AS INT) AS big
        |FROM orders ORDER BY o_orderkey LIMIT 400""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.orders.select(
        col("o_orderkey"),
        col("o_totalprice").cast(DecimalType(18, 2)).cast("double").as("dec2"),
        col("o_orderkey").cast("string").as("s"),
        col("o_orderdate").cast("date").cast("string").as("ds"),
        // TRY_CAST semantics without exception-per-row: a failing cast
        // in Spark throws (even in TRY mode internally) and 150k thrown
        // exceptions dominate the query — guard with the integer regex
        // instead (identical results, pure codegen)
        tryCastLong(col("o_orderpriority")).as("bad"),
        tryCastLong(split_part(col("o_orderpriority"), lit("-"), lit(1))).as("prio"),
        (col("o_totalprice") > 100000).cast("int").as("big"))
        .orderBy(col("o_orderkey")).limit(400)
    }
  )

  val trig: Seq[QueryDef] = Seq(
    q("q_fn_map",
      """SELECT n_nationkey,
        |  m[n_name][1] AS own_region,
        |  cardinality(m) AS n_entries,
        |  list_sort(map_keys(m))[1] AS first_key,
        |  list_sort(map_values(m))[1] AS min_val,
        |  map_from_entries([{'k': n_name, 'v': n_regionkey}])[n_name][1] AS me
        |FROM (SELECT n_nationkey, n_name, n_regionkey,
        |        MAP {n_name: n_regionkey, 'x': -1} AS m
        |      FROM nation)
        |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // DuckDB m[k] yields a LIST (hence [1] above); the registry-level
      // element_at now mirrors that, so map access here uses getItem
      // (GetMapValue — scalar, resolved without the function registry)
      val m = map(col("n_name"), col("n_regionkey"), lit("x"), lit(-1))
      t.nation.select(
        col("n_nationkey"),
        m.getItem(col("n_name")).as("own_region"),
        size(m).cast("long").as("n_entries"),
        element_at(sort_array(map_keys(m)), 1).as("first_key"),
        element_at(sort_array(map_values(m)), 1).as("min_val"),
        map_from_entries(array(struct(col("n_name").as("k"), col("n_regionkey").as("v"))))
          .getItem(col("n_name")).as("me"))
        .orderBy(col("n_nationkey"))
    },

    q("q_fn_trig",
      """SELECT p_partkey,
        |  round(sin(radians(p_size)), 9) AS sn,
        |  round(cos(radians(p_size)), 9) AS cs,
        |  round(tan(radians(p_size % 60)), 9) AS tn,
        |  round(atan2(p_size, 10), 9) AS at2,
        |  round(degrees(asin((p_size % 10) / 10.0)), 9) AS asn,
        |  round(pi(), 9) AS p,
        |  round(cbrt(p_size), 9) AS cb
        |FROM part ORDER BY p_partkey LIMIT 300""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.part.select(
        col("p_partkey"),
        round(sin(radians(col("p_size"))), 9).as("sn"),
        round(cos(radians(col("p_size"))), 9).as("cs"),
        round(tan(radians(col("p_size") % 60)), 9).as("tn"),
        round(atan2(col("p_size"), lit(10)), 9).as("at2"),
        round(degrees(asin((col("p_size") % 10) / 10.0)), 9).as("asn"),
        round(lit(math.Pi), 9).as("p"),
        round(cbrt(col("p_size")), 9).as("cb"))
        .orderBy(col("p_partkey")).limit(300)
    },

    q("q_fn_strftime_alias",
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y/%m/%d') AS ymd,
        |  strftime(o_orderdate, '%d-%b-%Y %H:%M') AS pretty,
        |  CAST(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS roundtrip
        |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      // deliberately via spark.sql: exercises the GraftFunctions alias
      // registry (strftime/strptime %-code translation) end to end in
      // the oracle corpus, not just in unit tests
      graft.functions.GraftFunctions.registerAll(s)
      s.sql(
        """SELECT o_orderkey,
          |  strftime(o_orderdate, '%Y/%m/%d') AS ymd,
          |  strftime(o_orderdate, '%d-%b-%Y %H:%M') AS pretty,
          |  CAST(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS TIMESTAMP_NTZ) AS roundtrip
          |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin)
    },

    q("q_fn_interval",
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus3m,
        |  CAST(o_orderdate AS DATE) - INTERVAL 2 WEEK AS minus2w,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS ep,
        |  date_part('quarter', o_orderdate) AS qtr,
        |  date_part('dow', o_orderdate) AS dow,
        |  date_part('week', o_orderdate) AS wk
        |FROM orders ORDER BY o_orderkey LIMIT 400""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.orders.select(
        col("o_orderkey"),
        (col("o_orderdate").cast("date") + expr("INTERVAL 3 MONTH")).cast("date").as("plus3m"),
        (col("o_orderdate").cast("date") - expr("INTERVAL 2 WEEK")).cast("date").as("minus2w"),
        datediff(lit(java.sql.Date.valueOf("1998-01-01")), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_98"),
        unix_timestamp(col("o_orderdate").cast("timestamp")).as("ep"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        // PG/DuckDB dow (Sun=0): the session registry's dayofweek
        // override already shifts Spark's Sun=1 origin (Spark 4's
        // functions.dayofweek resolves through the registry)
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        weekofyear(col("o_orderdate")).cast("long").as("wk"))
        .orderBy(col("o_orderkey")).limit(400)
    },

    // ------------------------------------------------- round-4 probed batch
    // Both engines run the IDENTICAL statement: every function below is
    // DuckDB-native and registered here (GraftFunctions probed batch),
    // so the oracle is a direct textual echo. FP-sensitive outputs
    // (jaccard, fmod, lgamma) round below engine-implementation noise.
    q("q_fn_probe_scalars",
      """SELECT p_partkey,
        |  hamming(p_name, reverse(p_name)) AS ham,
        |  round(jaccard(p_name, p_brand), 9) AS jac,
        |  format_bytes(CAST(floor(p_retailprice) AS BIGINT)) AS fb,
        |  to_base(p_size, 2) AS tb,
        |  gcd(p_partkey, CAST(p_size AS BIGINT)) AS g,
        |  lcm(CAST(p_size AS BIGINT), 6) AS l,
        |  even(p_retailprice / 100) AS ev,
        |  fdiv(p_retailprice, 7.0) AS fd,
        |  round(fmod(p_retailprice, 7.0), 6) AS fm,
        |  isfinite(p_retailprice) AS fin,
        |  round(lgamma(1 + p_size / 10.0), 6) AS lg
        |FROM part WHERE p_partkey <= 400
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      s.sql(
        """SELECT p_partkey,
          |  hamming(p_name, reverse(p_name)) AS ham,
          |  round(jaccard(p_name, p_brand), 9) AS jac,
          |  format_bytes(CAST(floor(p_retailprice) AS BIGINT)) AS fb,
          |  to_base(p_size, 2) AS tb,
          |  gcd(p_partkey, CAST(p_size AS BIGINT)) AS g,
          |  lcm(CAST(p_size AS BIGINT), 6) AS l,
          |  even(p_retailprice / 100) AS ev,
          |  fdiv(p_retailprice, 7.0) AS fd,
          |  round(fmod(p_retailprice, 7.0), 6) AS fm,
          |  isfinite(p_retailprice) AS fin,
          |  round(lgamma(1 + p_size / 10.0), 6) AS lg
          |FROM part WHERE p_partkey <= 400
          |ORDER BY p_partkey""".stripMargin)
    },

    q("q_agg_probe",
      """SELECT l_returnflag,
        |  round(entropy(l_linestatus), 9) AS ent,
        |  quantile_disc(l_quantity, 0.5) AS qd,
        |  to_json(histogram(l_linestatus)) AS hist
        |FROM lineitem WHERE l_orderkey <= 2000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables(s, dir)
      s.sql(
        """SELECT l_returnflag,
          |  round(entropy(l_linestatus), 9) AS ent,
          |  quantile_disc(l_quantity, 0.5) AS qd,
          |  to_json(histogram(l_linestatus)) AS hist
          |FROM lineitem WHERE l_orderkey <= 2000
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    q("q_evt_time_bucket",
      """SELECT time_bucket(INTERVAL '6 hours', ts) AS bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1 ORDER BY bucket LIMIT 500""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.events
        .groupBy(expr("time_bucket(INTERVAL '6 hours', ts)").as("bucket"))
        .agg(count(lit(1)).as("n"),
          (graft.functions.FixedPointSum.sumFix(graft.functions.DoubleToScaledLong.cents(col("value"))) / 100).cast("double").as("total"))
        .orderBy(col("bucket")).limit(500)
    }
  )

  private def tryCastLong(c: Column): Column =
    when(c.rlike("^\\s*[+-]?\\d{1,18}\\s*$"), c.cast("bigint"))
}
