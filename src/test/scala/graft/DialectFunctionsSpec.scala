package graft

import graft.server.Engine

/** DuckDB dialect coverage through the server rewrite + function
  * registry: list literals, named struct args, dynamic list
  * aggregation, unit-string datetime functions, fmt-style format. */
class DialectFunctionsSpec extends SparkSpecBase {

  private lazy val engine = new Engine(spark)

  private def one(sql: String): Any =
    spark.sql(engine.rewrite(sql)).head().get(0)

  test("bracket list literals (incl. nested and string-valued) rewrite outside strings") {
    assert(one("select [1,2,3]") == Seq(1, 2, 3))
    assert(one("select [[1],[2]]") == Seq(Seq(1), Seq(2)))
    assert(one("select ['a','b']") == Seq("a", "b"))
    assert(one("select ['a[x]', 'b']") == Seq("a[x]", "b")) // brackets inside strings survive
    assert(one("select 'a [not] literal'") == "a [not] literal")
    // subscripts are DUCKDB 1-based (round 5): 0 and OOB → NULL,
    // negative from the end; slices are 1-based inclusive
    assert(one("select ([10,20])[1]") == 10)
    assert(one("select [10,20,30][2]") == 20)
    assert(one("select [10,20][0]") == null)
    assert(one("select [10,20][-1]") == 20)
    assert(one("select [10,20][5]") == null)
    assert(one("select [[1,2],[3]][1][2]") == 2) // chained subscripts
    assert(one("select [1,2,3,4][2:3]") == Seq(2, 3))
    assert(one("select [1,2,3][2:]") == Seq(2, 3))
    assert(one("select [1,2,3][:2]") == Seq(1, 2))
    assert(one("select [1,2,3][2:99]") == Seq(2, 3)) // hi clamps
    // 1-based string indexing and slicing (DuckDB)
    assert(one("select 'abcd'[2]") == "b")
    assert(one("select 'abcd'[0]") == "")
    assert(one("select 'abcd'[-1]") == "d")
    assert(one("select 'abcd'[2:3]") == "bc")
    // map subscript → LIST of matches; struct subscript → field
    assert(one("select map([1,2],['a','b'])[1]") == Seq("a"))
    assert(one("select map([1,2],['a','b'])[9]") == Seq())
    assert(one("select {'a': 1}['a']") == 1)
    // list comprehensions
    assert(one("select [x * 2 for x in [1,2,3]]") == Seq(2, 4, 6))
    assert(one("select [x for x in [1,2,3,4] if x % 2 = 0]") == Seq(2, 4))
  }

  test("type-name aliases: hugeint/unsigned/float4/time/blob/json") {
    assert(one("select 1::hugeint").toString == "1")
    assert(one("select 250::utinyint") == 250.toShort)
    assert(one("select 1.5::float8") == 1.5)
    assert(one("select 1.5::float4") == 1.5f)
    assert(one("select '10:30:00'::time") == "10:30:00")
    assert(one("select 123::varchar") == "123")
    assert(new String(one("select 'ab'::blob").asInstanceOf[Array[Byte]]) == "ab")
    assert(one("select '{\"a\": 1}'::json") == "{\"a\": 1}")
    // parameterized VARCHAR(n) is untouched by the alias rewrite (NB
    // Spark's cast treats varchar as string — no truncation)
    assert(engine.rewrite("select cast('abcd' as varchar(2))").contains("varchar(2)"))
  }

  test("JSON function family and -> / ->> operators") {
    assert(one("select json_valid('{\"a\": 1}')") == true)
    assert(one("select json_valid('{\"a\"')") == false)
    assert(one("select json_keys('{\"a\":1,\"b\":2}')") == Seq("a", "b"))
    assert(one("select json_object('a', 1, 'b', 'x')") == """{"a":1,"b":"x"}""")
    assert(one("select json_array(1, 2, 3)") == "[1,2,3]")
    assert(one("select json_quote('x')") == "\"x\"")
    assert(one("select json_quote(42)") == "42")
    assert(one("select json_type('{\"a\": 1}')") == "OBJECT")
    assert(one("select json_type('[1]')") == "ARRAY")
    assert(one("select json_type('\"s\"')") == "VARCHAR")
    assert(one("select json_type('1.5')") == "DOUBLE")
    assert(one("select json_type('7')") == "BIGINT")
    assert(one("select json_merge_patch('{\"a\":1,\"c\":3}', '{\"b\":2,\"c\":null}')")
      == """{"a":1,"b":2}""")
    assert(one("select json_extract('{\"a\": {\"b\": 2}}', 'a')") == """{"b":2}""")
    assert(one("select '{\"a\": 1}'::json ->> 'a'") == "1")
    assert(one("select '{\"a\": {\"b\": 2}}'::json -> 'a' ->> 'b'") == "2")
    assert(one("select json_group_array(id) from range(1, 3)") == "[1,2]")
    assert(one("select json_group_object(k, v) from (select 'a' as k, 1 as v)")
      == """{"a":1}""")
    // lambda arrows are NOT json arrows
    assert(one("select transform(array(1,2), x -> x + 1)") == Seq(2, 3))
    // DuckDB JSON-form schemas for from_json / json_transform
    assert(one("select from_json('[1,2,3]', '[\"BIGINT\"]')") == Seq(1L, 2L, 3L))
    assert(one("select json_transform('{\"a\":1}', '{\"a\":\"VARCHAR\"}')").toString == "[1]")
    // Spark DDL schema form still works
    assert(one("select from_json('{\"a\":1}', 'a INT').a") == 1)
    assert(one("select json_contains('{\"a\":1}', '1')") == true)
    assert(one("select json_contains('{\"a\":1}', '2')") == false)
    assert(one("select json_contains('[1,[2,3]]', '[2,3]')") == true)
  }

  test("DuckDB operators: ** ^ power, @() abs, && overlap, @>/<@ containment") {
    assert(one("select 2 ** 10") == 1024.0)
    assert(one("select 3 ^ 2") == 9.0) // DuckDB ^ is POWER, not xor
    assert(one("select 2 ** 3 ** 2") == 64.0) // left-assoc like PG ^
    assert(one("select 1 + 2 ** 3") == 9.0)
    assert(one("select @(-7)") == 7)
    assert(one("select [1,2] && [2,3]") == true)
    assert(one("select [1,2] && [3,4]") == false)
    assert(one("select [1,2,3,4] @> [2,3]") == true)
    assert(one("select [1,2,3] <@ [1,2,3,4]") == true)
    assert(one("select [1,5] <@ [1,2,3]") == false)
    assert(one("select list_has_all([1,2,3], [2,3])") == true)
    assert(one("select list_has_any([1,2], [2,9])") == true)
    assert(one("select make_time(10, 30, 0.0)") == "10:30:00")
    // date_part list form → struct of parts
    assert(one("select date_part(['year','month'], date '2024-03-15')").toString == "[2024,3]")
    // a ** never matches lone stars
    assert(one("select count(*) from (select 1)") == 1L)
  }

  test("duck-style wire rendering: intervals, structs, maps") {
    import graft.server.pg.PgTypes
    assert(PgTypes.render(java.time.Duration.ofHours(26)).get == "1 day 02:00:00")
    assert(PgTypes.render(java.time.Duration.ofSeconds(90)).get == "00:01:30")
    assert(PgTypes.render(java.time.Period.of(1, 2, 0)).get == "1 year 2 months")
    assert(PgTypes.render(java.time.Duration.ZERO).get == "00:00:00")
    assert(PgTypes.render(
      new org.apache.spark.unsafe.types.CalendarInterval(25, 24, 0L)).get
      == "2 years 1 month 24 days")
    val row = spark.sql("select named_struct('a', 1, 'b', 'x') s").head().getStruct(0)
    assert(PgTypes.render(row).get == "{'a': 1, 'b': 'x'}")
    val m = spark.sql("select map(1, 'a', 2, 'b') m").head().getMap[Int, String](0)
    assert(PgTypes.render(m).get == "{1=a, 2=b}")
  }

  test("generate_series TVF, dayofweek origin, date_trunc date-typed") {
    assert(one("select count(*) from generate_series(1, 3)") == 3L)
    assert(one("select sum(generate_series) from generate_series(1, 3)") == 6L)
    assert(one("select sum(generate_series) from generate_series(0, 9, 3)") == 18L)
    assert(one("select dayofweek(date '2024-03-15')") == 5) // Friday, Sunday=0
    assert(one("select date_trunc('month', date '2024-03-15')")
      == java.sql.Date.valueOf("2024-03-01"))
    assert(one("select struct_insert({'a': 1}, b := 2)").toString == "[1,2]")
  }

  test("struct_pack named args and list_aggregate dispatch") {
    assert(one("select struct_pack(a:=1).a") == 1)
    // integral lists sum to an INTEGRAL value (DuckDB: 6, not 6.0) —
    // the accumulator dispatches on the element type, so bigint lists
    // are exact above 2^53
    assert(one("select list_aggregate([1,2,3], 'sum')") == 6L)
    assert(one("select list_sum([9007199254740993, 1])") == 9007199254740994L)
    // decimal literals sum as DECIMAL(38,s) — exact, not a double
    assert(one("select list_aggregate([1.5,2.0], 'sum')") == new java.math.BigDecimal("3.5"))
    assert(one("select list_sum(array(cast(1.5 as double), cast(2.0 as double)))") == 3.5)
    assert(one("select list_aggregate([1,2,3], 'max')") == 3)
    assert(one("select list_aggregate([1.0,2.0,3.0,4.0], 'avg')") == 2.5)
    assert(one("select list_aggregate([1,2], 'avg')") == 1.5)
    intercept[Exception](one("select list_aggregate([1], 'nope')"))
    // string_agg takes an optional separator (default ',')
    assert(one("select list_aggregate(['a','b','c'], 'string_agg')") == "a,b,c")
    assert(one("select list_aggregate(['a','b','c'], 'string_agg', ' - ')") == "a - b - c")
    // := substitution is SCOPED to struct_pack — other functions'
    // named args pass through untouched
    assert(engine.rewrite("select foo(recursive := true)").contains("recursive := true"))
    // aggregate null semantics: nulls ignored; empty → NULL, not 0 /
    // divide-by-zero (ANSI mode is on)
    assert(one("select list_aggregate([1, NULL, 3], 'sum')") == 4L)
    assert(one("select list_aggregate(cast(array() as array<int>), 'sum')") == null)
    assert(one("select list_aggregate(cast(array() as array<int>), 'avg')") == null)
  }

  test("date_diff unit-string and format fmt-string rewrites") {
    assert(one("select date_diff('day', date '2024-01-01', date '2024-01-11')") == 10L)
    assert(one("select datediff('month', date '2024-01-15', date '2024-04-16')") == 3L)
    // DuckDB counts boundary crossings, not complete periods
    assert(one("select date_diff('month', date '2024-01-31', date '2024-02-01')") == 1L)
    assert(one("select date_diff('days', date '2024-01-01', date '2024-01-03')") == 2L)
    assert(one("select format('{} x {}', 1, 'two')") == "1 x two")
    // positional/spec templates are left unrewritten (error > silent garbage)
    assert(engine.rewrite("select format('{0}', x)").contains("format('{0}'"))
    assert(one("select list_slice([1,2,3,4], 2, 3)") == Seq(2, 3))
    assert(one("select date_add(date '2024-01-01', interval 3 day)").toString == "2024-01-04")
    assert(one("select date_add(date '2024-01-01', 3)").toString == "2024-01-04")
  }

  test("dollar quoting, integer division, ord/to_hex") {
    assert(one("select $$it's quoted$$") == "it's quoted")
    assert(one("select 5 // 2") == 2)
    assert(one("select 'a // b'") == "a // b")
    assert(one("select ord('A')") == 65)
    assert(one("select to_hex(255)") == "FF")
  }

  test("dollar quoting is string-aware and supports tags") {
    // $$ inside an ordinary '…' literal is content, not an opener
    assert(one("select '$$a$$'") == "$$a$$")
    // two literals each containing $$ must not swallow the SQL between
    assert(one("select concat('$$', ' mid ', '$$')") == "$$ mid $$")
    // tagged form, with a bare $$ inside the body
    assert(one("select $tag$it's $$ inside$tag$") == "it's $$ inside")
    // bind-placeholder shapes pass through (tag cannot start with a digit)
    assert(Engine.rewriteDollarQuotes("select $1 + $2") == "select $1 + $2")
    // unterminated opener passes through unchanged
    assert(Engine.rewriteDollarQuotes("select $$oops") == "select $$oops")
  }

  test("range is stop-exclusive, empty on wrong direction, 1-arg defaults start 0") {
    assert(one("select range(1, 4)") == Seq(1, 2, 3))
    assert(one("select range(5)") == Seq(0, 1, 2, 3, 4))
    assert(one("select range(1, 1)") == Seq())
    assert(one("select range(5, 1)") == Seq())
    assert(one("select range(5, 1, -1)") == Seq(5, 4, 3, 2))
    assert(one("select range(0, 10, 3)") == Seq(0, 3, 6, 9))
  }

  test("probed DuckDB scalar batch: strings") {
    assert(one("select hamming('abc','abd')") == 1L)
    assert(one("select hamming('ab','abc')") == null) // DuckDB errors; NULL here
    assert(one("select jaccard('abc','abd')") == 0.5)
    assert(one("select jaccard('aa','ab')") == 0.5) // character SETS
    assert(one("select strip_accents('\u00e1\u00e9\u00ee caf\u00e9')") == "aei cafe")
    assert(one("select format_bytes(1024)") == "1.0 KiB")
    assert(one("select format_bytes(2040)") == "1.9 KiB") // truncated, not rounded
    assert(one("select format_bytes(1)") == "1 byte")
    assert(one("select format_bytes(999)") == "999 bytes")
    assert(one("select format_bytes(1099511627776)") == "1.0 TiB")
    assert(one("select to_base(255, 16)") == "FF")
    assert(one("select to_base(7, 2)") == "111")
    assert(one("select regexp_full_match('abc', 'a.c')") == true)
    assert(one("select regexp_full_match('abcd', 'a.c')") == false)
    assert(one("select regexp_extract_all('a1b22', '[0-9]+')") == Seq("1", "22"))
  }

  test("probed DuckDB scalar batch: math") {
    assert(one("select even(2.5)") == 4.0)
    assert(one("select even(-2.5)") == -4.0)
    assert(one("select even(2.0)") == 2.0)
    assert(one("select fdiv(7, 2)") == 3.0)
    assert(one("select fdiv(-7, 2)") == -4.0)
    assert(one("select fmod(7.5, 2)") == 1.5)
    assert(one("select fmod(-7, 2)") == 1.0) // floored, like DuckDB
    assert(one("select gcd(12, 18)") == 6L)
    assert(one("select gcd(-12, 18)") == 6L)
    assert(one("select gcd(0, 5)") == 5L)
    assert(one("select lcm(4, 6)") == 12L)
    assert(math.abs(one("select gamma(5.5)").asInstanceOf[Double] - 52.34277778455352) < 1e-10)
    assert(math.abs(one("select lgamma(5.5)").asInstanceOf[Double] - 3.9578139676187165) < 1e-12)
    assert(one("select isinf(cast('inf' as double))") == true)
    assert(one("select isinf(1.0)") == false)
    assert(one("select isfinite(1.0)") == true)
    assert(one("select isfinite(cast('nan' as double))") == false)
  }

  test("probed DuckDB scalar batch: lists, structs, maps") {
    assert(one("select len([1,2,3])") == 3L)
    assert(one("select len('abc')") == 3L) // BIGINT like DuckDB, both branches
    assert(one("select list_has_all([1,2,3],[2,3])") == true)
    assert(one("select list_has_all([1,2],[3])") == false)
    assert(one("select list_has_any([1,2],[2,9])") == true)
    assert(one("select list_has_any([1,2],[9])") == false)
    assert(one("select list_append([1,2], 3)") == Seq(1, 2, 3))
    assert(one("select list_prepend(0, [1,2])") == Seq(0, 1, 2))
    // zip pads the shorter side with NULLs (DuckDB list_zip semantics)
    val z = one("select to_json(list_zip([1,2,3],[4]))")
    assert(z == """[{"list_1":1,"list_2":4},{"list_1":2},{"list_1":3}]""", z.toString)
    assert(one("select struct_extract(struct_pack(a:=7), 'a')") == 7)
    // DuckDB map(keys_list, values_list) builds from arrays; Spark's
    // variadic map(k, v) still works
    // DuckDB element_at on a MAP returns the matching values as a LIST
    assert(one("select element_at(map(['a','b'],[1,2]), 'b')") == Seq(2))
    assert(one("select element_at(map('a', 1), 'a')") == Seq(1))
    assert(one("select cardinality(map(['a'],[1]))") == 1)
  }

  test("probed DuckDB scalar batch: datetime") {
    assert(one("select cast(time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-03-05 10:37:11') as string)") == "2024-03-05 10:30:00")
    assert(one("select cast(time_bucket(INTERVAL '1 day', TIMESTAMP '2024-03-05 10:37:11') as string)") == "2024-03-05 00:00:00")
    // week buckets anchor at Monday 2000-01-03; DATE stays DATE
    assert(one("select cast(time_bucket(INTERVAL '1 week', DATE '2024-03-05') as string)") == "2024-03-04")
    // week widths on TIMESTAMP inputs anchor Monday too (not 2000-01-01, a Saturday)
    assert(one("select cast(time_bucket(INTERVAL '1 week', TIMESTAMP '2024-03-05 10:00:00') as string)") == "2024-03-04 00:00:00")
    assert(one("select cast(age(TIMESTAMP '2024-03-05 10:30:00', TIMESTAMP '2020-01-31 04:00:00') as string)") == "4 years 1 months 5 days 6 hours 30 minutes")
  }

  test("struct literals {'k': v} rewrite to named_struct, string-aware") {
    assert(one("select {'k':'a','v':1}.k") == "a")
    assert(one("select struct_extract({'a': 7}, 'a')") == 7)
    // nested, and list values (brackets rewrite first)
    assert(one("select {'outer': {'inner': 2}}.outer.inner") == 2)
    assert(one("select {'xs': [1,2]}.xs") == Seq(1, 2))
    // braces inside string literals pass through
    assert(one("select '{not: struct}'") == "{not: struct}")
    // non-struct brace spans (no 'key': shape) pass through
    assert(Engine.rewriteStructLiterals("select '{}' ") == "select '{}' ")
    assert(Engine.rewriteStructLiterals("a { b }") == "a { b }")
    // map_from_entries over struct-literal entries (the probed gap)
    assert(one("select element_at(map_from_entries([{'k':'a','v':1}]), 'a')") == Seq(1))
  }

  test("probed DuckDB aggregate batch") {
    def q(sql: String) = spark.sql(engine.rewrite(sql)).head().get(0)
    // quantile_disc picks the sorted element at floor(p*(n-1))+1
    assert(q("select quantile_disc(x, 0.5) from values (1),(2),(3),(4) t(x)") == 2)
    assert(q("select quantile_disc(x, 0.75) from values (10),(20),(30),(40) t(x)") == 30)
    assert(q("select quantile(x, 1.0) from values (10),(20),(30),(40) t(x)") == 40)
    assert(q("select quantile_cont(x, 0.5) from values (1),(2),(3),(4) t(x)") == 2.5)
    assert(q("select entropy(x) from values (1),(1),(2),(3) t(x)") == 1.5)
    val h = q("select to_json(histogram(x)) from values (2),(1),(1) t(x)")
    assert(h == """{"1":2,"2":1}""", h.toString)
    assert(q("select list(x) from values (1),(2) t(x)").asInstanceOf[collection.Seq[_]].toSet == Set(1, 2))
    assert(q("select countif(x > 1) from values (1),(2),(3) t(x)") == 2L)
    assert(q("select arg_max(s, x) from values ('a',1),('b',9) t(s,x)") == "b")
    assert(q("select fsum(x) from values (cast(1.5 as double)),(cast(2.5 as double)) t(x)") == 4.0)
    // ordered aggregates: first/last/list(expr ORDER BY key [DESC])
    assert(q("select first(x order by y desc) from values (1,10),(2,20),(3,5) t(x,y)") == 2)
    assert(q("select last(x order by y) from values (1,10),(2,20),(3,5) t(x,y)") == 2)
    assert(q("select list(x order by y) from values (1,10),(2,20),(3,5) t(x,y)") == Seq(3, 1, 2))
    assert(q("select array_agg(x order by x desc) from values (1),(3),(2) t(x)") == Seq(3, 2, 1))
    // multi-key ordered aggregates: uniform direction supported
    assert(q("select list(x order by a, b) from values (1,2,9),(1,1,8),(0,5,7) t(a,b,x)") == Seq(7, 8, 9))
    assert(q("select list(x order by a desc, b desc) from values (1,2,9),(1,1,8),(0,5,7) t(a,b,x)") == Seq(9, 8, 7))
    // mixed directions pass through unrewritten (surface as parse error)
    intercept[Exception](q("select list(x order by a, b desc) from values (1,2,9) t(a,b,x)"))
  }

  test("probed batch 2: string metrics and helpers (outputs pinned to DuckDB 1.0)") {
    assert(one("select damerau_levenshtein('ca','abc')") == 2L) // full DL, not OSA
    assert(one("select damerau_levenshtein('kitten','sitting')") == 3L)
    assert(one("select jaro_similarity('martha','marhta')") == 0.9444444444444445)
    assert(one("select jaro_winkler_similarity('martha','marhta')") == 0.9611111111111111)
    assert(one("select jaro_winkler_similarity('dwayne','duane')") == 0.8400000000000001)
    assert(one("select jaro_similarity('', 'a')") == 0.0)
    assert(one("select unicode('€')") == 8364)
    assert(one("select unicode('')") == -1)
    assert(one("select regexp_escape('a.b*c')") == "a\\.b\\*c")
    assert(one("select nfc_normalize('é')") == "é")
    assert(one("select editdist3('kitten','sitting')") == 3)
    assert(one("select mismatches('abcd','abce')") == 1L)
    assert(one("select parse_path('/a/b/c.txt')") == Seq("/", "a", "b", "c.txt"))
    assert(one("select parse_dirname('/a/b/c.txt')") == "/")
    assert(one("select parse_dirname('rel/x.y')") == "rel")
    assert(one("select parse_dirpath('/a/b/c.txt')") == "/a/b")
    assert(one("select parse_filename('/a/b/c.txt')") == "c.txt")
    assert(one("select parse_filename('/a/b/c.txt', true)") == "c")
    assert(one("select like_escape('a%c', 'a$%c', '$')") == true)
    assert(one("select like_escape('abc', 'a$%c', '$')") == false)
    assert(one("select ilike_escape('A%C', 'a$%c', '$')") == true)
    assert(one("select not_like_escape('abc', 'a$%c', '$')") == true)
    assert(one("select from_hex('ff')").asInstanceOf[Array[Byte]].toSeq == Seq(-1.toByte))
    assert(one("select cast(from_base64('YWI=') as string)") == "ab")
  }

  test("probed batch 2: numeric and date semantics") {
    assert(one("select log(100)") == 2.0) // DuckDB single-arg log is log10
    assert(one("select log(2, 8)") == 3.0)
    // DECIMAL input keeps the decimal family: trunc(DECIMAL(p,s)) is
    // DECIMAL(p,0) like DuckDB (was BIGINT — wire OID divergence)
    assert(one("select trunc(-1.9)") == new java.math.BigDecimal(-1))
    assert(one("select typeof(trunc(-1.9))") == "DECIMAL(2,0)")
    assert(one("select typeof(ceil(80.79))") == "DECIMAL(4,0)")
    assert(one("select typeof(round(80.79))") == "DECIMAL(4,0)")
    // DOUBLE input keeps DOUBLE type (DuckDB); huge/NaN doubles pass through
    assert(one("select trunc(cast(1.9 as double))") == 1.0)
    assert(one("select trunc(cast(-2.7 as double))") == -2.0)
    assert(one("select trunc(cast(1e30 as double))") == 1e30)
    assert(one("select isnan(trunc(cast('NaN' as double)))") == true)
    assert(one("select trunc(cast(7 as bigint))") == 7L)
    assert(one("select xor(5, 3)") == 6)
    assert(one("select nextafter(1.0, 2.0)") == 1.0000000000000002)
    assert(one("select regexp_extract('abc123', '[0-9]+')") == "123")
    assert(one("select isodow(date '2024-03-15')") == 5)
    assert(one("select isodow(date '2024-03-17')") == 7)
    assert(one("select isoyear(date '2021-01-01')") == 2020)
    assert(one("select century(date '2024-03-15')") == 21L)
    assert(one("select century(date '1999-12-31')") == 20L)
    assert(one("select millennium(date '2024-01-01')") == 3L)
    assert(one("select era(date '2024-01-01')") == 1L)
    assert(one("select epoch_us(timestamp '2024-03-15 00:00:01.5')") == 1710460801500000L)
    assert(one("select epoch_ns(timestamp '2024-03-15 00:00:01.5')") == 1710460801500000000L)
    assert(one("select monthname(date '2024-03-15')") == "March")
    assert(one("select dayname(date '2024-03-15')") == "Friday")
    // date_sub counts COMPLETE elapsed units (date_diff counts crossings)
    assert(one("select date_sub('month', date '2024-01-31', date '2024-03-01')") == 1L)
    assert(one("select datesub('day', date '2024-01-01', date '2024-01-31')") == 30L)
    assert(one("select to_days(3) + to_hours(2)").toString == "3 days 2 hours")
    assert(one("select setseed(0.5)") == null)
  }

  test("probed batch 2: list utilities") {
    assert(one("select list_unique([1,2,2,3])") == 3L) // count, not the array
    assert(one("select list_resize([1,2], 4)") == Seq(1, 2, null, null))
    assert(one("select list_resize([1,2,3], 2)") == Seq(1, 2))
    assert(one("select list_resize([1,2], 4, 9)") == Seq(1, 2, 9, 9))
    // n ≤ 0 → [] (sequence(1,0) counts DOWN; must not reach ElementAt(l,0))
    assert(one("select list_resize([1,2], 0)") == Seq())
    assert(one("select list_resize([1,2], -3)") == Seq())
    assert(one("select list_select([10,20,30], [3,1])") == Seq(30, 10))
    assert(one("select list_select([10,20,30], [5])") == Seq(null))
    // per-row index 0 → NULL like element_at, not a query-killing error
    assert(one("select list_select([10,20,30], [0,2])") == Seq(null, 20))
    assert(one("select list_where([10,20,30], [true,false,true])") == Seq(10, 30))
    assert(one("select list_grade_up([30,10,20,10])") == Seq(2, 4, 3, 1))
    assert(one("select list_dot_product([1.0,2.0],[3.0,4.0])") == 11.0)
    assert(one("select list_distance([0.0,0.0],[3.0,4.0])") == 5.0)
    assert(one("select list_cosine_similarity([1.0,2.0],[2.0,4.0])") == 0.9999999999999998)
    assert(one("select list_reduce([1,2,3,4], (a,b) -> a + b)") == 10)
    assert(one("select reduce([1,2,3,4], (a,b) -> a + b)") == 10)
    assert(one("select aggregate([1,2,3], 'max')") == 3)
    assert(one("select list_avg([1,2,3])") == 2.0)
    assert(one("select list_sort([3,1,2], 'DESC')") == Seq(3, 2, 1))
    assert(one("select list_sort([3,1,2])") == Seq(1, 2, 3))
    // DuckDB default null order is NULLS FIRST in both directions
    assert(one("select list_sort([3,NULL,1])") == Seq(null, 1, 3))
    assert(one("select list_sort([3,NULL,1], 'DESC')") == Seq(null, 3, 1))
    assert(one("select list_sort([3,NULL,1], 'ASC', 'NULLS LAST')") == Seq(1, 3, null))
    assert(one("select list_sort([3,NULL,1], 'DESC', 'NULLS LAST')") == Seq(3, 1, null))
    assert(one("select array_extract([1,2,3], 2)") == 2)
    assert(one("select array_prepend(0, [1,2])") == Seq(0, 1, 2))
    assert(one("select array_push_front([1,2], 0)") == Seq(0, 1, 2))
    assert(one("select array_push_back([1,2], 3)") == Seq(1, 2, 3))
    assert(one("select list_intersect([1,2,3],[2,3,4])").asInstanceOf[collection.Seq[_]].toSet == Set(2, 3))
    // element_at: 1-based, negative from end, 0 and OOB → NULL (DuckDB)
    assert(one("select element_at([1,2,3], -1)") == 3)
    assert(one("select element_at([1,2,3], 0)") == null)
    assert(one("select element_at([1,2,3], 5)") == null)
    // maps: the matching values as a LIST ([] when absent)
    assert(one("select element_at(map([1,2],['a','b']), 1)") == Seq("a"))
    assert(one("select map_extract(map([1,2],['a','b']), 3)") == Seq())
  }

  test("probed batch 2: structs and aggregates") {
    assert(one("select row(1, 'x').col1") == 1)
    assert(one("select struct_insert({'a': 1}, 'b', 2).b") == 2)
    def q(sql: String) = spark.sql(engine.rewrite(sql)).head().get(0)
    assert(q("select group_concat(x) from values ('a'),('b') t(x)") == "a,b")
    assert(q("select string_agg(x) from values ('a'),('b') t(x)") == "a,b")
    assert(q("select arbitrary(x) from values (7) t(x)") == 7)
    assert(q("select mad(x) from values (1),(2),(3),(4),(100) t(x)") == 1.0)
    val sk = q("select skewness(x) from values (1.0),(2),(3),(4),(10) t(x)").asInstanceOf[Double]
    assert(math.abs(sk - 1.6970562748477143) < 1e-9, sk.toString)
    val ku = q("select kurtosis(x) from values (1.0),(2),(3),(4),(10) t(x)").asInstanceOf[Double]
    assert(math.abs(ku - 3.151999999999994) < 1e-9, ku.toString)
    assert(q("select bitstring_agg(x, 0, 5) from values (1),(3),(5) t(x)") == "010101")
    assert(q("select reservoir_quantile(x, 0.5, 100) from values (1),(2),(3),(4),(5) t(x)") == 3)
    assert(q("select kahan_sum(x) from values (cast(1.5 as double)),(cast(2.5 as double)) t(x)") == 4.0)
  }

  test("PG regex-match operators ~ / !~ / ~* / !~*") {
    // DuckDB's ~ is regexp_full_match (probed: 'aaa' ~ '[ab]' is
    // FALSE, 'abc' ~ '.b.' TRUE), unlike PG's partial-match ~
    assert(one("select 'abc' ~ 'b.'") == false)
    assert(one("select 'abc' ~ '.b.'") == true)
    assert(one("select 'aaa' ~ '[ab]'") == false)
    assert(one("select 'abc' !~ 'z'") == true)
    assert(one("select 'ABC' ~* 'abc'") == true)
    assert(one("select 'ABC' !~* 'abc'") == false)
    // tildes inside string literals are content
    assert(one("select 'a ~ b'") == "a ~ b")
    assert(one("select concat('~', 'p')") == "~p")
    // bitwise NOT (no literal RHS) untouched
    assert(one("select ~ 5") == -6)
    // escaped quotes inside the pattern survive
    assert(one("select 'it''s' ~ 'it''s'") == true)
    // PG LIKE-operator spellings (psql emits these): ~~ LIKE, ~~* ILIKE
    assert(one("select 'abc' ~~ 'a%'") == true)
    assert(one("select 'abc' !~~ 'z%'") == true)
    assert(one("select 'ABC' ~~* 'a%'") == true)
    assert(one("select 'ABC' !~~* 'a%'") == false)
  }
}
