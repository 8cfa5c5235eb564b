package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, And, ArrayAggregate, ArrayFilter, ArrayJoin, ArrayMax, ArrayMin, Cast, DateAdd, Divide, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, If, IsNotNull, LambdaFunction, LessThan, LessThanOrEqual, Literal, Multiply, Not, Or, Size, Slice, SortArray, Subtract, TimestampDiff, TruncTimestamp, UnresolvedNamedLambdaVariable, UnscaledValue}
import org.apache.spark.sql.types.{CalendarIntervalType, DateType, DayTimeIntervalType, DoubleType, NullType, TimestampNTZType, TimestampType, YearMonthIntervalType}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** The dialect layer (SURVEY §2-B.8 / §4.3): DuckDB function names
  * registered as thin aliases over Catalyst's native (codegen'd)
  * expressions, plus the genuinely-new expressions (typeof, product,
  * vector math). Registered per-session; everything stays inside
  * whole-stage codegen because each alias resolves to the *same*
  * Expression tree the Spark-native name would produce.
  */
object GraftFunctions {

  /** DuckDB strftime/strptime %-codes → Spark datetime pattern. */
  def translateStrftime(f: String): String = {
    val sb = new StringBuilder
    var i = 0
    var literal = new StringBuilder
    def flush(): Unit = {
      if (literal.nonEmpty) {
        val s = literal.toString
        // quote any run containing pattern-reserved letters
        if (s.exists(_.isLetter)) sb.append("'").append(s.replace("'", "''")).append("'")
        else sb.append(s)
        literal = new StringBuilder
      }
    }
    while (i < f.length) {
      if (f.charAt(i) == '%' && i + 1 < f.length) {
        flush()
        f.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'y' => sb.append("yy")
          case 'm' => sb.append("MM")
          case 'd' => sb.append("dd")
          case 'H' => sb.append("HH")
          case 'I' => sb.append("hh")
          case 'M' => sb.append("mm")
          case 'S' => sb.append("ss")
          case 'f' => sb.append("SSSSSS")
          case 'g' => sb.append("SSS")
          case 'p' => sb.append("a")
          case 'j' => sb.append("DDD")
          case 'a' => sb.append("EEE")
          case 'A' => sb.append("EEEE")
          case 'b' => sb.append("MMM")
          case 'B' => sb.append("MMMM")
          case 'Z' => sb.append("zzz")
          case 'z' => sb.append("XXX")
          case '%' => literal.append('%')
          case c   => literal.append(c) // unknown code: keep verbatim
        }
        i += 2
      } else { literal.append(f.charAt(i)); i += 1 }
    }
    flush()
    sb.toString
  }

  private def litString(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$fn: format must be a string literal, got $e")
  }

  /** name → (target Spark function, argument rewrite). */
  private val aliases: Seq[(String, String, Seq[Expression] => Seq[Expression])] = {
    val id = identity[Seq[Expression]] _
    val argNullSkip: Seq[Expression] => Seq[Expression] = es =>
      if (es.length == 2)
        Seq(es.head, If(org.apache.spark.sql.catalyst.expressions.IsNull(es.head),
          Literal.create(null, es(1).dataType), es(1)))
      else es
    Seq(
      // string family
      ("string_split", "split", id),
      ("str_split", "split", id),
      ("string_to_array", "split", id),
      ("string_split_regex", "split", id),
      ("regexp_matches", "rlike", id),
      ("strpos", "instr", id),
      ("list_reverse", "reverse", id),
      ("ucase", "upper", id),
      ("lcase", "lower", id),
      ("prefix", "startswith", id),
      ("suffix", "endswith", id),
      ("starts_with", "startswith", id),
      ("ends_with", "endswith", id),
      // list family (DuckDB list_* → Spark array functions; both 1-based)
      ("list_value", "array", id),
      ("list_pack", "array", id),
      ("list_extract", "element_at", id),
      ("list_element", "element_at", id),
      ("array_length", "size", id),
      ("list_distinct", "array_distinct", id),
      ("list_transform", "transform", id),
      ("list_apply", "transform", id),
      ("list_filter", "filter", id),
      ("list_min", "array_min", id),
      ("list_append", "array_append", id),
      ("array_push_back", "array_append", id),
      ("list_prepend", "array_prepend", es => Seq(es(1), es.head)),
      // push_front must capture Spark's NATIVE (list, element) builder,
      // so it is listed BEFORE the array_prepend entry replaces it
      ("array_push_front", "array_prepend", id),
      // DuckDB array_prepend is (element, list) — Spark's is (list, element)
      ("array_prepend", "array_prepend", es => Seq(es(1), es.head)),
      ("list_max", "array_max", id),
      ("array_extract", "element_at", id),
      ("array_reverse", "reverse", id),
      ("array_transform", "transform", id),
      ("apply", "transform", id),
      ("array_filter", "filter", id),
      ("list_intersect", "array_intersect", id),
      ("array_has_all", "list_has_all", id),
      ("array_has_any", "list_has_any", id),
      ("editdist3", "levenshtein", id),
      ("from_hex", "unhex", id),
      ("from_base64", "unbase64", id),
      ("arbitrary", "any_value", id),
      ("kahan_sum", "sum", id),
      ("today", "current_date", id),
      ("get_current_timestamp", "now", id),
      ("datetrunc", "date_trunc", id),
      ("ord", "ascii", id),
      ("to_hex", "hex", id),
      ("regexp_split_to_array", "split", id),
      ("string_split_regex", "split", id),
      ("unnest", "explode", id),
      ("generate_series", "sequence", id),
      // struct / map
      ("struct_pack", "named_struct", id),
      ("map_from_entries", "map_from_entries", id),
      ("cardinality", "size", id),
      // json (json_extract/json_extract_string moved to probed batch 3:
      // they now build a '$.'-prefixed path from DuckDB's bare-key form)
      ("json_array_length", "json_array_length", id),
      ("json_structure", "schema_of_json", id),
      // hash / crypto
      ("sha256", "sha2", es => es :+ Literal(256)),
      ("hash", "xxhash64", id),
      // date/time
      // strftime is a registered builder (the %W/%U week numbers are
      // computed, not pattern-expressible); strptime stays an alias
      ("strptime", "to_timestamp",
        es => Seq(es.head, Literal(UTF8String.fromString(
          translateStrftime(litString(es(1), "strptime"))), StringType))),
      ("epoch_ms", "unix_millis", id),
      // aggregates (probed batch: DuckDB names over Spark natives)
      ("list", "collect_list", id),
      ("countif", "count_if", id),
      ("favg", "avg", id),   // Kahan-compensated in DuckDB; double avg here
      ("fsum", "sum", id),
      // DuckDB arg_min/arg_max IGNORE rows whose VALUE is NULL (probed:
      // arg_max(s,k) over (0,'b'),(1,NULL) is 'b'); null out the key on
      // those rows so min_by/max_by skips them (fuzzer find)
      ("arg_min", "min_by", argNullSkip),
      ("arg_max", "max_by", argNullSkip),
      ("argmin", "min_by", argNullSkip),
      ("argmax", "max_by", argNullSkip),
      ("approx_quantile", "percentile_approx", id),
      // catalog macro (reference pg_server.go:42)
      ("currentdatabase", "current_database", id)
    )
  }

  /** DuckDB `list_aggregate(list, 'name')` — dynamic aggregate over the
    * list's elements, dispatched at analysis time on the literal name to
    * the equivalent Catalyst expression tree (codegen'd, no UDF). */
  private def listAggregate(es: Seq[Expression]): Expression = {
    require(es.length >= 2, "list_aggregate(list, 'aggregate_name')")
    val list = es.head
    def lam1(f: Expression => Expression): LambdaFunction = {
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      LambdaFunction(f(x), Seq(x))
    }
    def lam2(f: (Expression, Expression) => Expression): LambdaFunction = {
      val a = UnresolvedNamedLambdaVariable(Seq("a"))
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      LambdaFunction(f(a, x), Seq(a, x))
    }
    // nulls are ignored (DuckDB/SQL aggregate semantics); an empty or
    // all-null list sums/averages to NULL, not 0 / divide-by-zero
    def nonNull = ArrayFilter(list, lam1(IsNotNull))
    def countExpr = Size(nonNull)
    // result type dispatches on the ELEMENT type (integral → bigint,
    // float/double → double, decimal(p,s) → decimal(38,s)), matching
    // DuckDB's list_sum; an ArrayAggregate seed cannot express this
    // (one static accumulator type — decimal addition widens precision
    // every step and fails to type-check). Nulls skipped, empty → NULL.
    def sumExpr = ListSum(list)
    litString(es(1), "list_aggregate").toLowerCase match {
      case "sum" => sumExpr
      case "min" => ArrayMin(list)
      case "max" => ArrayMax(list)
      case "count" => countExpr
      case "avg" | "mean" =>
        Divide(Cast(sumExpr, DoubleType),
          If(EqualTo(countExpr, Literal(0)), Literal.create(null, DoubleType),
            Cast(countExpr, DoubleType)))
      case "string_agg" =>
        val sep = if (es.length >= 3) es(2)
                  else Literal(UTF8String.fromString(","), StringType)
        // all-NULL (or empty) list → NULL like the aggregate, not ''
        // (fuzzer find, seed 1006)
        If(EqualTo(countExpr, Literal(0)),
          Literal.create(null, StringType), ArrayJoin(list, sep, None))
      case other => throw new IllegalArgumentException(
        s"list_aggregate: unsupported aggregate '$other' (sum/min/max/count/avg/string_agg)")
    }
  }

  /** DuckDB unit spellings (plural, abbreviations) → the singular unit
    * keywords Catalyst's TimestampDiff/TruncTimestamp accept. */
  private def normalizeUnit(u: String): String = u.toLowerCase match {
    case "ms" | "millisecond" | "milliseconds" => "MILLISECOND"
    case "us" | "microsecond" | "microseconds" => "MICROSECOND"
    case "s" | "sec" | "secs" | "second" | "seconds" => "SECOND"
    case "min" | "mins" | "minute" | "minutes" => "MINUTE"
    case "h" | "hr" | "hrs" | "hour" | "hours" => "HOUR"
    case "d" | "day" | "days" => "DAY"
    case "w" | "week" | "weeks" => "WEEK"
    case "m" | "mon" | "mons" | "month" | "months" => "MONTH"
    case "q" | "quarter" | "quarters" => "QUARTER"
    case "y" | "yr" | "yrs" | "year" | "years" => "YEAR"
    case other => other.toUpperCase
  }

  /** DuckDB date_diff('unit', a, b): counts unit BOUNDARY CROSSINGS —
    * truncate both sides to the unit, then diff (timestampdiff alone
    * counts complete elapsed periods: 0 for Jan-31→Feb-01 months). */
  private def duckDateDiff(es: Seq[Expression]): Expression = {
    val u = normalizeUnit(litString(es.head, "date_diff"))
    def trunc(e: Expression) =
      TruncTimestamp(Literal(UTF8String.fromString(u), StringType), Cast(e, TimestampType))
    TimestampDiff(u, trunc(es(1)), trunc(es(2)))
  }

  /** Two of the three server-defined macros (reference pg_server.go:40-41);
    * currentDatabase() is in the alias table above. */
  private val macros: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("array_positions", _ => Literal(0)),
    ("timezone", {
      // 2-arg DuckDB timezone(tz, ts): a NAIVE timestamp is interpreted
      // as local time in tz (→ instant); an instant is converted to
      // naive local time in tz (probed both ways, fuzzer find). The
      // no-arg pg_catalog spelling keeps the session constant.
      case Seq(tz, ts) =>
        val zone = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
        ts.dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          Cast(org.apache.spark.sql.catalyst.expressions.ConvertTimezone(
            tz, Literal(UTF8String.fromString("UTC"), StringType),
            ts), TimestampType, zone)
        case _ =>
          Cast(org.apache.spark.sql.catalyst.expressions.ConvertTimezone(
            Literal(UTF8String.fromString("UTC"), StringType), tz,
            Cast(ts, org.apache.spark.sql.types.TimestampNTZType, zone)),
            org.apache.spark.sql.types.TimestampNTZType, zone)
      }
      case _ => Literal(UTF8String.fromString("utc"), StringType)
    })
  )

  def registerAll(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    // registration is NOT idempotent (several overrides wrap the current
    // builder under the same name — a second pass would wrap the wrapper,
    // double-swapping arguments / double-correcting moments), so guard
    // with a sentinel function per registry instance; the sentinel is
    // registered LAST so a registration pass that throws partway can be
    // retried instead of leaving the registry permanently half-built
    if (reg.lookupFunctionBuilder(FunctionIdentifier("graft_registry_marker")).isDefined) return

    reg.createOrReplaceTempFunction("typeof", es => TypeOf(es.head), "scala_udf")
    // DuckDB gen_random_uuid()/uuid() — Spark's uuid() expression
    reg.createOrReplaceTempFunction("gen_random_uuid",
      _ => org.apache.spark.sql.catalyst.expressions.Uuid(), "scala_udf")
    // DuckDB sign() is TINYINT (-1/0/1); Spark's signum is DOUBLE and
    // renders "-1.0" wherever the value is stringified (fuzzer find);
    // the result type is TINYINT on the wire and in typeof (ADVICE r8)
    for (n <- Seq("sign", "signum"))
      reg.createOrReplaceTempFunction(n, es =>
        Cast(org.apache.spark.sql.catalyst.expressions.Signum(
          Cast(es.head, org.apache.spark.sql.types.DoubleType)), org.apache.spark.sql.types.ByteType), "scala_udf")
    // DuckDB // dispatch and try_cast-to-int rounding (fuzzer finds)
    reg.createOrReplaceTempFunction("graft_fdiv",
      es => FloorDivDispatch(es.head, es(1)), "scala_udf")
    // DuckDB floor/ceil keep DOUBLE inputs DOUBLE (fuzzer find: the
    // result type drives // dispatch)
    reg.createOrReplaceTempFunction("floor",
      es => FloorCeilDuck(es.head, isFloor = true), "scala_udf")
    for (n <- Seq("ceil", "ceiling"))
      reg.createOrReplaceTempFunction(n,
        es => FloorCeilDuck(es.head, isFloor = false), "scala_udf")
    reg.createOrReplaceTempFunction("graft_tryint",
      es => TryIntCastDuck(es.head, es(1)), "scala_udf")
    // DuckDB split_part NULL semantics (fuzzer find, probed): NULL
    // string → '', NULL delimiter → the whole string, NULL index → ''
    locally {
      import org.apache.spark.sql.catalyst.expressions.{If, IsNull}
      val native = reg.lookupFunctionBuilder(FunctionIdentifier("split_part")).get
      val empty = Literal(UTF8String.fromString(""), StringType)
      reg.createOrReplaceTempFunction("split_part", es => {
        val Seq(str, delim, n) = es.take(3)
        If(IsNull(str), empty,
          If(IsNull(delim), str,
            If(IsNull(n), empty, native(es))))
      }, "scala_udf")
    }
    // DuckDB list_contains/list_has/array_contains: NULL needle → NULL,
    // NULL elements never poison the result (absent → false), needle
    // coerces to the element type; list_position family coerces too
    // (fuzzer finds, tools/expr_fuzz.py)
    for (n <- Seq("list_contains", "list_has", "array_contains"))
      reg.createOrReplaceTempFunction(n, es => ListContainsDuck(es.head, es(1)), "scala_udf")
    for (n <- Seq("list_position", "array_position", "list_indexof"))
      reg.createOrReplaceTempFunction(n, es => ListPositionDuck(es.head, es(1)), "scala_udf")
    // DuckDB format/printf return NULL when ANY argument is NULL
    // (fmt-library semantics); Spark's format_string renders "null"
    val fmtNullProp: Seq[Expression] => Expression = es => {
      import org.apache.spark.sql.catalyst.expressions.{FormatString, IsNull, Or}
      val anyNull = es.tail.map(e => IsNull(e): Expression)
        .reduceOption[Expression](Or(_, _)).getOrElse(Literal(false))
      If(anyNull, Literal.create(null, StringType), FormatString(es: _*))
    }
    for (n <- Seq("graft_format", "format", "printf"))
      reg.createOrReplaceTempFunction(n, fmtNullProp, "scala_udf")
    // DuckDB concat SKIPS NULL arguments and stringifies every input
    // (concat(NULL,'x')='x', concat([1],[2])='[1][2]', concat(NULL)='');
    // Spark's concat is NULL-propagating and type-preserving. Fuzzer
    // find (tools/expr_fuzz.py seed 42). The || operator stays
    // NULL-propagating in both engines, so only the function name is
    // rebound; casts on already-string children fold away.
    reg.createOrReplaceTempFunction("concat",
      es => org.apache.spark.sql.catalyst.expressions.ConcatWs(Literal(UTF8String.fromString(""), StringType) +:
        es.map(e => Cast(e, StringType))), "scala_udf")
    // list_concat/array_cat keep ARRAY semantics — bind to the native
    // Concat expression, not the registry's rebound string "concat"
    for (n <- Seq("list_concat", "list_cat", "array_concat", "array_cat"))
      reg.createOrReplaceTempFunction(n,
        es => org.apache.spark.sql.catalyst.expressions.Concat(es), "scala_udf")
    reg.createOrReplaceTempFunction("vector_dot", es => VectorDot(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("list_aggregate", listAggregate, "scala_udf")
    reg.createOrReplaceTempFunction("list_aggr", listAggregate, "scala_udf")
    // DuckDB date_add(date, INTERVAL …): dispatch on the literal's type
    // so Spark-native date_add(date, int_days) keeps working
    reg.createOrReplaceTempFunction("date_add", {
      case Seq(d, i @ Literal(_, CalendarIntervalType | _: DayTimeIntervalType | _: YearMonthIntervalType)) =>
        Add(d, i)
      case es => DateAdd(es.head, es(1))
    }, "scala_udf")
    // DuckDB list_slice(list, begin, end) is end-INCLUSIVE; Spark slice
    // takes (start, length)
    val sliceBuilder: Seq[Expression] => Expression = es =>
      Slice(es.head, es(1), Add(Subtract(es(2), es(1)), Literal(1)))
    reg.createOrReplaceTempFunction("list_slice", sliceBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("array_slice", sliceBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("list_reverse_sort",
      es => SortArray(es.head, Literal(false)), "scala_udf")
    reg.createOrReplaceTempFunction("list_sum",
      es => listAggregate(Seq(es.head, Literal(UTF8String.fromString("sum"), StringType))),
      "scala_udf")
    // DuckDB range([start,] stop[, step]) is stop-EXCLUSIVE and empty
    // when the direction is wrong (Spark's sequence is inclusive and
    // auto-reverses) — build the inclusive sequence, then filter to the
    // half-open interval, which also yields [] for start >= stop.
    reg.createOrReplaceTempFunction("range", { es0 =>
      val es = if (es0.length == 1) Seq(Literal(0), es0.head) else es0
      val seqB = reg.lookupFunctionBuilder(FunctionIdentifier("sequence")).get
      val negStep = es.lift(2).exists {
        case Literal(v: Number, _) => v.longValue() < 0
        case _ => false
      }
      val stop = if (negStep) Add(es(1), Literal(1)) else Subtract(es(1), Literal(1))
      val seq = seqB(es.head +: stop +: es.drop(2))
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val keep =
        if (negStep) And(LessThanOrEqual(x, es.head), GreaterThan(x, es(1)))
        else And(GreaterThanOrEqual(x, es.head), LessThan(x, es(1)))
      ArrayFilter(seq, LambdaFunction(keep, Seq(x)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("duck_date_diff", duckDateDiff, "scala_udf")
    // date_diff('part', …) and format('{}', …) resolve through
    // builder-based builtins that bypass session-registry overrides —
    // those two are handled as text rewrites in Engine.rewrite instead.
    spark.udf.register("product", udaf(ProductAgg))

    // -------- probed DuckDB scalar surface (see DialectExpressions) --------
    def call(name: String)(args: Expression*): Expression =
      reg.lookupFunctionBuilder(FunctionIdentifier(name)).get(args)
    def str(s: String): Expression = Literal(UTF8String.fromString(s), StringType)
    // fresh variable names per lambda: nested lambdas with the same
    // name shadow each other and silently capture the wrong binding
    val lamId = new java.util.concurrent.atomic.AtomicInteger
    def lam(f: Expression => Expression): Expression = {
      val x = UnresolvedNamedLambdaVariable(Seq(s"x${lamId.incrementAndGet()}"))
      LambdaFunction(f(x), Seq(x))
    }
    def lamXY(f: (Expression, Expression) => Expression): Expression = {
      val n = lamId.incrementAndGet()
      val x = UnresolvedNamedLambdaVariable(Seq(s"x$n"))
      val y = UnresolvedNamedLambdaVariable(Seq(s"y$n"))
      LambdaFunction(f(x, y), Seq(x, y))
    }
    def chars(e: Expression) = call("split")(e, str(""))
    // hamming: differing positions; NULL (not DuckDB's error) on
    // length mismatch — a scalar cannot fail one row at scale
    reg.createOrReplaceTempFunction("hamming", es => {
      val diff = Cast(call("size")(ArrayFilter(
        call("zip_with")(chars(es.head), chars(es(1)), lamXY((x, y) => Not(EqualTo(x, y)))),
        lam(identity))), org.apache.spark.sql.types.LongType)
      If(EqualTo(call("length")(es.head), call("length")(es(1))), diff,
        Literal.create(null, org.apache.spark.sql.types.LongType))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("mismatches",
      es => call("hamming")(es: _*), "scala_udf")
    // jaccard: similarity of the CHARACTER SETS (DuckDB semantics)
    reg.createOrReplaceTempFunction("jaccard", es => {
      val a = call("array_distinct")(chars(es.head))
      val b = call("array_distinct")(chars(es(1)))
      Divide(Cast(call("size")(call("array_intersect")(a, b)), DoubleType),
        Cast(call("size")(call("array_union")(a, b)), DoubleType))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("strip_accents", es => StripAccents(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("format_bytes", es => FormatBytes(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("formatreadablesize", es => FormatBytes(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("to_base",
      es => call("conv")(es.head, Literal(10), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("gamma",
      es => MathUnary("gamma", Cast(es.head, DoubleType)), "scala_udf")
    reg.createOrReplaceTempFunction("lgamma",
      es => MathUnary("lgamma", Cast(es.head, DoubleType)), "scala_udf")
    reg.createOrReplaceTempFunction("gcd", es => GcdLcm("gcd", es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("lcm", es => GcdLcm("lcm", es.head, es(1)), "scala_udf")
    // even: round away from zero to the next even integer
    reg.createOrReplaceTempFunction("even", es => {
      val x = Cast(es.head, DoubleType)
      Multiply(call("signum")(x),
        Cast(Multiply(call("ceil")(Divide(call("abs")(x), Literal(2.0d))), Literal(2L)), DoubleType))
    }, "scala_udf")
    // fdiv/fmod: floored division pair (fmod(-7,2)=1, like DuckDB)
    reg.createOrReplaceTempFunction("fdiv", es => {
      val (a, b) = (Cast(es.head, DoubleType), Cast(es(1), DoubleType))
      Cast(call("floor")(Divide(a, b)), DoubleType)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("fmod", es => {
      val (a, b) = (Cast(es.head, DoubleType), Cast(es(1), DoubleType))
      Subtract(a, Multiply(b, Cast(call("floor")(Divide(a, b)), DoubleType)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("isinf", es => {
      val x = Cast(es.head, DoubleType)
      Or(EqualTo(x, Literal(Double.PositiveInfinity)),
        EqualTo(x, Literal(Double.NegativeInfinity)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("isfinite", es => {
      es.head.dataType match {
        // DuckDB: any representable date/timestamp is finite (the
        // ±infinity sentinels don't round-trip our wire) — fuzzer find
        case DateType | TimestampType | TimestampNTZType =>
          If(org.apache.spark.sql.catalyst.expressions.IsNull(es.head),
            Literal.create(null, org.apache.spark.sql.types.BooleanType), Literal(true))
        case _ =>
          val x = Cast(es.head, DoubleType)
          And(Not(call("isnan")(x)),
            And(Not(EqualTo(x, Literal(Double.PositiveInfinity))),
              Not(EqualTo(x, Literal(Double.NegativeInfinity)))))
      }
    }, "scala_udf")
    reg.createOrReplaceTempFunction("regexp_full_match", es => {
      // native Concat, not call("concat"): the registry name is rebound
      // to DuckDB's NULL-skipping string concat below
      val anchored = org.apache.spark.sql.catalyst.expressions.Concat(
        Seq(str("^(?:"), es(1), str(")$")))
      call("rlike")(es.head, anchored)
    }, "scala_udf")
    // 2-arg regexp_extract_all: DuckDB returns whole matches (group 0)
    val nativeRegexpExtractAll =
      reg.lookupFunctionBuilder(FunctionIdentifier("regexp_extract_all")).get
    reg.createOrReplaceTempFunction("regexp_extract_all", es => {
      val args = if (es.length == 2) es :+ Literal(0) else es
      nativeRegexpExtractAll(args)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("list_zip", es =>
      call("zip_with")(es.head, es(1), lamXY((x, y) =>
        call("named_struct")(str("list_1"), x, str("list_2"), y))), "scala_udf")
    reg.createOrReplaceTempFunction("list_has_all", es =>
      EqualTo(call("size")(call("array_except")(es(1), es.head)), Literal(0)), "scala_udf")
    reg.createOrReplaceTempFunction("list_has_any", es =>
      call("arrays_overlap")(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("struct_extract", es =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("len", es => LenOf(es.head), "scala_udf")
    val nativeMap = reg.lookupFunctionBuilder(FunctionIdentifier("map")).get
    reg.createOrReplaceTempFunction("map", {
      case Seq(k, v) => MapDispatch(k, v)
      case es => nativeMap(es)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("age", { es =>
      val args = if (es.length == 1)
        Seq(Cast(call("current_date")(), TimestampType), Cast(es.head, TimestampType))
      else Seq(Cast(es.head, TimestampType), Cast(es(1), TimestampType))
      AgeInterval(args.head, args(1))
    }, "scala_udf")
    // quantile_disc / quantile: the sorted element at floor(p*(n-1))+1
    // (1-based), DuckDB's discrete-quantile convention. collect_list
    // appears twice but Spark dedupes identical aggregate buffers.
    // a nested aggregate function must be wrapped explicitly — the
    // analyzer only wraps when the aggregate is the top-level resolve
    def aggCall(name: String)(args: Expression*): Expression =
      call(name)(args: _*) match {
        case a: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction =>
          a.toAggregateExpression()
        case other => other
      }
    val quantileDisc: Seq[Expression] => Expression = { es =>
      val l = aggCall("collect_list")(es.head)
      val idx = Add(Cast(call("floor")(Multiply(Cast(es(1), DoubleType),
        Cast(Subtract(call("size")(l), Literal(1)), DoubleType))),
        org.apache.spark.sql.types.IntegerType), Literal(1))
      // collect_list drops NULLs; an all-NULL group is an empty list —
      // index (0·p)+1 over it would be INVALID_INDEX_OF_ZERO where
      // DuckDB returns NULL (fuzzer find)
      If(EqualTo(call("size")(l), Literal(0)),
        Literal.create(null, org.apache.spark.sql.types.NullType),
        call("element_at")(call("array_sort")(l), idx))
    }
    reg.createOrReplaceTempFunction("quantile_disc", quantileDisc, "scala_udf")
    reg.createOrReplaceTempFunction("quantile", quantileDisc, "scala_udf")
    // DuckDB median/quantile_cont keep DECIMAL inputs DECIMAL: median
    // of a decimal column is the DISCRETE lower-middle element (probed:
    // median of (1.5, 2.5) is 1.5, not 2.0) and quantile_cont rounds
    // the double interpolation back to the input's decimal type
    // (fuzzer finds). Builders see resolved children (ResolveFunctions
    // fires only when childrenResolved), so dispatch on dataType here.
    // DuckDB any_value/arbitrary return the first NON-NULL value;
    // Spark's default keeps NULLs (fuzzer find)
    for (n <- Seq("any_value", "arbitrary"))
      reg.createOrReplaceTempFunction(n, es =>
        org.apache.spark.sql.catalyst.expressions.aggregate.AnyValue(es.head, true),
        "scala_udf")
    // DuckDB avg/mean over DECIMAL returns DOUBLE; Spark returns
    // DECIMAL(p+4, s+4), whose fixed-scale rendering truncates the
    // digits the oracle prints (fuzzer find, seed 64). Integer/double
    // inputs already agree.
    val nativeAvg = reg.lookupFunctionBuilder(FunctionIdentifier("avg")).get
    for (n <- Seq("avg", "mean"))
      reg.createOrReplaceTempFunction(n, { es =>
        es.head.dataType match {
          case _: org.apache.spark.sql.types.DecimalType =>
            nativeAvg(Seq(Cast(es.head, DoubleType)))
          case _ => nativeAvg(es)
        }
      }, "scala_udf")
    val nativeMedian = reg.lookupFunctionBuilder(FunctionIdentifier("median")).get
    val nativePercentile = reg.lookupFunctionBuilder(FunctionIdentifier("percentile")).get
    reg.createOrReplaceTempFunction("median", { es =>
      es.head.dataType match {
        case _: org.apache.spark.sql.types.DecimalType =>
          quantileDisc(Seq(es.head, Literal(0.5d)))
        case _ => nativeMedian(es)
      }
    }, "scala_udf")
    def wrapAgg(e: Expression): Expression = e match {
      case a: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction =>
        a.toAggregateExpression()
      case other => other
    }
    reg.createOrReplaceTempFunction("quantile_cont", { es =>
      es.head.dataType match {
        case dt: org.apache.spark.sql.types.DecimalType if dt.precision <= 18 =>
          // DuckDB interpolates over the UNSCALED integer representation
          // and truncates toward zero (probed: raw 565.75 → 565, raw
          // -12.75 → -12) — interpolating the scaled doubles instead
          // rounds differently at the .xx5 boundaries (fuzzer find).
          // The cast hides the aggregate from the analyzer's top-level
          // wrap, so wrap explicitly.
          val raw = wrapAgg(nativePercentile(
            UnscaledValue(es.head) +: es.tail))
          val trunc = Cast(raw, org.apache.spark.sql.types.LongType)
          Cast(Divide(Cast(trunc, DoubleType), Literal(math.pow(10, dt.scale))),
            dt, None, org.apache.spark.sql.catalyst.expressions.EvalMode.TRY)
        case dt: org.apache.spark.sql.types.DecimalType =>
          Cast(wrapAgg(nativePercentile(Cast(es.head, DoubleType) +: es.tail)),
            dt, None, org.apache.spark.sql.catalyst.expressions.EvalMode.TRY)
        case _ => nativePercentile(es)
      }
    }, "scala_udf")
    // entropy: Shannon entropy (base 2) of the value distribution,
    // computed from the collected multiset — compat alias; the scale
    // path is an explicit count-by-value aggregation
    reg.createOrReplaceTempFunction("entropy", { es =>
      val l = aggCall("collect_list")(es.head)
      val n = Cast(call("size")(l), DoubleType)
      val counts = call("transform")(call("array_distinct")(l),
        lam(v => Cast(call("size")(ArrayFilter(l, lam(e => EqualTo(e, v)))), DoubleType)))
      call("aggregate")(counts, Literal(0.0d),
        lamXY((acc, c) => Subtract(acc,
          Multiply(Divide(c, n), call("log2")(Divide(c, n))))))
    }, "scala_udf")
    // histogram: value → count map, keys sorted (DuckDB rendering)
    reg.createOrReplaceTempFunction("histogram", { es =>
      val l = aggCall("collect_list")(es.head)
      call("map_from_entries")(call("transform")(
        call("array_sort")(call("array_distinct")(l)),
        lam(v => call("struct")(v,
          Cast(call("size")(ArrayFilter(l, lam(e => EqualTo(e, v)))),
            org.apache.spark.sql.types.LongType)))))
    }, "scala_udf")
    // time_bucket(width_interval_literal, ts): width decoded at build
    reg.createOrReplaceTempFunction("time_bucket", { es =>
      val (m, d, us) = es.head match {
        case Literal(ci: org.apache.spark.unsafe.types.CalendarInterval, CalendarIntervalType) =>
          (ci.months, ci.days, ci.microseconds)
        case Literal(micros: Long, _: DayTimeIntervalType) =>
          if (micros % 86400000000L == 0) (0, (micros / 86400000000L).toInt, 0L)
          else (0, 0, micros)
        case Literal(months: Int, _: YearMonthIntervalType) => (months, 0, 0L)
        case other => throw new IllegalArgumentException(
          s"time_bucket: width must be an INTERVAL literal, got $other")
      }
      TimeBucket(m, d, us, es(1))
    }, "scala_udf")

    // -------- round-4 probed batch 2: strings, lists, dates, aggregates ----
    registerProbedBatch2(reg)
    // -------- round-5 probed batch 3: subscripts, JSON family, date nits ---
    registerProbedBatch3(reg)

    aliases.foreach { case (name, target, rewrite) =>
      reg.lookupFunctionBuilder(FunctionIdentifier(target)) match {
        case Some(builder) =>
          reg.createOrReplaceTempFunction(name, es => builder(rewrite(es)), "scala_udf")
        case None => // target missing in this Spark — skip quietly
      }
    }
    macros.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }

    reg.createOrReplaceTempFunction("graft_registry_marker",
      _ => Literal(true), "scala_udf")
  }

  /** Second probed batch (round 4): DuckDB surface found missing by
    * `tools/dialect_probe.py` — string metrics, path parsing, list
    * utilities, interval constructors, date parts, aggregate aliases.
    * Everything composes Catalyst natives or the codegen'd expressions
    * in DialectExpressions; no UDFs. */
  private def registerProbedBatch2(
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._

    def call(name: String)(args: Expression*): Expression =
      reg.lookupFunctionBuilder(FunctionIdentifier(name)).get(args)
    def aggCall(name: String)(args: Expression*): Expression =
      call(name)(args: _*) match {
        case a: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction =>
          a.toAggregateExpression()
        case other => other
      }
    def str(s: String): Expression = Literal(UTF8String.fromString(s), StringType)
    val lamId = new java.util.concurrent.atomic.AtomicInteger(1000)
    def lam(f: Expression => Expression): Expression = {
      val x = UnresolvedNamedLambdaVariable(Seq(s"x${lamId.incrementAndGet()}"))
      LambdaFunction(f(x), Seq(x))
    }
    def lamXY(f: (Expression, Expression) => Expression): Expression = {
      val n = lamId.incrementAndGet()
      val x = UnresolvedNamedLambdaVariable(Seq(s"x$n"))
      val y = UnresolvedNamedLambdaVariable(Seq(s"y$n"))
      LambdaFunction(f(x, y), Seq(x, y))
    }
    def fn(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    def litStr(e: Expression, where: String): String = e match {
      case Literal(s: UTF8String, StringType) => s.toString
      case _ => throw new IllegalArgumentException(s"$where: expected a string literal, got $e")
    }

    // ---- string metrics / helpers
    fn("damerau_levenshtein")(es => StrMetric("damerau_levenshtein", es.head, es(1)))
    fn("jaro_similarity")(es => StrMetric("jaro_similarity", es.head, es(1)))
    fn("jaro_winkler_similarity")(es => StrMetric("jaro_winkler_similarity", es.head, es(1)))
    fn("unicode")(es => StrUnary("unicode", es.head))
    fn("nfc_normalize")(es => StrUnary("nfc_normalize", es.head))
    fn("regexp_escape")(es => StrUnary("regexp_escape", es.head))
    fn("parse_path")(es => ParsePath(es.head))
    fn("parse_dirname")(es => ParsePathPart("parse_dirname", es.head, trimExt = false))
    fn("parse_dirpath")(es => ParsePathPart("parse_dirpath", es.head, trimExt = false))
    fn("parse_filename")(es => ParsePathPart("parse_filename", es.head,
      trimExt = es.lift(1).exists { case Literal(true, BooleanType) => true; case _ => false }))
    // like_escape family: LIKE with a caller-chosen escape character
    def escChar(e: Expression): Char = {
      val s = litStr(e, "like_escape")
      if (s.length != 1) throw new IllegalArgumentException("escape must be one character")
      s.charAt(0)
    }
    fn("like_escape")(es => Like(es.head, es(1), escChar(es(2))))
    fn("ilike_escape")(es => ILike(es.head, es(1), escChar(es(2))))
    fn("not_like_escape")(es => Not(Like(es.head, es(1), escChar(es(2)))))
    fn("not_ilike_escape")(es => Not(ILike(es.head, es(1), escChar(es(2)))))

    // ---- numeric
    fn("xor")(es => BitwiseXor(es.head, es(1)))
    fn("nextafter")(es => NextAfter(Cast(es.head, DoubleType), Cast(es(1), DoubleType)))
    fn("setseed")(_ => Literal.create(null, NullType)) // driver-side RNG seed: no-op
    // trunc(x): toward-zero integer part (2-arg form stays Spark's date
    // trunc). DuckDB keeps the input's numeric type — trunc(1.9) is the
    // DOUBLE 1.0, trunc(5) is 5 — so the dispatch is type-resolved
    // (TruncTowardZero), not a blanket Cast-to-BIGINT whose wire OID and
    // beyond-Long clamping would diverge.
    val nativeTrunc = reg.lookupFunctionBuilder(FunctionIdentifier("trunc")).get
    fn("trunc") {
      case Seq(x) => TruncTowardZero(x)
      case es => nativeTrunc(es)
    }
    // DuckDB 1-arg round(DECIMAL(p,s)) types as DECIMAL(p,0) (fuzzer
    // find); 2-arg round keeps Spark's native typing (already matches)
    val nativeRound = reg.lookupFunctionBuilder(FunctionIdentifier("round")).get
    fn("round") {
      case Seq(x) => RoundDuck(x)
      case es => nativeRound(es)
    }
    // DuckDB log(x) is log10; log(b, x) is log base b
    val nativeLog = reg.lookupFunctionBuilder(FunctionIdentifier("log")).get
    fn("log") {
      case Seq(x) => Log10(x)
      case es => nativeLog(es)
    }
    // DuckDB regexp_extract(s, re) returns the whole match (group 0)
    val nativeRegexpExtract = reg.lookupFunctionBuilder(FunctionIdentifier("regexp_extract")).get
    fn("regexp_extract") { es =>
      nativeRegexpExtract(if (es.length == 2) es :+ Literal(0) else es)
    }

    // ---- dates
    // date_sub('unit', a, b): complete elapsed units between a and b
    // (2-arg form stays Spark's date_sub(date, days))
    val nativeDateSub = reg.lookupFunctionBuilder(FunctionIdentifier("date_sub")).get
    def unitDiff(es: Seq[Expression]): Expression = {
      val u = litStr(es.head, "date_sub") match {
        case s => s.toLowerCase match {
          case "ms" | "millisecond" | "milliseconds" => "MILLISECOND"
          case "us" | "microsecond" | "microseconds" => "MICROSECOND"
          case "s" | "sec" | "secs" | "second" | "seconds" => "SECOND"
          case "min" | "mins" | "minute" | "minutes" => "MINUTE"
          case "h" | "hr" | "hrs" | "hour" | "hours" => "HOUR"
          case "d" | "day" | "days" => "DAY"
          case "w" | "week" | "weeks" => "WEEK"
          case "m" | "mon" | "mons" | "month" | "months" => "MONTH"
          case "q" | "quarter" | "quarters" => "QUARTER"
          case "y" | "yr" | "yrs" | "year" | "years" => "YEAR"
          case other => other.toUpperCase
        }
      }
      val a = Cast(es(1), TimestampType,
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
      val b = Cast(es(2), TimestampType,
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
      u match {
        case "MONTH" | "QUARTER" | "YEAR" =>
          // DuckDB counts complete CLAMPED month steps: datesub('month',
          // '2024-01-31', '2024-02-29') = 1 because Jan 31 + 1 month
          // clamps to Feb 29; Spark's timestampdiff requires the day of
          // month to be reached and answers 0 (fuzzer find). Count
          // lo→hi with clamped candidate check; negate when a > b.
          val div = u match { case "MONTH" => 1L; case "QUARTER" => 3L; case _ => 12L }
          def months(lo: Expression, hi: Expression): Expression = {
            val m0 = Add(Multiply(Subtract(call("year")(hi), call("year")(lo)),
              Literal(12)), Subtract(call("month")(hi), call("month")(lo)))
            val cand = org.apache.spark.sql.catalyst.expressions.TimestampAdd(
              "MONTH", m0, lo)
            If(GreaterThan(cand, hi), Subtract(m0, Literal(1)), m0)
          }
          val fwd = org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            Cast(months(a, b), LongType), Literal(div))
          val bwd = org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            Cast(months(b, a), LongType), Literal(div))
          If(LessThanOrEqual(a, b), fwd,
            org.apache.spark.sql.catalyst.expressions.UnaryMinus(bwd))
        case _ => TimestampDiff(u, a, b)
      }
    }
    fn("date_sub") {
      case es if es.length == 3 => unitDiff(es)
      case es => nativeDateSub(es)
    }
    fn("datesub")(unitDiff)
    // strftime: %W (Monday-based week 00-53) and %U (Sunday-based) are
    // COMPUTED, not pattern-expressible — compose date_format segments
    // around lpad'ed week numbers (fuzzer find: %W rendered literal 'W')
    fn("strftime") { es =>
      val x = es.head
      val fmt = litStr(es(1), "strftime")
      def weekNum(sundayBased: Boolean): Expression = {
        // a fully-resolved DATE operand (explicit zone): the lpad/
        // date_format natives are expressionBuilders that assert
        // resolved arguments at build time
        val xd = Cast(x, org.apache.spark.sql.types.DateType,
          Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
        val d0: Expression =
          if (sundayBased)
            Subtract(org.apache.spark.sql.catalyst.expressions.DayOfWeek(xd), Literal(1))
          else org.apache.spark.sql.catalyst.expressions.WeekDay(xd)
        val w = org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          Cast(Subtract(Add(org.apache.spark.sql.catalyst.expressions.DayOfYear(xd),
            Literal(6)), d0), LongType),
          Literal(7L))
        call("lpad")(Cast(w, StringType), Literal(2), str("0"))
      }
      // split the format at %W/%U markers ( %% stays literal )
      val parts = scala.collection.mutable.ArrayBuffer[scala.util.Either[String, Boolean]]()
      val seg = new StringBuilder
      var i = 0
      while (i < fmt.length) {
        if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
          fmt.charAt(i + 1) match {
            case 'W' => parts += scala.util.Left(seg.toString); seg.clear(); parts += scala.util.Right(false); i += 2
            case 'U' => parts += scala.util.Left(seg.toString); seg.clear(); parts += scala.util.Right(true); i += 2
            case c => seg.append('%').append(c); i += 2
          }
        } else { seg.append(fmt.charAt(i)); i += 1 }
      }
      parts += scala.util.Left(seg.toString)
      def dfmt(s: String): Expression =
        call("date_format")(x, Literal(UTF8String.fromString(translateStrftime(s)), StringType))
      if (!parts.exists(_.isRight)) dfmt(fmt)
      else org.apache.spark.sql.catalyst.expressions.Concat(parts.toSeq.collect {
        case scala.util.Left(s) if s.nonEmpty => dfmt(s)
        case scala.util.Right(sunday) => weekNum(sunday)
      })
    }
    // DuckDB epoch(x) is DOUBLE and keeps the sub-second fraction
    // (probed: 1710513045.123); unix_timestamp truncates (fuzzer find)
    fn("epoch")(es => Divide(
      Cast(call("unix_micros")(Cast(es.head, TimestampType)), DoubleType),
      Literal(1000000.0d)))
    // Spark's WeekDay (Monday=0) directly — the registry name
    // "weekday" is rebound below to DuckDB's Sunday=0 convention
    fn("isodow")(es => Add( // Monday=1 … Sunday=7
      org.apache.spark.sql.catalyst.expressions.WeekDay(es.head), Literal(1)))
    // DuckDB weekday/dayofweek are both Sunday=0 (probed); Spark's
    // weekday is Monday=0 (fuzzer find)
    fn("weekday")(es => Subtract(
      org.apache.spark.sql.catalyst.expressions.DayOfWeek(es.head), Literal(1)))
    fn("isoyear")(es => call("date_part")(str("YEAROFWEEK"), es.head))
    fn("decade")(es => // floor(year/10): 1999 → 199
      Cast(Divide(call("year")(es.head), Literal(10),
        evalMode = EvalMode.LEGACY), LongType, None, EvalMode.LEGACY))
    fn("week")(es => call("weekofyear")(es.head)) // ISO week in both
    fn("yearweek")(es => // ISO year·100 + ISO week: '1999-12-31' → 199952
      Add(Multiply(Cast(call("date_part")(str("YEAROFWEEK"), es.head), LongType),
        Literal(100L)), Cast(call("weekofyear")(es.head), LongType)))
    fn("century")(es => // (year+99)/100 for CE years
      Cast(Divide(Add(call("year")(es.head), Literal(99)), Literal(100),
        evalMode = EvalMode.LEGACY), LongType, None, EvalMode.LEGACY))
    fn("millennium")(es =>
      Cast(Divide(Add(call("year")(es.head), Literal(999)), Literal(1000),
        evalMode = EvalMode.LEGACY), LongType, None, EvalMode.LEGACY))
    fn("era")(es => If(LessThanOrEqual(call("year")(es.head), Literal(0)),
      Literal(0L), Literal(1L)))
    fn("epoch_us")(es => call("unix_micros")(Cast(es.head, TimestampType)))
    fn("epoch_ns")(es =>
      Multiply(call("unix_micros")(Cast(es.head, TimestampType)), Literal(1000L)))
    fn("monthname")(es => call("date_format")(es.head, str("MMMM")))
    fn("dayname")(es => call("date_format")(es.head, str("EEEE")))
    // interval constructors: make_interval(years, months, weeks, days, h, m, s)
    def mkInterval(years: Expression = Literal(0), months: Expression = Literal(0),
        weeks: Expression = Literal(0), days: Expression = Literal(0),
        hours: Expression = Literal(0), mins: Expression = Literal(0),
        secs: Expression = Cast(Literal(0), DecimalType(18, 6))): Expression =
      MakeInterval(years, months, weeks, days, hours, mins, secs, failOnError = true)
    fn("to_years")(es => mkInterval(years = es.head))
    fn("to_months")(es => mkInterval(months = es.head))
    fn("to_weeks")(es => mkInterval(weeks = es.head))
    fn("to_days")(es => mkInterval(days = es.head))
    fn("to_hours")(es => mkInterval(hours = es.head))
    fn("to_minutes")(es => mkInterval(mins = es.head))
    fn("to_seconds")(es => mkInterval(secs = Cast(es.head, DecimalType(18, 6))))
    fn("to_milliseconds")(es => mkInterval(secs =
      Cast(Divide(Cast(es.head, DoubleType), Literal(1000.0d)), DecimalType(18, 6))))
    fn("to_microseconds")(es => mkInterval(secs =
      Cast(Divide(Cast(es.head, DoubleType), Literal(1000000.0d)), DecimalType(18, 6))))

    // ---- lists
    fn("element_at")(es => ElementAtDispatch(es.head, es(1)))
    fn("map_extract")(es => ElementAtDispatch(es.head, es(1)))
    // list_unique: COUNT of distinct non-null elements (not the array)
    fn("list_unique")(es => Cast(Size(
      call("array_distinct")(ArrayFilter(es.head, lam(IsNotNull)))), LongType))
    // list_resize(l, n[, fill]): truncate or pad to n. sequence(1, 0)
    // counts DOWN ([1, 0]) and ElementAt(l, 0) always throws, so the
    // index range is clamped to ≥1 and an empty result (n ≤ 0, DuckDB
    // returns []) comes from the trailing slice instead.
    fn("list_resize") { es =>
      val fill = es.lift(2).getOrElse(Literal.create(null, NullType))
      val padded = call("transform")(
        call("sequence")(Literal(1), call("greatest")(es(1), Literal(1))), lam(i =>
          If(LessThanOrEqual(i, Size(es.head)),
            ElementAt(es.head, i, None, failOnError = false), fill)))
      call("slice")(padded, Literal(1),
        Cast(call("greatest")(es(1), Literal(0)), IntegerType))
    }
    // list_select(l, idxs): elements at the given 1-based positions;
    // ElementAtDispatch gives index 0 → NULL (plain ElementAt throws
    // even with failOnError=false), matching the element_at contract
    fn("list_select")(es => call("transform")(es(1),
      lam(i => ElementAtDispatch(es.head, i))))
    // list_where(l, mask): elements whose mask entry is true
    fn("list_where") { es =>
      val zipped = call("zip_with")(es.head, es(1), lamXY((v, m) =>
        call("named_struct")(str("v"), v, str("m"), m)))
      call("transform")(
        ArrayFilter(zipped, lam(s =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(s, str("m")))),
        lam(s => org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(s, str("v"))))
    }
    // list_grade_up: 1-based indexes that would sort the list (stable)
    fn("list_grade_up") { es =>
      val idx = call("sequence")(Literal(1), Size(es.head))
      val pairs = call("zip_with")(es.head, idx, lamXY((v, i) =>
        call("named_struct")(str("v"), v, str("i"), i)))
      call("transform")(call("array_sort")(pairs), lam(s =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(s, str("i"))))
    }
    // vector math over double lists
    def dotExpr(a: Expression, b: Expression): Expression =
      call("aggregate")(
        call("zip_with")(a, b, lamXY((x, y) =>
          Multiply(Cast(x, DoubleType), Cast(y, DoubleType)))),
        Literal(0.0d), lamXY(Add(_, _)))
    fn("list_dot_product")(es => dotExpr(es.head, es(1)))
    fn("list_inner_product")(es => dotExpr(es.head, es(1)))
    fn("list_cosine_similarity") { es =>
      Divide(dotExpr(es.head, es(1)),
        Multiply(Sqrt(dotExpr(es.head, es.head)), Sqrt(dotExpr(es(1), es(1)))))
    }
    fn("list_distance") { es =>
      Sqrt(call("aggregate")(
        call("zip_with")(es.head, es(1), lamXY((x, y) => {
          val d = Subtract(Cast(x, DoubleType), Cast(y, DoubleType))
          Multiply(d, d)
        })),
        Literal(0.0d), lamXY(Add(_, _))))
    }
    // list_reduce(l, λ): fold with the first element as the seed
    def listReduce(es: Seq[Expression]): Expression = {
      val l = es.head
      val lambda = es(1)
      val rest = Slice(l, Literal(2), call("greatest")(Subtract(Size(l), Literal(1)), Literal(0)))
      ArrayAggregate(rest, ElementAt(l, Literal(1), None, failOnError = false),
        lambda.asInstanceOf[LambdaFunction], lam(identity).asInstanceOf[LambdaFunction])
    }
    fn("list_reduce")(listReduce)
    val nativeReduce = reg.lookupFunctionBuilder(FunctionIdentifier("reduce")).get
    fn("reduce") {
      case es if es.length == 2 => listReduce(es)
      case es => nativeReduce(es)
    }
    // aggregate(l, 'name') → list_aggregate; 3+ args → Spark's fold
    val nativeAggregate = reg.lookupFunctionBuilder(FunctionIdentifier("aggregate")).get
    val listAggBuilder = reg.lookupFunctionBuilder(FunctionIdentifier("list_aggregate")).get
    fn("aggregate") {
      case es if es.length == 2 => listAggBuilder(es)
      case es => nativeAggregate(es)
    }
    fn("list_avg")(es => listAggBuilder(Seq(es.head, str("avg"))))
    // list_sort(l[, 'ASC'|'DESC'[, 'NULLS FIRST'|'NULLS LAST']]):
    // DuckDB's default null order is NULLS FIRST in BOTH directions,
    // while Spark's sort_array pins nulls first only ascending — the
    // mismatched combinations split out the NULLs and concat them on
    // the right end.
    val nativeSortArray = reg.lookupFunctionBuilder(FunctionIdentifier("sort_array")).get
    def listSorted(l: Expression, asc: Boolean, nullsFirst: Boolean): Expression =
      if (asc == nullsFirst) nativeSortArray(Seq(l, Literal(asc)))
      else {
        val nulls = ArrayFilter(l, lam(IsNull))
        val sorted = nativeSortArray(Seq(ArrayFilter(l, lam(IsNotNull)), Literal(asc)))
        // native Concat (array form); the registry's "concat" is the
        // rebound NULL-skipping string concat
        if (nullsFirst) org.apache.spark.sql.catalyst.expressions.Concat(Seq(nulls, sorted))
        else org.apache.spark.sql.catalyst.expressions.Concat(Seq(sorted, nulls))
      }
    def nullOrderOf(e: Expression, fn: String): Boolean =
      !litStr(e, fn).trim.toUpperCase.endsWith("LAST")
    fn("list_sort") {
      case Seq(l) => listSorted(l, asc = true, nullsFirst = true)
      case Seq(l, o) =>
        listSorted(l, !litStr(o, "list_sort").trim.toUpperCase.startsWith("DESC"),
          nullsFirst = true)
      case Seq(l, o, no) =>
        listSorted(l, !litStr(o, "list_sort").trim.toUpperCase.startsWith("DESC"),
          nullOrderOf(no, "list_sort"))
      case es => nativeSortArray(es)
    }
    fn("sort_array") {
      case Seq(l, o @ Literal(_: UTF8String, StringType)) =>
        listSorted(l, !litStr(o, "sort_array").trim.toUpperCase.startsWith("DESC"),
          nullsFirst = true)
      case es => nativeSortArray(es)
    }

    // ---- structs
    fn("row")(es => CreateStruct(es))
    // struct_insert(s, 'name1', v1, …) — the := forms are rewritten to
    // name/value pairs by the server layer before parsing
    fn("struct_insert") { es =>
      val ops = es.drop(1).grouped(2).map {
        case Seq(n, v) => WithField(litStr(n, "struct_insert"), v)
        case other => throw new IllegalArgumentException(
          s"struct_insert: expected name/value pairs, got $other")
      }.toSeq
      UpdateFields(es.head, ops)
    }

    // ---- aggregates
    // group_concat/string_agg/listagg default separator is ',' in DuckDB
    val nativeListAgg = reg.lookupFunctionBuilder(FunctionIdentifier("listagg")).get
    def stringAgg(es: Seq[Expression]): Expression =
      nativeListAgg(if (es.length == 1) es :+ str(",") else es)
    fn("group_concat")(stringAgg)
    fn("string_agg")(stringAgg)
    fn("listagg")(stringAgg)
    // reservoir_quantile: approximate; sampling arg ignored (we keep the
    // deterministic discrete quantile — a superset of the contract)
    val quantileDiscB = reg.lookupFunctionBuilder(FunctionIdentifier("quantile_disc")).get
    fn("reservoir_quantile")(es => quantileDiscB(es.take(2)))
    // mad: median(|x - median(x)|), interpolated (buffering aggregate,
    // same shape as DuckDB's own implementation; for the 100 TB path use
    // approx_quantile twice)
    fn("mad") { es =>
      val l = aggCall("collect_list")(Cast(es.head, DoubleType))
      def interpMedian(arr: Expression): Expression = {
        val sorted = call("array_sort")(arr)
        val n = Size(sorted)
        val lo = ElementAt(sorted, Cast(Divide(Add(n, Literal(1)), Literal(2),
          evalMode = EvalMode.LEGACY), IntegerType, None, EvalMode.LEGACY), None, failOnError = false)
        val hi = ElementAt(sorted, Cast(Divide(Add(n, Literal(2)), Literal(2),
          evalMode = EvalMode.LEGACY), IntegerType, None, EvalMode.LEGACY), None, failOnError = false)
        Divide(Add(lo, hi), Literal(2.0d))
      }
      val med = interpMedian(l)
      // all-NULL group → empty list → index 0 error; DuckDB gives NULL
      If(EqualTo(Size(l), Literal(0)), Literal.create(null, DoubleType),
        interpMedian(call("transform")(l, lam(x => Abs(Subtract(x, med))))))
    }
    // DuckDB skewness/kurtosis are SAMPLE-corrected; Spark's are
    // population moments — correct them from (g, n)
    val nativeSkewness = reg.lookupFunctionBuilder(FunctionIdentifier("skewness")).get
    val nativeKurtosis = reg.lookupFunctionBuilder(FunctionIdentifier("kurtosis")).get
    def aggWrap(e: Expression): Expression = e match {
      case a: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction =>
        a.toAggregateExpression()
      case other => other
    }
    // Degenerate groups give NULL like DuckDB (probed: n<3 / n<4 and
    // zero variance are all NULL) — the unguarded correction divides
    // by (n-2)/(n-3), an ANSI divide-by-zero error (fuzzer find).
    val nullD = Literal.create(null, DoubleType)
    fn("skewness") { es =>
      val g1 = aggWrap(nativeSkewness(es))
      val n = Cast(aggCall("count")(es.head), DoubleType)
      If(LessThan(n, Literal(3.0d)), nullD,
        Multiply(g1, Divide(Sqrt(Multiply(n, Subtract(n, Literal(1.0d)))),
          Subtract(n, Literal(2.0d)))))
    }
    fn("kurtosis") { es =>
      val g2 = aggWrap(nativeKurtosis(es))
      val n = Cast(aggCall("count")(es.head), DoubleType)
      If(LessThan(n, Literal(4.0d)), nullD,
        Multiply(
          Divide(Subtract(n, Literal(1.0d)),
            Multiply(Subtract(n, Literal(2.0d)), Subtract(n, Literal(3.0d)))),
          Add(Multiply(Add(n, Literal(1.0d)), g2), Literal(6.0d))))
    }
    // corr: Spark's native divides ck / sqrt(xMk·yMk) — a zero-variance
    // side is an ANSI divide-by-zero error where DuckDB returns NULL
    // (fuzzer find). Rebuilt from covar_pop / stddev_pop over the
    // PAIRWISE-non-null rows with a NULLIF'd denominator.
    fn("corr") { es =>
      val x = Cast(es.head, DoubleType)
      val y = Cast(es(1), DoubleType)
      val px = If(IsNull(y), nullD, x)
      val py = If(IsNull(x), nullD, y)
      Divide(aggCall("covar_pop")(x, y),
        call("nullif")(Multiply(aggCall("stddev_pop")(px), aggCall("stddev_pop")(py)),
          Literal(0.0d)))
    }
    // bitstring_agg(x, min, max): '1' bits at the observed positions
    // over [min, max] (explicit-bounds form; DuckDB's 1-arg form needs
    // table statistics and raises the same guidance error we defer to)
    fn("bitstring_agg") { es =>
      if (es.length < 3) throw new IllegalArgumentException(
        "bitstring_agg: provide explicit bounds — bitstring_agg(col, min, max)")
      val seen = aggCall("collect_set")(Cast(es.head, LongType))
      call("array_join")(
        call("transform")(call("sequence")(Cast(es(1), LongType), Cast(es(2), LongType)),
          lam(i => If(ArrayContains(seen, i), str("1"), str("0")))),
        str(""))
    }
  }

  /** Third probed batch (round 5): DuckDB surface the dialect probe
    * found unreachable — 1-based subscripts/slices (wired in by the
    * server's bracket rewrite), the JSON function family (built over
    * Spark's get_json_object / to_json natives plus one Jackson-based
    * merge-patch expression), and two date-function semantic nits. */
  private def registerProbedBatch3(
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._

    def call(name: String)(args: Expression*): Expression =
      reg.lookupFunctionBuilder(FunctionIdentifier(name)).get(args)
    def aggCall(name: String)(args: Expression*): Expression =
      call(name)(args: _*) match {
        case a: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction =>
          a.toAggregateExpression()
        case other => other
      }
    def str(s: String): Expression = Literal(UTF8String.fromString(s), StringType)
    def fn(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")

    // ---- subscripts (the server bracket rewrite emits these)
    fn("graft_subscript")(es => ElementAtDispatch(es.head, es(1)))
    fn("graft_slice")(es => GraftSlice(es.head, es(1), es(2)))

    // ---- JSON family over get_json_object / to_json natives
    // DuckDB json_extract('j','k') walks key k ('$'-paths pass through);
    // -> / ->> rewrite to these. Divergence note: for string values ->
    // returns the quoted JSON in DuckDB while get_json_object unquotes —
    // ->> semantics — acceptable for text-protocol clients.
    def jsonPath(e: Expression): Expression = e match {
      case Literal(s: UTF8String, StringType) =>
        val p = s.toString
        str(if (p.startsWith("$")) p
        else if (p.startsWith("/")) "$" + p.replace("/", ".") // JSON-pointer form
        else "$." + p)
      case other => Concat(Seq(str("$."), Cast(other, StringType)))
    }
    fn("json_extract")(es => call("get_json_object")(es.head, jsonPath(es(1))))
    fn("json_extract_string")(es => call("get_json_object")(es.head, jsonPath(es(1))))
    fn("json_extract_path")(es => call("get_json_object")(es.head, jsonPath(es(1))))
    fn("json_extract_path_text")(es => call("get_json_object")(es.head, jsonPath(es(1))))
    fn("json_keys")(es => call("json_object_keys")(es.head))
    // get_json_object returns NULL iff the document doesn't parse
    fn("json_valid")(es => IsNotNull(call("get_json_object")(es.head, str("$"))))
    fn("json_merge_patch")(es => es.reduceLeft(JsonMergePatch))
    fn("json_object") { es =>
      if (es.isEmpty) str("{}") else call("to_json")(CreateNamedStruct(es))
    }
    fn("json_array") { es =>
      if (es.isEmpty) str("[]") else call("to_json")(CreateArray(es))
    }
    // json_quote(v): JSON-encode one scalar — encode [v] and strip the
    // array brackets (robust for any payload, no hand-escaping)
    fn("json_quote") { es =>
      val arr = call("to_json")(CreateArray(Seq(es.head)))
      Substring(arr, Literal(2), Subtract(Length(arr), Literal(2)))
    }
    fn("json_type") { es =>
      val t = StringTrim(es.head)
      CaseWhen(Seq(
        (StartsWith(t, str("{")), str("OBJECT")),
        (StartsWith(t, str("[")), str("ARRAY")),
        (StartsWith(t, str("\"")), str("VARCHAR")),
        (In(t, Seq(str("true"), str("false"))), str("BOOLEAN")),
        (EqualTo(t, str("null")), str("NULL")),
        (RLike(t, str("^-?[0-9]+$")), str("BIGINT")),
        (RLike(t, str("^-?[0-9]*\\.?[0-9]+([eE][+-]?[0-9]+)?$")), str("DOUBLE"))),
        Literal.create(null, StringType))
    }
    fn("json_contains")(es => JsonContains(es.head, es(1)))
    // DuckDB's JSON-form schemas ('["BIGINT"]', '{"a":"VARCHAR"}') →
    // Spark DDL type strings, for from_json / json_transform
    def duckSchemaToDdl(json: String): Option[String] = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def conv(n: com.fasterxml.jackson.databind.JsonNode): String =
        if (n.isTextual) n.asText.trim.toLowerCase match {
          case "varchar" | "text" | "json" => "string"
          case "bigint" | "int64" | "long" => "bigint"
          case "integer" | "int" | "int32" => "int"
          case "smallint" | "int16" => "smallint"
          case "tinyint" | "int8" => "tinyint"
          case "double" | "float8" => "double"
          case "real" | "float" | "float4" => "float"
          case "boolean" | "bool" => "boolean"
          case "hugeint" => "decimal(38,0)"
          case other => other // date/timestamp/decimal(p,s) pass through
        }
        else if (n.isArray && n.size == 1) s"array<${conv(n.get(0))}>"
        else if (n.isObject) {
          val it = n.fields()
          val fs = scala.collection.mutable.ListBuffer[String]()
          while (it.hasNext) { val e = it.next(); fs += s"${e.getKey}:${conv(e.getValue)}" }
          fs.mkString("struct<", ",", ">")
        } else throw new IllegalArgumentException(s"unsupported JSON schema: $n")
      try Some(conv(mapper.readTree(json))) catch { case _: Exception => None }
    }
    val nativeFromJson = reg.lookupFunctionBuilder(FunctionIdentifier("from_json")).get
    def fromJsonDuck(es: Seq[Expression]): Expression = es match {
      case Seq(j, Literal(s: UTF8String, StringType))
          if { val t = s.toString.trim; t.startsWith("[") || t.startsWith("{") } =>
        duckSchemaToDdl(s.toString) match {
          case Some(ddl) => nativeFromJson(Seq(j, str(ddl)))
          case None => nativeFromJson(es)
        }
      case other => nativeFromJson(other)
    }
    fn("from_json")(fromJsonDuck)
    fn("json_transform")(fromJsonDuck)
    fn("json_group_array")(es => call("to_json")(aggCall("collect_list")(es.head)))
    fn("json_group_object")(es => call("to_json")(
      call("map_from_entries")(aggCall("collect_list")(
        CreateNamedStruct(Seq(str("key"), es.head, str("value"), es(1)))))))

    // ---- operator support (the server's operator rewrite emits these)
    // a @> b / a <@ b: every element of `sub` present in `container`
    fn("graft_list_has_all")(es =>
      EqualTo(Size(call("array_except")(es(1), es.head)), Literal(0)))
    fn("list_has_all")(es =>
      EqualTo(Size(call("array_except")(es(1), es.head)), Literal(0)))
    fn("array_has_all")(es =>
      EqualTo(Size(call("array_except")(es(1), es.head)), Literal(0)))
    fn("list_has_any")(es => call("arrays_overlap")(es.head, es(1)))
    fn("array_has_any")(es => call("arrays_overlap")(es.head, es(1)))

    // graft_regexp_replace: DuckDB replaces the FIRST match unless
    // options contain 'g' — Spark's native is global-only (silent 3-arg
    // divergence found by the probe battery). Registered under an
    // internal name that Engine.rewrite substitutes on the SQL WIRE
    // path only: in Spark 4 the Column API (functions.regexp_replace)
    // ALSO resolves through this registry by name, so overriding the
    // public name would silently flip the whole Scala query corpus to
    // first-match semantics (caught by the oracle sweep).
    fn("graft_regexp_replace")(es => RegexpReplaceDuck(es))

    // make_time(h, m, s): Spark has no TIME type — render the wire text.
    // Seconds keep their fraction the way DuckDB prints it (trailing
    // zeros trimmed: 45.5 -> "45.5", 45 -> "45"): format to 6-digit
    // micros, strip trailing zeros, then a trailing dot.
    fn("make_time")(es => call("format_string")(str("%02d:%02d:%s"),
      Cast(es(0), IntegerType), Cast(es(1), IntegerType),
      call("regexp_replace")(
        call("regexp_replace")(
          call("format_string")(str("%09.6f"), Cast(es(2), DoubleType)),
          str("0+$"), str("")),
        str("\\.$"), str(""))))

    // ---- date-function semantics
    // DuckDB dayofweek: Sunday=0 … Saturday=6 (Spark native: Sunday=1)
    val nativeDow = reg.lookupFunctionBuilder(FunctionIdentifier("dayofweek")).get
    fn("dayofweek")(es => Subtract(nativeDow(es), Literal(1)))
    // date_part(['year','month'], x) list form → struct of parts
    val nativeDatePart = reg.lookupFunctionBuilder(FunctionIdentifier("date_part")).get
    // one part, DuckDB unit spellings translated (fuzzer finds): dow/
    // weekday are Sunday=0 (Spark: Sun=1 / unsupported), isodow is
    // Monday=1..Sunday=7, isoyear→YEAROFWEEK, epoch keeps the fraction,
    // millisecond/microsecond include the seconds, and the PG-ish
    // millennium/century/decade/era fields aren't Spark extract fields
    val TZ = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    def partOne(u0: Expression, x: Expression): Expression = u0 match {
      case Literal(u: UTF8String, StringType) => u.toString.toLowerCase match {
        case "dow" | "dayofweek" | "weekday" =>
          Subtract(org.apache.spark.sql.catalyst.expressions.DayOfWeek(x), Literal(1))
        case "isodow" =>
          Add(org.apache.spark.sql.catalyst.expressions.WeekDay(x), Literal(1))
        case "isoyear" => nativeDatePart(Seq(str("YEAROFWEEK"), x))
        case "century" => call("century")(x)
        case "millennium" => call("millennium")(x)
        case "decade" => call("decade")(x)
        case "era" => call("era")(x)
        case "epoch" => call("epoch")(x)
        case "second" | "seconds" =>
          // DuckDB extract(second) is integral; Spark's keeps fraction.
          // Casts born with the session zone — an expressionBuilder
          // native ASSERTS its arguments are already resolved, and a
          // zoneless temporal Cast is not
          Cast(nativeDatePart(Seq(str("SECOND"), Cast(x, TimestampType, TZ))),
            LongType, None, EvalMode.LEGACY)
        case "milliseconds" | "millisecond" =>
          Cast(Multiply(Cast(nativeDatePart(Seq(str("SECOND"), Cast(x, TimestampType, TZ))),
            DoubleType), Literal(1000.0d)), LongType, None, EvalMode.LEGACY)
        case "microseconds" | "microsecond" =>
          Cast(Multiply(Cast(nativeDatePart(Seq(str("SECOND"), Cast(x, TimestampType, TZ))),
            DoubleType), Literal(1000000.0d)), LongType, None, EvalMode.LEGACY)
        case _ => nativeDatePart(Seq(u0, x))
      }
      case _ => nativeDatePart(Seq(u0, x))
    }
    fn("date_part") { es =>
      val parts = es.head match {
        case CreateArray(children, _) => Some(children)
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
            if u.nameParts.map(_.toLowerCase) == Seq("array") => Some(u.arguments)
        case _ => None
      }
      parts match {
        case Some(ps) if ps.nonEmpty && ps.forall {
            case Literal(_: UTF8String, StringType) => true; case _ => false } =>
          CreateNamedStruct(ps.flatMap(p => Seq(p, partOne(p, es(1)))).toSeq)
        case _ if es.length == 2 => partOne(es.head, es(1))
        case _ => nativeDatePart(es)
      }
    }
    // EXTRACT(field FROM x) resolves through the registry's "extract";
    // route it through the same unit translation
    val nativeExtract = reg.lookupFunctionBuilder(FunctionIdentifier("extract")).get
    fn("extract") {
      case Seq(u, x) => partOne(u, x)
      case es => nativeExtract(es)
    }
    // DuckDB date_trunc keeps DATE inputs DATE
    val nativeDateTrunc = reg.lookupFunctionBuilder(FunctionIdentifier("date_trunc")).get
    fn("date_trunc") {
      case Seq(f, x) => DateTruncDispatch(f, x)
      case es => nativeDateTrunc(es)
    }
  }
}
