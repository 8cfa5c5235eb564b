package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, And, ArrayAggregate, ArrayFilter, ArrayJoin, ArrayMax, ArrayMin, Cast, DateAdd, Divide, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, If, IsNotNull, LambdaFunction, LessThan, LessThanOrEqual, Literal, Multiply, Not, Or, Size, Slice, SortArray, Subtract, TimestampDiff, TruncTimestamp, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.types.{CalendarIntervalType, DayTimeIntervalType, DoubleType, NullType, TimestampType, YearMonthIntervalType}
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
      ("format", "format_string", id),
      ("printf", "format_string", id),
      // list family (DuckDB list_* → Spark array functions; both 1-based)
      ("list_value", "array", id),
      ("list_pack", "array", id),
      ("list_extract", "element_at", id),
      ("list_element", "element_at", id),
      ("list_contains", "array_contains", id),
      ("list_has", "array_contains", id),
      ("array_length", "size", id),
      ("list_concat", "concat", id),
      ("list_cat", "concat", id),
      ("list_distinct", "array_distinct", id),
      ("list_unique", "array_distinct", id),
      ("list_sort", "sort_array", id),
      ("list_transform", "transform", id),
      ("list_apply", "transform", id),
      ("list_filter", "filter", id),
      ("array_position", "array_position", id),
      ("list_position", "array_position", id),
      ("list_indexof", "array_position", id),
      ("list_min", "array_min", id),
      ("list_append", "array_append", id),
      ("list_prepend", "array_prepend", es => Seq(es(1), es.head)),
      ("list_max", "array_max", id),
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
      // json
      ("json_extract", "get_json_object", id),
      ("json_extract_string", "get_json_object", id),
      ("json_array_length", "json_array_length", id),
      ("json_structure", "schema_of_json", id),
      // hash / crypto
      ("sha256", "sha2", es => es :+ Literal(256)),
      ("hash", "xxhash64", id),
      // date/time
      ("strftime", "date_format",
        es => Seq(es.head, Literal(UTF8String.fromString(
          translateStrftime(litString(es(1), "strftime"))), StringType))),
      ("strptime", "to_timestamp",
        es => Seq(es.head, Literal(UTF8String.fromString(
          translateStrftime(litString(es(1), "strptime"))), StringType))),
      ("epoch", "unix_timestamp", id),
      ("epoch_ms", "unix_millis", id),
      ("dayname", "dayname", id),
      ("monthname", "monthname", id),
      // aggregates (probed batch: DuckDB names over Spark natives)
      ("list", "collect_list", id),
      ("countif", "count_if", id),
      ("favg", "avg", id),   // Kahan-compensated in DuckDB; double avg here
      ("fsum", "sum", id),
      ("arg_min", "min_by", id),
      ("arg_max", "max_by", id),
      ("argmin", "min_by", id),
      ("argmax", "max_by", id),
      ("approx_quantile", "percentile_approx", id),
      ("quantile_cont", "percentile", id),
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
        ArrayJoin(list, sep, None)
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
    ("timezone", _ => Literal(UTF8String.fromString("utc"), StringType))
  )

  def registerAll(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry

    reg.createOrReplaceTempFunction("typeof", es => TypeOf(es.head), "scala_udf")
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
      val x = Cast(es.head, DoubleType)
      And(Not(call("isnan")(x)),
        And(Not(EqualTo(x, Literal(Double.PositiveInfinity))),
          Not(EqualTo(x, Literal(Double.NegativeInfinity)))))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("regexp_full_match", es => {
      val anchored = call("concat")(str("^(?:"), es(1), str(")$"))
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
      call("element_at")(call("array_sort")(l), idx)
    }
    reg.createOrReplaceTempFunction("quantile_disc", quantileDisc, "scala_udf")
    reg.createOrReplaceTempFunction("quantile", quantileDisc, "scala_udf")
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
  }
}
