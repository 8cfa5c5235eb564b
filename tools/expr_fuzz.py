#!/usr/bin/env python3
"""Differential expression fuzzer: generate random, deterministic scalar
expressions from a typed grammar, evaluate each as `SELECT <expr> AS v`
in BOTH the embedded DuckDB oracle and the live graft PG server, and
diff the rendered text (same normalization ladder as dialect_probe).

The battery in dialect_probe.py is hand-curated; this sweeps the
combinatorial space around it. Seeded — a failure report names the seed
and the statement, so every find is replayable and can be promoted to a
probe-battery regression line.

Usage: python3 tools/expr_fuzz.py [port] [n_exprs] [seed]
"""
import random
import sys

import duckdb

from dialect_probe import run_duck, run_pg, norm, canon

# ---------------------------------------------------------------- grammar

STR_POOL = [
    "''", "'a'", "'abc'", "'a b c'", "'Hello, World'", "'x%y_z'",
    "'MiXeD Case'", "'  padded  '", "'O''Brien'", "'tab\tchar'",
    "'héllo wörld'", "'123'", "'-42'", "'3.14'", "'not a number'",
    "'a,b,c'", "'aaa'",
]

DATE_POOL = ["date '2024-03-15'", "date '1999-12-31'", "date '2024-02-29'"]


def lit(r, ty):
    if ty == "int":
        return str(r.choice([0, 1, -1, 2, 7, -13, 42, 100, 999, -1000]))
    if ty == "double":
        return repr(round(r.uniform(-100, 100), 3))
    if ty == "str":
        return r.choice(STR_POOL)
    if ty == "bool":
        return r.choice(["true", "false"])
    raise AssertionError(ty)


def gen(r, ty, depth):
    """Return SQL text of an expression of type `ty`."""
    if depth <= 0 or r.random() < 0.25:
        # NULL sometimes, typed literal otherwise
        if r.random() < 0.08:
            return f"CAST(NULL AS {dict(int='BIGINT', double='DOUBLE', str='VARCHAR', bool='BOOLEAN')[ty]})"
        return lit(r, ty)
    d = depth - 1
    if ty == "int":
        return r.choice([
            lambda: f"({gen(r, 'int', d)} + {gen(r, 'int', d)})",
            lambda: f"({gen(r, 'int', d)} - {gen(r, 'int', d)})",
            lambda: f"abs({gen(r, 'int', d)})",
            lambda: f"length({gen(r, 'str', d)})",
            lambda: f"greatest({gen(r, 'int', d)}, {gen(r, 'int', d)})",
            lambda: f"least({gen(r, 'int', d)}, {gen(r, 'int', d)})",
            lambda: f"strpos({gen(r, 'str', d)}, {gen(r, 'str', d)})",
            lambda: f"sign({gen(r, 'int', d)})",
            lambda: f"coalesce({gen(r, 'int', d)}, {gen(r, 'int', d)})",
            lambda: f"nullif({gen(r, 'int', d)}, {gen(r, 'int', d)})",
            lambda: f"(CASE WHEN {gen(r, 'bool', d)} THEN {gen(r, 'int', d)} ELSE {gen(r, 'int', d)} END)",
            lambda: f"CAST(round({gen(r, 'double', d)}) AS BIGINT)",
            lambda: f"floor({gen(r, 'double', d)})",
            lambda: f"ceil({gen(r, 'double', d)})",
            lambda: f"date_part('day', {r.choice(DATE_POOL)})",
            lambda: f"date_part('month', {r.choice(DATE_POOL)})",
            lambda: f"year({r.choice(DATE_POOL)})",
            lambda: f"({gen(r, 'int', d)} % {r.choice([2, 3, 7, -5, 10])})",
            lambda: f"({gen(r, 'int', d)} // {r.choice([2, 3, 7, -4])})",
            lambda: f"len([{gen(r, 'int', d)}, {gen(r, 'int', d)}, {gen(r, 'int', d)}])",
            lambda: f"[{gen(r, 'int', d)}, {gen(r, 'int', d)}][{r.randint(1, 2)}]",
            lambda: f"TRY_CAST({gen(r, 'str', d)} AS BIGINT)",
            lambda: f"date_diff('day', {r.choice(DATE_POOL)}, {r.choice(DATE_POOL)})",
            lambda: f"datepart('doy', {r.choice(DATE_POOL)})",
            lambda: f"list_position([{gen(r, 'int', d)}, {gen(r, 'int', d)}], {gen(r, 'int', d)})",
        ])()
    if ty == "double":
        return r.choice([
            lambda: f"({gen(r, 'double', d)} + {gen(r, 'double', d)})",
            lambda: f"({gen(r, 'double', d)} * 0.5)",
            lambda: f"abs({gen(r, 'double', d)})",
            lambda: f"round({gen(r, 'double', d)}, {r.randint(0, 4)})",
            lambda: f"sqrt(abs({gen(r, 'double', d)}))",
            lambda: f"ln(abs({gen(r, 'double', d)}) + 1.0)",
            lambda: f"coalesce({gen(r, 'double', d)}, {gen(r, 'double', d)})",
            lambda: f"(CASE WHEN {gen(r, 'bool', d)} THEN {gen(r, 'double', d)} ELSE {gen(r, 'double', d)} END)",
            lambda: f"CAST({gen(r, 'int', d)} AS DOUBLE)",
        ])()
    if ty == "str":
        return r.choice([
            lambda: f"upper({gen(r, 'str', d)})",
            lambda: f"lower({gen(r, 'str', d)})",
            lambda: f"trim({gen(r, 'str', d)})",
            lambda: f"reverse({gen(r, 'str', d)})",
            lambda: f"({gen(r, 'str', d)} || {gen(r, 'str', d)})",
            lambda: f"concat({gen(r, 'str', d)}, {gen(r, 'str', d)})",
            lambda: f"substr({gen(r, 'str', d)}, {r.randint(1, 4)}, {r.randint(0, 5)})",
            lambda: f"replace({gen(r, 'str', d)}, {r.choice(STR_POOL)}, {r.choice(STR_POOL)})",
            lambda: f"left({gen(r, 'str', d)}, {r.randint(0, 5)})",
            lambda: f"right({gen(r, 'str', d)}, {r.randint(0, 5)})",
            lambda: f"lpad({gen(r, 'str', d)}, {r.randint(0, 8)}, '*')",
            lambda: f"rpad({gen(r, 'str', d)}, {r.randint(0, 8)}, '-')",
            lambda: f"repeat({r.choice(STR_POOL)}, {r.randint(0, 3)})",
            lambda: f"split_part({gen(r, 'str', d)}, ',', {r.randint(1, 3)})",
            lambda: f"ltrim({gen(r, 'str', d)})",
            lambda: f"rtrim({gen(r, 'str', d)})",
            lambda: f"coalesce({gen(r, 'str', d)}, {gen(r, 'str', d)})",
            lambda: f"nullif({gen(r, 'str', d)}, {gen(r, 'str', d)})",
            lambda: f"(CASE WHEN {gen(r, 'bool', d)} THEN {gen(r, 'str', d)} ELSE {gen(r, 'str', d)} END)",
            lambda: f"CAST({gen(r, 'int', d)} AS VARCHAR)",
            lambda: f"strftime({r.choice(DATE_POOL)}, '%Y-%m-%d')",
            lambda: f"strftime({r.choice(DATE_POOL)} + INTERVAL {r.randint(1, 40)} DAY, '%Y-%m-%d')",
            lambda: f"regexp_replace({gen(r, 'str', d)}, '[aeiou]', '#')",
            lambda: f"regexp_replace({gen(r, 'str', d)}, '[aeiou]', '#', 'g')",
            lambda: f"regexp_extract({gen(r, 'str', d)}, '([a-z]+)', 1)",
            lambda: f"list_aggregate([{gen(r, 'str', d)}, {gen(r, 'str', d)}], 'string_agg', '/')",
            lambda: f"array_to_string([{gen(r, 'str', d)}, {gen(r, 'str', d)}], '+')",
            lambda: f"md5({gen(r, 'str', d)})",
            lambda: f"format('{{}}-{{}}', {gen(r, 'int', d)}, {gen(r, 'str', d)})",
            lambda: f"string_split({gen(r, 'str', d)}, ' ')[{r.randint(1, 2)}]",
            lambda: f"last_day({r.choice(DATE_POOL)})::VARCHAR",
            lambda: f"monthname({r.choice(DATE_POOL)})",
        ])()
    if ty == "bool":
        return r.choice([
            lambda: f"({gen(r, 'int', d)} < {gen(r, 'int', d)})",
            lambda: f"({gen(r, 'int', d)} = {gen(r, 'int', d)})",
            lambda: f"({gen(r, 'str', d)} = {gen(r, 'str', d)})",
            lambda: f"({gen(r, 'str', d)} LIKE '%a%')",
            lambda: f"({gen(r, 'bool', d)} AND {gen(r, 'bool', d)})",
            lambda: f"({gen(r, 'bool', d)} OR {gen(r, 'bool', d)})",
            lambda: f"(NOT {gen(r, 'bool', d)})",
            lambda: f"({gen(r, 'str', d)} IS NULL)",
            lambda: f"({gen(r, 'int', d)} IS DISTINCT FROM {gen(r, 'int', d)})",
            lambda: f"contains({gen(r, 'str', d)}, {gen(r, 'str', d)})",
            lambda: f"starts_with({gen(r, 'str', d)}, {gen(r, 'str', d)})",
            lambda: f"({gen(r, 'str', d)} GLOB '*a*')",
            lambda: f"({gen(r, 'str', d)} LIKE '{r.choice(['a%', '%c', '_b%', '%a b%', '%'])}')",
            lambda: f"({gen(r, 'str', d)} SIMILAR TO '[a-z ]*')",
            lambda: f"regexp_matches({gen(r, 'str', d)}, '{r.choice(['[0-9]+', '^a', 'b$', '[A-Z]', chr(92) + chr(92) + 'd'])}')",
            lambda: f"({gen(r, 'int', d)} IN ({gen(r, 'int', d)}, {gen(r, 'int', d)}, {gen(r, 'int', d)}))",
            lambda: f"({gen(r, 'int', d)} BETWEEN -10 AND {r.randint(0, 50)})",
            lambda: f"list_contains([{gen(r, 'int', d)}, {gen(r, 'int', d)}], {gen(r, 'int', d)})",
            lambda: f"({gen(r, 'str', d)} ~ '[ab]')",
        ])()
    raise AssertionError(ty)


# ------------------------------------------------------- agg / window

def gen_values_table(r, ncols_note="(i int, j int, d double, s str, b bool)"):
    """A small VALUES table with NULLs sprinkled in. Ordering key `k`
    is unique so order-sensitive constructs are deterministic."""
    n = r.randint(3, 9)
    rows = []
    for k in range(n):
        i = "NULL" if r.random() < 0.15 else str(r.choice([0, 1, -1, 2, 5, -7, 10, 42]))
        j = "NULL" if r.random() < 0.15 else str(r.choice([1, 2, 3, -4, 8]))
        d = "NULL" if r.random() < 0.15 else repr(round(r.uniform(-20, 20), 2))
        s = "NULL" if r.random() < 0.15 else r.choice(
            ["'a'", "'b'", "'c'", "'ab'", "'zz'", "''", "'x y'"])
        b = "NULL" if r.random() < 0.15 else r.choice(["true", "false"])
        rows.append(f"({k}, {i}, {j}, {d}, {s}, {b})")
    return f"(VALUES {', '.join(rows)}) t(k, i, j, d, s, b)"


AGGS = [
    "count(*)", "count(i)", "count(distinct i)", "count(distinct s)",
    "sum(i)", "sum(distinct i)", "avg(i)", "min(i)", "max(i)",
    "min(s)", "max(s)", "sum(d)", "avg(d)",
    "bool_and(b)", "bool_or(b)",
    "bit_and(i)", "bit_or(i)", "bit_xor(i)",
    "string_agg(s, ',' order by s)", "string_agg(s, '|' order by s desc)",
    "median(i)", "median(d)",
    "quantile_cont(i, 0.5)", "quantile_disc(i, 0.25)", "quantile_cont(d, 0.75)",
    "var_pop(i)", "var_samp(d)", "stddev_pop(d)", "stddev_samp(i)",
    "corr(i, j)", "covar_pop(i, j)", "covar_samp(i, j)",
    "arg_min(s, k)", "arg_max(s, k)",
    "product(j)", "entropy(s)", "mad(i)",
    "skewness(d)", "kurtosis(d)",
    "sum(i) FILTER (WHERE b)", "count(*) FILTER (WHERE i > 0)",
    "avg(d) FILTER (WHERE s IS NOT NULL)",
    "list(i order by k)", "list(s order by k)",
    "first(i order by k)", "last(s order by k)",
    "any_value(i order by k)",
]


def gen_agg(r):
    tbl = gen_values_table(r)
    picks = r.sample(AGGS, r.randint(1, 3))
    cols = ", ".join(f"{a} as c{n}" for n, a in enumerate(picks))
    if r.random() < 0.4:
        # grouped: low-card group key, ordered output
        return (f"select coalesce(j, -999) as g, {cols} from {tbl} "
                f"group by 1 order by 1")
    return f"select {cols} from {tbl}"


WINS = [
    "row_number() over (order by k)",
    "rank() over (order by i nulls first, k)",
    "dense_rank() over (order by coalesce(i, -999))",
    "ntile(2) over (order by k)",
    "lag(i, 1) over (order by k)",
    "lag(i, 1, -99) over (order by k)",
    "lead(s) over (order by k)",
    "sum(i) over (order by k rows between 1 preceding and current row)",
    "sum(i) over (order by k rows between unbounded preceding and current row)",
    "avg(d) over (order by k rows between current row and 2 following)",
    "min(i) over (partition by j order by k)",
    "max(i) over (partition by b)",
    "count(*) over (partition by j)",
    "first_value(s) over (order by k)",
    "last_value(i) over (order by k rows between unbounded preceding and unbounded following)",
    "nth_value(s, 2) over (order by k rows between unbounded preceding and unbounded following)",
    "percent_rank() over (order by k)",
    "cume_dist() over (order by k)",
    "sum(i) over ()",
]


def gen_window(r):
    tbl = gen_values_table(r)
    picks = r.sample(WINS, r.randint(1, 2))
    cols = ", ".join(f"{w} as w{n}" for n, w in enumerate(picks))
    return f"select k, {cols} from {tbl} order by k"


# Known, intentional divergences (same contract as dialect_probe's
# DOCUMENTED map, but pattern-shaped since statements are generated):
#  - DuckDB's format()/printf() renders DECIMAL-typed floor()/ceil()
#    results with a trailing ".0" ("{}" on DECIMAL(5,0) -58 -> "-58.0")
#    while a direct SELECT of the same value prints "-58". Spark floor
#    returns BIGINT, so format prints "-58" — matching duck's DIRECT
#    rendering. Emulating fmt-of-decimal would break direct parity;
#    documented instead.
# -------------------------------------------------------- date / time

TS_POOL = [
    "timestamp '2024-03-15 14:30:45'", "timestamp '1999-12-31 23:59:59'",
    "timestamp '2024-02-29 00:00:00'", "timestamp '2024-03-15 14:30:45.123'",
    "timestamp '2000-01-01 00:00:00'",
]
TRUNC_UNITS = ["year", "quarter", "month", "week", "day", "hour", "minute", "second"]
PART_UNITS = ["year", "month", "day", "hour", "minute", "second",
              "dow", "isodow", "doy", "week", "quarter"]
DIFF_UNITS = ["year", "quarter", "month", "week", "day", "hour", "minute", "second"]


def gen_datetime(r):
    d = lambda: r.choice(DATE_POOL)
    t = lambda: r.choice(TS_POOL)
    return r.choice([
        lambda: f"select date_trunc('{r.choice(TRUNC_UNITS)}', {t()}) as v",
        lambda: f"select date_trunc('{r.choice(['year','month','week','day'])}', {d()}) as v",
        lambda: f"select epoch({t()}) as v",
        lambda: f"select epoch_ms({t()}) as v",
        lambda: f"select extract({r.choice(PART_UNITS)} from {d()}) as v",
        lambda: f"select date_part('{r.choice(PART_UNITS)}', {t()}) as v",
        lambda: f"select ({t()} + interval {r.randint(1, 400)} {r.choice(['minute','hour','day'])}) as v",
        lambda: f"select ({d()} + interval {r.randint(1, 25)} month) as v",
        lambda: f"select ({d()} - interval {r.randint(1, 1000)} day) as v",
        lambda: f"select datediff('{r.choice(DIFF_UNITS)}', {d()}, {d()}) as v",
        lambda: f"select date_diff('{r.choice(DIFF_UNITS)}', {t()}, {t()}) as v",
        lambda: f"select datesub('{r.choice(['day','month','year'])}', {d()}, {d()}) as v",
        lambda: f"select last_day({d()}) as v",
        lambda: f"select make_date({r.randint(1990, 2030)}, {r.randint(1, 12)}, {r.randint(1, 28)}) as v",
        lambda: f"select make_timestamp({r.randint(1990, 2030)}, {r.randint(1, 12)}, {r.randint(1, 28)}, {r.randint(0, 23)}, {r.randint(0, 59)}, {r.randint(0, 59)}) as v",
        lambda: f"select dayname({d()}) as v",
        lambda: f"select monthname({d()}) as v",
        lambda: f"select week({d()}) as v",
        lambda: f"select quarter({t()}) as v",
        lambda: f"select yearweek({d()}) as v",
        lambda: f"select strptime('2024-{r.randint(1,12):02d}-{r.randint(1,28):02d} 14:30', '%Y-%m-%d %H:%M') as v",
        lambda: f"select strftime({t()}, '{r.choice(['%Y-%m-%d', '%H:%M:%S', '%Y/%m/%d %H:%M', '%j', '%W', '%A %B'])}') as v",
        lambda: f"select ({t()} - {t()}) as v",
        lambda: f"select greatest({d()}, {d()}) as v",
        lambda: f"select ({d()} {r.choice(['<', '>', '='])} {d()}) as v",
        lambda: f"select date_part('epoch', {d()}) as v",
        lambda: f"select isfinite({d()}) as v",
        lambda: f"select century({d()}) as v",
        lambda: f"select dayofmonth({d()}) as v",
        lambda: f"select timezone('UTC', {t()}) as v",
    ])()


# --------------------------------------------- joins / setops / rollup

def small_table(r, alias):
    """VALUES relation with int key + payload columns, NULLs included."""
    n = r.randint(2, 7)
    rows = []
    for _ in range(n):
        key = "NULL" if r.random() < 0.12 else str(r.randint(0, 4))
        v = "NULL" if r.random() < 0.15 else str(r.choice([1, 2, 5, -3, 10]))
        s = "NULL" if r.random() < 0.15 else r.choice(["'a'", "'b'", "'c'", "'zz'"])
        rows.append(f"({key}, {v}, {s})")
    return f"(VALUES {', '.join(rows)}) {alias}(key, v, s)"


def gen_join(r):
    t1 = small_table(r, "a")
    t2 = small_table(r, "b")
    style = r.randrange(7)
    if style == 0:
        jt = r.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
        extra = r.choice(["", " AND a.v > 1", " AND b.v IS NOT NULL"])
        return (f"select a.key, a.v, b.v as bv, b.s from {t1} "
                f"{jt} {t2} ON a.key = b.key{extra}")
    if style == 1:
        # USING collapses the key column
        jt = r.choice(["JOIN", "LEFT JOIN", "FULL JOIN"])
        return f"select key, a.v, b.s from {t1} {jt} {t2} USING (key)"
    if style == 2:  # semi via EXISTS
        return (f"select a.key, a.v from {t1} "
                f"WHERE EXISTS (select 1 from {t2} where b.key = a.key)")
    if style == 3:  # anti via NOT EXISTS
        return (f"select a.key, a.s from {t1} "
                f"WHERE NOT EXISTS (select 1 from {t2} where b.key = a.key)")
    if style == 4:  # IN subquery
        return (f"select a.key, a.v from {t1} "
                f"WHERE a.v IN (select b.v from {t2})")
    if style == 5:  # scalar subquery in projection
        agg = r.choice(["max(b.v)", "min(b.v)", "count(*)", "sum(b.v)"])
        return f"select a.key, a.v + (select {agg} from {t2}) as x from {t1}"
    # cross join, bounded
    return f"select a.key, b.key as k2, a.v * b.v as p from {t1} CROSS JOIN {t2}"


def gen_setop(r):
    t1 = small_table(r, "a")
    t2 = small_table(r, "b")
    op = r.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT",
                   "INTERSECT ALL", "EXCEPT ALL", "UNION BY NAME"])
    if op == "UNION BY NAME":
        return (f"select key, v from {t1} UNION BY NAME "
                f"select v, key from {t2}")
    return f"select key, v from {t1} {op} select key, v from {t2}"


def gen_rollup(r):
    t = small_table(r, "a")
    g = r.choice(["ROLLUP(key, s)", "CUBE(key, s)",
                  "GROUPING SETS ((key), (s), ())", "GROUPING SETS ((key, s), (key))"])
    aggs = ", ".join(r.sample(
        ["sum(v) as sv", "count(*) as c", "min(v) as mn", "max(s) as mx",
         "avg(v) as av", "count(distinct v) as cd"], r.randint(1, 2)))
    return f"select key, s, {aggs} from {t} group by {g}"


def numclose(a, b, rel=1e-9, absol=1e-12):
    """Numeric fallback: accumulation-order noise (e.g. corr of a
    near-zero covariance: one engine 0.0, the other -8e-17) is not a
    semantic divergence. Cells must pair as floats within tolerance.
    Also equates DATE with midnight TIMESTAMP spellings: DuckDB
    promotes date ± interval to TIMESTAMP while the server keeps
    Spark's DATE — same instant, documented divergence (promoting for
    real would put a Cast on scan columns compared against such
    literals and kill parquet filter pushdown)."""
    if len(a) != len(b):
        return False
    for la, lb in zip(sorted(a), sorted(b)):
        ca, cb = la.split("|"), lb.split("|")
        if len(ca) != len(cb):
            return False
        for x, y in zip(ca, cb):
            if x == y:
                continue
            if x.removesuffix(" 00:00:00") == y.removesuffix(" 00:00:00"):
                continue
            try:
                fx, fy = float(x), float(y)
            except ValueError:
                return False
            if abs(fx - fy) > absol + rel * max(abs(fx), abs(fy)):
                return False
    return True


import re as _re
def documented(sql):
    return bool(_re.search(r"format\(", sql) and _re.search(r"floor\(|ceil\(", sql))


# bodies valid in BOTH engines once expanded (graft) / bound (duckdb);
# every body references both params so arg plumbing is exercised
MACRO_BODIES = [
    "a + b", "a - b * 2", "abs(a) + abs(b)", "a * a + b",
    "case when a > b then a else b end",
    "coalesce(a, b, 0)", "greatest(a, b) - least(a, b)",
    "(a + b) % 7", "case when b = 0 then a else a % b end",
    "concat(cast(a as varchar), ':', cast(b as varchar))",
    "length(concat(cast(a as varchar), cast(b as varchar)))",
]


def gen_macro_case(r, nm):
    """(setup, query, teardown): a random macro defined identically on
    both sides, called positionally, via the default, or with := named
    args — the differential check covers definition, binding, and
    expansion in one case."""
    body = r.choice(MACRO_BODIES)
    dflt = lit(r, "int")
    setup = f"create or replace macro {nm}(a, b := {dflt}) as {body}"
    x, y = lit(r, "int"), lit(r, "int")
    call = r.choice([
        f"{nm}({x}, {y})",
        f"{nm}({x})",                    # default fills b
        f"{nm}(b := {y}, a := {x})",     # named args, reordered
        f"{nm}({x}, b := {y})",          # mixed positional + named
    ])
    return setup, f"select {call} as v", f"drop macro {nm}"


def main(port, n, seed):
    con = duckdb.connect()
    r = random.Random(seed)
    counts = {"OK": 0, "PARITY_ERR": 0, "DUCKERR": 0, "SRVERR": 0, "DIFF": 0, "DOC": 0}
    fails = []
    for i in range(n):
        kind = r.random()
        pre, post = (), ()
        if kind < 0.20:
            sql = gen_agg(r)
        elif kind < 0.32:
            sql = gen_window(r)
        elif kind < 0.44:
            sql = gen_join(r)
        elif kind < 0.50:
            sql = gen_setop(r)
        elif kind < 0.56:
            sql = gen_rollup(r)
        elif kind < 0.64:
            setup, sql, drop = gen_macro_case(r, f"fm_{seed}_{i}")
            pre, post = (setup,), (drop,)
        elif kind < 0.74:
            sql = gen_datetime(r)
        else:
            ty = r.choice(["int", "double", "str", "bool"])
            sql = f"select {gen(r, ty, 3)} as v"
        for s in pre:
            run_duck(con, s)
            run_pg(port, s)
        drows, derr = run_duck(con, sql)
        srows, serr = run_pg(port, sql)
        for s in post:
            run_duck(con, s)
            run_pg(port, s)
        if derr is not None and serr is not None:
            counts["PARITY_ERR"] += 1
        elif derr is not None:
            counts["DUCKERR"] += 1  # server superset: fine, note it
        elif serr is not None:
            counts["SRVERR"] += 1
            fails.append(("SRVERR", sql, serr, drows))
        elif norm(drows) == norm(srows) or canon(drows) == canon(srows) \
                or numclose(drows, srows) or numclose(canon(drows), canon(srows)):
            counts["OK"] += 1
        elif documented(sql):
            counts["DOC"] += 1
        else:
            counts["DIFF"] += 1
            fails.append(("DIFF", sql, srows, drows))
    for kind, sql, got, want in fails[:40]:
        print(f"{kind}  {sql}")
        print(f"    server: {got}")
        print(f"    oracle: {want}")
    print(f"\nSEED {seed} SUMMARY {counts} total={n}")
    return 1 if fails else 0


if __name__ == "__main__":
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 5433
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    sys.exit(main(port, n, seed))
