"""Differential fuzzing of the expression layer vs DuckDB (r06).

Generates random Pig Latin expressions (arithmetic / comparison /
boolean / bincond / casts / string ops over nullable columns) together
with a semantically equivalent ANSI-SQL rendering, evaluates the Pig
side through the full engine (parse -> compile -> Spark) and the SQL
side on DuckDB over the SAME parquet table, and requires value-level
agreement on every row.

This is the mechanised version of the hand null-semantics review that
found the r05 FOREACH aggregate bugs — the generator explicitly
includes zero divisors, nulls in every column, and empty strings.  The
r06 ANSI fix (engine.py: Pig is null-on-error, so the engine pins
spark.sql.ansi.enabled=false) was found by this suite's first probe:
under Spark 4's ANSI default, `i1 / 0` killed the job instead of
producing Pig's null.

Translation notes (where Pig/Spark and DuckDB disagree syntactically
but not semantically):
  * int division: Pig truncates toward zero (Java) = DuckDB `//`
  * double literals: DuckDB parses `1.5` as DECIMAL -> CAST AS DOUBLE
  * (int) double cast: Spark truncates, DuckDB CAST rounds -> TRUNC
  * everything else (null propagation, three-valued logic, %, /0
    -> null) agrees once ANSI mode is off.
Literal doubles are multiples of 1/8 so their decimal text is exact in
binary and both engines parse the identical IEEE value; int magnitudes
are bounded so products stay far from 2^63.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import piglet_spark as pg

# Deep-sweep control: PIGLET_FUZZ_SCALE multiplies every arm's
# max_examples (default 1 — the CI-fast counts). A one-off
# `PIGLET_FUZZ_SCALE=8 pytest tests/test_fuzz_*.py` is the deep
# sweep recorded per round.
import os as _os
_FSCALE = max(1, int(_os.environ.get("PIGLET_FUZZ_SCALE", "1")))

# ---------------------------------------------------------------- table

ROWS = []
_ints = [0, 1, -1, 2, -3, 7, 50, -50, None, 13]
_dbls = [0.0, 1.5, -2.25, 3.0, None, 0.125, -50.0, 8.5, 2.0, None]
_strs = ["", "a", "ab", "zz", None, "ba", "a b", "z", None, "aa"]
for i in range(40):
    ROWS.append((i, _ints[i % 10], _ints[(i * 3 + 1) % 10],
                 _dbls[i % 10], _dbls[(i * 7 + 2) % 10],
                 _strs[i % 10], _strs[(i * 9 + 3) % 10]))
SCHEMA = ("rid int, i1 long, i2 long, d1 double, d2 double, "
          "s1 string, s2 string")


@pytest.fixture(scope="module")
def fuzz_tab(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fuzz") / "tab.parquet")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW tab AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return path, con


def test_null_on_error_semantics(spark, fuzz_tab):
    """Pig null-on-error pin (the r06 ANSI fix): /0 and %0 yield null
    for ints and doubles, invalid string casts yield null, and a null
    bincond condition yields null — regardless of the session's prior
    spark.sql.ansi.enabled value (Spark 4 defaults it to true)."""
    path, _ = fuzz_tab
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{path}' USING ParquetStorage();
B = FOREACH A GENERATE rid, i1 / 0 AS z1, i1 % 0 AS z2,
    d1 / 0.0 AS z3, (int)'nope' AS z4,
    ((i1 == i1) ? 1 : 2) AS z5;
""")
    rows = {r["rid"]: r for r in eng.df("B").collect()}
    for r in rows.values():
        assert r["z1"] is None and r["z2"] is None and r["z3"] is None
        assert r["z4"] is None
    # rid rows where i1 is null (ints[8] pattern): bincond cond null
    null_rids = [i for i in range(40) if _ints[i % 10] is None]
    assert null_rids and all(rows[i]["z5"] is None for i in null_rids)
    assert all(rows[i]["z5"] == 1 for i in range(40) if i not in null_rids)


@pytest.mark.parametrize("pig_keys,sql_on", [
    # null join keys never match (NULL = NULL is NULL) in both engines
    (("i1", "i2"), "a.i1 = b.i2"),
    (("s1", "s2"), "a.s1 = b.s2"),
    (("d1", "d2"), "a.d1 = b.d2"),
    (("(i1, s1)", "(i2, s2)"), "a.i1 = b.i2 AND a.s1 = b.s2"),
])
def test_join_null_keys_match_duckdb(spark, fuzz_tab, pig_keys, sql_on):
    """Inner-join parity incl. null-key drop semantics (the reference
    grammar has inner JOIN only — PigParser.scala has no OUTER)."""
    path, con = fuzz_tab
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{path}' USING ParquetStorage();
B = LOAD '{path}' USING ParquetStorage();
J = JOIN A BY {pig_keys[0]}, B BY {pig_keys[1]};
C = FOREACH J GENERATE A::rid AS lrid, B::rid AS rrid;
""")
    got = sorted((r["lrid"], r["rrid"]) for r in eng.df("C").collect())
    want = sorted(con.execute(
        f"SELECT a.rid, b.rid FROM tab a JOIN tab b ON {sql_on}"
    ).fetchall())
    assert got == want


def test_three_way_join_matches_duckdb(spark, fuzz_tab):
    path, con = fuzz_tab
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{path}' USING ParquetStorage();
B = LOAD '{path}' USING ParquetStorage();
D = LOAD '{path}' USING ParquetStorage();
J = JOIN A BY i1, B BY i1, D BY i2;
C = FOREACH J GENERATE A::rid AS r1, B::rid AS r2, D::rid AS r3;
""")
    got = sorted((r["r1"], r["r2"], r["r3"])
                 for r in eng.df("C").collect())
    want = sorted(con.execute("""
SELECT a.rid, b.rid, d.rid FROM tab a
JOIN tab b ON a.i1 = b.i1 JOIN tab d ON a.i1 = d.i2""").fetchall())
    assert got == want


def test_string_builtin_edges(spark, fuzz_tab):
    """SUBSTRING both arities (2-arg runs to end, CommonPigFuncs.
    scala:66-67), out-of-range clamp, INDEXOF not-found/-1, and null
    propagation."""
    path, _ = fuzz_tab
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{path}' USING ParquetStorage();
B = FOREACH A GENERATE rid, s1,
    SUBSTRING(s1, 1) AS tail1,
    SUBSTRING(s1, 0, 1) AS head1,
    SUBSTRING(s1, 5, 9) AS oob,
    INDEXOF(s1, 'b') AS ib;
""")
    for r in eng.df("B").collect():
        s = r["s1"]
        if s is None:
            assert r["tail1"] is None and r["head1"] is None \
                and r["oob"] is None and r["ib"] is None
            continue
        assert r["tail1"] == s[1:]
        assert r["head1"] == s[0:1]
        assert r["oob"] == s[5:9]          # out of range -> ""
        assert r["ib"] == s.find("b")      # -1 when absent


def test_isempty_string_overload(spark, fuzz_tab):
    """ISEMPTY/NONEMPTY on chararray — the reference's
    strIsEmpty/strNonEmpty overloads (UDF.scala), distinct from the
    bag-aggregate forms."""
    path, _ = fuzz_tab
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{path}' USING ParquetStorage();
B = FOREACH A GENERATE rid, s1, ISEMPTY(s1) AS e, NONEMPTY(s1) AS ne;
""")
    for r in eng.df("B").collect():
        if r["s1"] is None:
            assert r["e"] is None and r["ne"] is None
        else:
            assert r["e"] == (len(r["s1"]) == 0)
            assert r["ne"] == (len(r["s1"]) > 0)


def test_order_by_null_placement(spark, fuzz_tab):
    """Pig treats null as smaller than any value: nulls sort FIRST on
    ASC and LAST on DESC (Spark's default, but NOT DuckDB's — its
    default is NULLS LAST on ASC, so the oracle pins it explicitly)."""
    path, con = fuzz_tab
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{path}' USING ParquetStorage();
B = ORDER A BY i1 ASC, rid ASC;
C = ORDER A BY i1 DESC, rid ASC;
""")
    got_asc = [r["rid"] for r in eng.df("B").collect()]
    got_desc = [r["rid"] for r in eng.df("C").collect()]
    want_asc = [r[0] for r in con.execute(
        "SELECT rid FROM tab ORDER BY i1 ASC NULLS FIRST, rid").fetchall()]
    want_desc = [r[0] for r in con.execute(
        "SELECT rid FROM tab ORDER BY i1 DESC NULLS LAST, rid").fetchall()]
    assert got_asc == want_asc
    assert got_desc == want_desc


# ------------------------------------------------- expression generator
# A node is (pig_text, sql_text, typ) with typ in {'i','d','s','b'}.

def _arith_i(t):
    a, b, op = t
    return (f"({a[0]} {op} {b[0]})", f"({a[1]} {op} {b[1]})", "i")


def _intdiv(t):
    a, b = t
    return (f"({a[0]} / {b[0]})", f"({a[1]} // {b[1]})", "i")


def _mod(t):
    a, b = t
    return (f"({a[0]} % {b[0]})", f"({a[1]} % {b[1]})", "i")


def _neg(a):
    return (f"(- {a[0]})", f"(- {a[1]})", a[2])


def _arith_d(t):
    a, b, op = t
    return (f"({a[0]} {op} {b[0]})", f"({a[1]} {op} {b[1]})", "d")


def _cast_d(a):
    return (f"(double){a[0]}", f"CAST({a[1]} AS DOUBLE)", "d")


def _cast_i(a):
    # Spark double->int cast truncates toward zero; DuckDB CAST rounds
    return (f"(int){a[0]}", f"CAST(TRUNC({a[1]}) AS BIGINT)", "i")


def _cmp(t):
    a, b, op = t
    sql_op = {"==": "=", "!=": "<>"}.get(op, op)
    return (f"({a[0]} {op} {b[0]})", f"({a[1]} {sql_op} {b[1]})", "b")


def _bool(t):
    a, b, op = t
    return (f"({a[0]} {op} {b[0]})", f"({a[1]} {op} {b[1]})", "b")


def _not(a):
    return (f"(NOT {a[0]})", f"(NOT {a[1]})", "b")


def _isnull(t):
    a, neg = t
    kw = "is not null" if neg else "is null"
    return (f"({a[0]} {kw})", f"({a[1]} {kw.upper()})", "b")


def _bincond(t):
    # Pig bincond with a NULL condition yields NULL (not the else
    # branch), so CASE needs an explicit NOT-branch: a NULL condition
    # falls through both WHENs to the implicit NULL.
    c, a, b = t
    return (f"(({c[0]}) ? ({a[0]}) : ({b[0]}))",
            f"(CASE WHEN {c[1]} THEN {a[1]} "
            f"WHEN NOT ({c[1]}) THEN {b[1]} END)", a[2])


def _concat(t):
    a, b = t
    return (f"CONCAT({a[0]}, {b[0]})", f"({a[1]} || {b[1]})", "s")


def _trim(a):
    return (f"TRIM({a[0]})", f"TRIM({a[1]})", "s")


def _substring(t):
    # Pig SUBSTRING is 0-based half-open (CommonPigFuncs.scala:66);
    # SQL substr is 1-based with length
    a, start, length, two_arg = t
    if two_arg:
        return (f"SUBSTRING({a[0]}, {start})",
                f"SUBSTR({a[1]}, {start + 1})", "s")
    return (f"SUBSTRING({a[0]}, {start}, {start + length})",
            f"SUBSTR({a[1]}, {start + 1}, {length})", "s")


def _replace(t):
    # literal-safe needle/replacement (no regex metachars generated);
    # DuckDB regexp_replace needs 'g' to match Spark's replace-all
    a, pat, repl = t
    return (f"REPLACE({a[0]}, '{pat}', '{repl}')",
            f"REGEXP_REPLACE({a[1]}, '{pat}', '{repl}', 'g')", "s")


def _strlen(a):
    return (f"STRLEN({a[0]})", f"CAST(LENGTH({a[1]}) AS BIGINT)", "i")


def _indexof(t):
    # Pig INDEXOF is 0-based, -1 when absent (instr semantics - 1)
    a, needle = t
    return (f"INDEXOF({a[0]}, '{needle}')",
            f"(STRPOS({a[1]}, '{needle}') - 1)", "i")


def _strpred(t):
    a, needle, fn = t
    sql = {"startswith": "STARTS_WITH({0}, '{1}')",
           "endswith": "ENDS_WITH({0}, '{1}')",
           "strcontains": "CONTAINS({0}, '{1}')"}[fn]
    return (f"{fn.upper()}({a[0]}, '{needle}')",
            sql.format(a[1], needle), "b")


def _case_fn(t):
    a, fn = t
    return (f"{fn.upper()}({a[0]})", f"{fn}({a[1]})", "s")


int_leaf = st.one_of(
    st.sampled_from([("i1", "i1", "i"), ("i2", "i2", "i")]),
    st.integers(-50, 50).map(lambda v: (str(v), str(v), "i")))
dbl_leaf = st.one_of(
    st.sampled_from([("d1", "d1", "d"), ("d2", "d2", "d")]),
    st.integers(-400, 400).map(
        lambda v: (repr(v / 8), f"CAST({v / 8!r} AS DOUBLE)", "d")))
str_leaf = st.one_of(
    st.sampled_from([("s1", "s1", "s"), ("s2", "s2", "s")]),
    st.text(alphabet="abz ", max_size=3).map(
        lambda v: (f"'{v}'", f"'{v}'", "s")))

int_e = st.deferred(lambda: st.one_of(
    int_leaf,
    st.tuples(int_e, int_e, st.sampled_from(["+", "-", "*"])).map(_arith_i),
    st.tuples(int_e, int_e).map(_intdiv),
    st.tuples(int_e, int_e).map(_mod),
    int_e.map(_neg),
    dbl_e.map(_cast_i),
    st.tuples(bool_e, int_e, int_e).map(_bincond),
    str_e.map(_strlen),
    st.tuples(str_e, _needle).map(_indexof),
))
dbl_e = st.deferred(lambda: st.one_of(
    dbl_leaf,
    st.tuples(dbl_e, dbl_e,
              st.sampled_from(["+", "-", "*", "/"])).map(_arith_d),
    dbl_e.map(_neg),
    int_e.map(_cast_d),
    st.tuples(bool_e, dbl_e, dbl_e).map(_bincond),
))
_needle = st.text(alphabet="abz", min_size=1, max_size=2)
str_e = st.deferred(lambda: st.one_of(
    str_leaf,
    st.tuples(str_e, str_e).map(_concat),
    st.tuples(str_e, st.sampled_from(["upper", "lower"])).map(_case_fn),
    st.tuples(bool_e, str_e, str_e).map(_bincond),
    str_e.map(_trim),
    st.tuples(str_e, st.integers(0, 4), st.integers(0, 4),
              st.booleans()).map(_substring),
    st.tuples(str_e, _needle, _needle).map(_replace),
))
bool_e = st.deferred(lambda: st.one_of(
    st.tuples(int_e, int_e,
              st.sampled_from(["==", "!=", "<", "<=", ">", ">="])).map(_cmp),
    st.tuples(dbl_e, dbl_e,
              st.sampled_from(["==", "!=", "<", ">"])).map(_cmp),
    st.tuples(str_e, str_e, st.sampled_from(["==", "!=", "<"])).map(_cmp),
    st.tuples(bool_e, bool_e, st.sampled_from(["AND", "OR"])).map(_bool),
    bool_e.map(_not),
    st.tuples(st.one_of(int_e, dbl_e, str_e), st.booleans()).map(_isnull),
    st.tuples(str_e, _needle, st.sampled_from(
        ["startswith", "endswith", "strcontains"])).map(_strpred),
))

any_expr = st.one_of(int_e, dbl_e, str_e, bool_e)
_num_e = st.one_of(int_e, dbl_e)
_agg_slot = st.tuples(st.sampled_from(["SUM", "AVG", "MIN", "MAX"]), _num_e)


def _same(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-12, abs_tol=1e-12)
    return a == b


# 40 examples x 25 expressions = 1000 differential cases per run.
@given(st.lists(any_expr, min_size=25, max_size=25))
@settings(max_examples=40 * _FSCALE, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.filter_too_much,
                                 HealthCheck.data_too_large,
                                 HealthCheck.function_scoped_fixture])
def test_exprs_match_duckdb(spark, fuzz_tab, exprs):
    path, con = fuzz_tab
    gens = ",\n    ".join(
        f"{p} AS e{k}" for k, (p, q, t) in enumerate(exprs))
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{path}' USING ParquetStorage();
B = FOREACH A GENERATE rid, {gens};
""")
    got = {r["rid"]: r for r in eng.df("B").collect()}

    sels = ", ".join(f"{q} AS e{k}" for k, (p, q, t) in enumerate(exprs))
    want = con.execute(
        f"SELECT rid, {sels} FROM tab ORDER BY rid").fetchall()

    assert len(got) == len(want)
    for row in want:
        rid, vals = row[0], row[1:]
        srow = got[rid]
        for k, v in enumerate(vals):
            sv = srow[f"e{k}"]
            assert _same(sv, v), (
                f"rid={rid} e{k}: spark={sv!r} duckdb={v!r}\n"
                f"  pig: {exprs[k][0]}\n  sql: {exprs[k][1]}")


# Nested-FOREACH bag aggregates — the OTHER compile mode (higher-
# order array functions instead of fused Catalyst aggregation; r05's
# silent type-drift bug lived here).  DuckDB oracle via FILTER
# clauses; SUM-of-empty pins the engine's reference-parity 0.
@given(bool_e, st.lists(st.tuples(
    st.sampled_from(["SUM", "AVG", "MIN", "MAX"]), _num_e),
    min_size=4, max_size=4))
@settings(max_examples=20 * _FSCALE, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.filter_too_much,
                                 HealthCheck.data_too_large,
                                 HealthCheck.function_scoped_fixture])
def test_nested_foreach_bag_aggs_match_duckdb(spark, fuzz_tab,
                                              pred, slots):
    path, con = fuzz_tab
    pp, pq, _ = pred
    gens = ", ".join(f"{p} AS v{k}" for k, (fn, (p, q, t))
                     in enumerate(slots))
    aggs = ", ".join(f"{fn}(f.v{k}) AS a{k}" for k, (fn, _)
                     in enumerate(slots))
    # composite expression over the filtered bag — the agg(when(pred,
    # expr)) rewrite path (aggregate-in-aggregate otherwise)
    nc = len(slots)
    aggs += f", SUM(f.v0 + f.v1 * 2) AS a{nc}"
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{path}' USING ParquetStorage();
B = FOREACH A GENERATE rid, i1, i2, d1, d2, s1, s2, {gens};
G = GROUP B BY i1;
C = FOREACH G {{
      f = FILTER B BY {pp};
      s = f.v0;
      u = DISTINCT s;
      GENERATE group AS k, COUNT(f) AS cnt, COUNT(u) AS ndist, {aggs};
    }};
""")
    got = {r["k"]: r for r in eng.df("C").collect()}

    sql_aggs = []
    for k, (fn, _) in enumerate(slots):
        if fn == "SUM":
            sql_aggs.append(
                f"COALESCE(SUM(v{k}) FILTER (WHERE {pq}), 0) AS a{k}")
        else:
            sql_aggs.append(f"{fn}(v{k}) FILTER (WHERE {pq}) AS a{k}")
    sql_aggs.append(
        f"COALESCE(SUM(v0 + v1 * 2) FILTER (WHERE {pq}), 0) AS a{nc}")
    want = con.execute(f"""
WITH B AS (SELECT rid, i1, i2, d1, d2, s1, s2, {', '.join(
        f'{q} AS v{k}' for k, (fn, (p, q, t)) in enumerate(slots))}
           FROM tab)
SELECT i1 AS k, COUNT(*) FILTER (WHERE {pq}) AS cnt,
       COUNT(DISTINCT v0) FILTER (WHERE {pq}) AS ndist,
       {', '.join(sql_aggs)}
FROM B GROUP BY i1""").fetchall()

    assert len(got) == len(want)
    for row in want:
        key, cnt, ndist, vals = row[0], row[1], row[2], row[3:]
        srow = got[key]
        assert srow["cnt"] == cnt, (
            f"nested COUNT mismatch group={key!r}: "
            f"spark={srow['cnt']} duckdb={cnt}\n  pred: {pp}")
        assert srow["ndist"] == ndist, (
            f"nested COUNT DISTINCT mismatch group={key!r}: "
            f"spark={srow['ndist']} duckdb={ndist}\n  pred: {pp}")
        slots_all = slots + [("SUM", ("f.v0 + f.v1 * 2",
                                      "v0 + v1 * 2", None))]
        for k, v in enumerate(vals):
            sv = srow[f"a{k}"]
            fn, (p, q, t) = slots_all[k]
            assert _same(sv, v), (
                f"nested group={key!r} {fn}: spark={sv!r} duckdb={v!r}\n"
                f"  pred: {pp}\n  pig arg: {p}\n  sql arg: {q}")


def test_datetime_extracts_match_duckdb(spark):
    """GETYEAR/…/GETSECOND over the events timestamps vs DuckDB
    EXTRACT — pins the TIMESTAMP(NANOS) load path end-to-end."""
    ev = "/root/testdata/sf0.01/events.parquet"
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{ev}' USING ParquetStorage();
B = FOREACH A GENERATE event_id, GETYEAR(ts) AS y, GETMONTH(ts) AS mo,
    GETDAY(ts) AS d, GETHOUR(ts) AS h, GETMINUTE(ts) AS mi,
    GETSECOND(ts) AS s;
""")
    got = {r["event_id"]: (r["y"], r["mo"], r["d"], r["h"], r["mi"],
                           r["s"]) for r in eng.df("B").collect()}
    con = duckdb.connect()
    want = con.execute(f"""
SELECT event_id, EXTRACT(year FROM ts), EXTRACT(month FROM ts),
       EXTRACT(day FROM ts), EXTRACT(hour FROM ts),
       EXTRACT(minute FROM ts), EXTRACT(second FROM ts)
FROM read_parquet('{ev}')""").fetchall()
    assert len(got) == len(want) and len(want) > 0
    for eid, *vals in want:
        assert got[eid] == tuple(vals), (eid, got[eid], vals)


def test_nested_order_limit_topk_matches_duckdb(spark, fuzz_tab):
    """Per-group top-k via nested ORDER BY ... DESC + LIMIT: SUM of
    the kept values must equal DuckDB's row_number() formulation
    (ties are on the ordered value itself, so the sum is
    tie-insensitive). Nulls order smallest (Pig), i.e. last under
    DESC — the NULLS LAST default DuckDB uses."""
    path, con = fuzz_tab
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{path}' USING ParquetStorage();
G = GROUP A BY i1;
C = FOREACH G {{
      o = ORDER A BY d1 DESC;
      l = LIMIT o 2;
      GENERATE group AS k, COUNT(l) AS n, SUM(l.d1) AS s;
    }};
""")
    got = {r["k"]: (r["n"], r["s"]) for r in eng.df("C").collect()}
    want = con.execute("""
WITH r AS (SELECT i1, d1,
                  row_number() OVER (PARTITION BY i1
                                     ORDER BY d1 DESC NULLS LAST) rn
           FROM tab)
SELECT i1 AS k, COUNT(*) AS n,
       COALESCE(SUM(d1) FILTER (WHERE d1 IS NOT NULL), 0) AS s
FROM r WHERE rn <= 2 GROUP BY i1""").fetchall()
    assert len(got) == len(want)
    for k, n, s in want:
        gn, gs = got[k]
        assert gn == n, f"group {k}: COUNT {gn} != {n}"
        assert _same(gs if gs is not None else 0, s), \
            f"group {k}: SUM {gs} != {s}"


# Codegen path: the same differential, but through to_code-generated
# standalone PySpark (exec'd), so the generated expression rendering
# gets the same null-semantics scrutiny as the engine.
@given(st.lists(any_expr, min_size=15, max_size=15))
@settings(max_examples=10 * _FSCALE, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.filter_too_much,
                                 HealthCheck.data_too_large,
                                 HealthCheck.function_scoped_fixture])
def test_codegen_exprs_match_duckdb(spark, fuzz_tab, exprs):
    path, con = fuzz_tab
    gens = ",\n    ".join(
        f"{p} AS e{k}" for k, (p, q, t) in enumerate(exprs))
    code = pg.PigEngine(spark).to_code(f"""
A = LOAD '{path}' USING ParquetStorage();
B = FOREACH A GENERATE rid, {gens};
""")
    ns = {"spark": spark}
    exec(compile(code, "<fuzz-gen>", "exec"), ns)
    got = {r["rid"]: r for r in ns["B"].collect()}

    sels = ", ".join(f"{q} AS e{k}" for k, (p, q, t) in enumerate(exprs))
    want = con.execute(
        f"SELECT rid, {sels} FROM tab ORDER BY rid").fetchall()
    assert len(got) == len(want)
    for row in want:
        rid, vals = row[0], row[1:]
        for k, v in enumerate(vals):
            sv = got[rid][f"e{k}"]
            assert _same(sv, v), (
                f"codegen rid={rid} e{k}: spark={sv!r} duckdb={v!r}\n"
                f"  pig: {exprs[k][0]}\n  sql: {exprs[k][1]}")


# FILTER: a null predicate excludes the row in both Pig and SQL WHERE.
@given(st.lists(bool_e, min_size=8, max_size=8))
@settings(max_examples=25 * _FSCALE, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.filter_too_much,
                                 HealthCheck.data_too_large,
                                 HealthCheck.function_scoped_fixture])
def test_filter_matches_duckdb(spark, fuzz_tab, preds):
    path, con = fuzz_tab
    eng = pg.PigEngine(spark)
    script = [f"A = LOAD '{path}' USING ParquetStorage();"]
    for k, (p, q, t) in enumerate(preds):
        script.append(f"F{k} = FILTER A BY {p};")
    eng.run("\n".join(script))
    for k, (p, q, t) in enumerate(preds):
        got = sorted(r["rid"] for r in
                     eng.df(f"F{k}").select("rid").collect())
        want = sorted(r[0] for r in con.execute(
            f"SELECT rid FROM tab WHERE {q}").fetchall())
        assert got == want, (
            f"FILTER divergence\n  pig: {p}\n  sql: {q}\n"
            f"  spark={got}\n  duckdb={want}")


# Aggregates over a nullable group key (null forms its own group in
# both Pig and SQL).  Engine semantics under test: COUNT includes
# null-valued rows (reference CommonPigFuncs.scala:36 counts bag
# size), SUM of an all-null group is 0 not NULL (reference parity),
# AVG/MIN/MAX null-skip.
@given(st.lists(_agg_slot, min_size=6, max_size=6))
@settings(max_examples=25 * _FSCALE, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.filter_too_much,
                                 HealthCheck.data_too_large,
                                 HealthCheck.function_scoped_fixture])
def test_aggregates_match_duckdb(spark, fuzz_tab, slots):
    path, con = fuzz_tab
    gens = ", ".join(f"{p} AS v{k}" for k, (fn, (p, q, t))
                     in enumerate(slots))
    aggs = ", ".join(f"{fn}(B.v{k}) AS a{k}" for k, (fn, _)
                     in enumerate(slots))
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{path}' USING ParquetStorage();
B = FOREACH A GENERATE rid, i1, {gens};
G = GROUP B BY i1;
C = FOREACH G GENERATE group AS k, COUNT(B) AS cnt, {aggs};
""")
    got = {r["k"]: r for r in eng.df("C").collect()}

    sql_aggs = []
    for k, (fn, (p, q, t)) in enumerate(slots):
        if fn == "SUM":
            sql_aggs.append(f"COALESCE(SUM(v{k}), 0) AS a{k}")
        else:
            sql_aggs.append(f"{fn}(v{k}) AS a{k}")
    want = con.execute(f"""
WITH B AS (SELECT rid, i1, {', '.join(
        f'{q} AS v{k}' for k, (fn, (p, q, t)) in enumerate(slots))}
           FROM tab)
SELECT i1 AS k, COUNT(*) AS cnt, {', '.join(sql_aggs)}
FROM B GROUP BY i1""").fetchall()

    assert len(got) == len(want)
    for row in want:
        key, cnt, vals = row[0], row[1], row[2:]
        srow = got[key]
        assert srow["cnt"] == cnt, f"COUNT mismatch for group {key!r}"
        for k, v in enumerate(vals):
            sv = srow[f"a{k}"]
            fn, (p, q, t) = slots[k]
            assert _same(sv, v), (
                f"group={key!r} {fn}: spark={sv!r} duckdb={v!r}\n"
                f"  pig arg: {p}\n  sql arg: {q}")
