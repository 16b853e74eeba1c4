"""Cross-script shared-subplan execution (PigEngine.run_all) — the
reference's PlanMerger path (PlanMerger.scala:11-114, invoked when the
CLI receives several script files, Piglet.scala:222): a subplan common
to 2+ scripts in one session executes once.
"""

import os

import pytest
from pyspark.sql import functions as F

import piglet_spark as pg
from piglet_spark.operators.executor import simulate_signatures


def _mark_udf(marker_path):
    """Row-level UDF that appends one line per invocation — a
    cross-process execution counter (local-mode Python workers share
    the filesystem), proving how many times a subplan ran."""
    def mark(x):
        with open(marker_path, "a") as f:
            f.write("x\n")
        return x
    return F.udf(mark, "int")


PREFIX = """
A = LOAD '{d}/t.csv' USING PigStorage(',') AS (a:int, b:int, c:int);
B = FOREACH A GENERATE a, b, MARK(a) AS m;
C = FILTER B BY a > 0;
"""

TAIL1 = "D = FOREACH C GENERATE a + b AS s;\nDUMP D;\n"
TAIL2 = "E = FOREACH C GENERATE a * b AS p;\nDUMP E;\n"


def _lines(p):
    return sum(1 for _ in open(p)) if os.path.exists(p) else 0


def test_run_all_shared_prefix_executes_once(spark, data_dir, tmp_path):
    marker = str(tmp_path / "marks.txt")
    eng = pg.PigEngine(spark)
    eng.register_function("MARK", _mark_udf(marker))
    s1 = PREFIX.format(d=data_dir) + TAIL1
    s2 = PREFIX.format(d=data_dir) + TAIL2
    eng.run_all([s1, s2])

    # both tails computed correct values off the shared prefix
    assert sorted(r["s"] for r in eng.df("D").collect()) == [3, 3, 9, 15]
    assert sorted(r["p"] for r in eng.df("E").collect()) == [2, 2, 20, 56]

    # the prefix's row-level UDF ran exactly once per row (4 rows in
    # t.csv) — script 2 read the persisted result, so the shared
    # subplan executed ONCE for two scripts
    assert _lines(marker) == 4

    # the frontier (C, deepest shared node) is persisted and spliced;
    # the interior node (B) is not separately cached
    assert len(eng.executor.session_cache) == 1
    shared_c = next(iter(eng.executor.session_cache.values()))
    assert eng.executor.env["C"] is shared_c
    assert shared_c.storageLevel.useMemory

    # script 2's tail physically reads the in-memory cache, not the CSV
    # (the InMemoryRelation's description still embeds the original
    # csv scan text; the marker count above is the no-recompute proof)
    plan = eng.df("E")._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan

    eng.clear_session_cache()
    assert not eng.executor.session_cache
    assert not shared_c.storageLevel.useMemory


def test_run_all_disjoint_scripts_share_nothing(spark, data_dir):
    eng = pg.PigEngine(spark)
    s1 = ("A = LOAD '{d}/t.csv' USING PigStorage(',') AS "
          "(a:int,b:int,c:int);\nB = FILTER A BY a > 1;\n").format(d=data_dir)
    s2 = ("A = LOAD '{d}/dup.csv' USING PigStorage(',') AS "
          "(x:int,y:int);\nB = FILTER A BY x > 1;\n").format(d=data_dir)
    eng.run_all([s1, s2])
    assert not eng.executor.session_cache
    # same alias names, different lineage — no false sharing; B now
    # holds script 2's binding
    assert eng.df("B").count() == 1


def test_run_all_matches_separate_runs(spark, sf_dir):
    """run_all values are identical to two independent engines."""
    s1 = (
        "L = LOAD '{d}/lineitem.parquet' USING ParquetStorage();\n"
        "F1 = FILTER L BY l_quantity > 10.0;\n"
        "G = GROUP F1 BY l_returnflag;\n"
        "S = FOREACH G GENERATE group AS flag, SUM(F1.l_quantity) AS q;\n"
    ).format(d=sf_dir)
    s2 = (
        "L = LOAD '{d}/lineitem.parquet' USING ParquetStorage();\n"
        "F1 = FILTER L BY l_quantity > 10.0;\n"
        "M = FOREACH F1 GENERATE l_orderkey, l_extendedprice * 2.0 AS p2;\n"
    ).format(d=sf_dir)
    eng = pg.PigEngine(spark)
    eng.run_all([s1, s2])
    merged_s = {(r["flag"], float(r["q"])) for r in eng.df("S").collect()}
    merged_m_n = eng.df("M").count()

    ref1 = pg.PigEngine(spark)
    ref1.run(s1)
    ref2 = pg.PigEngine(spark)
    ref2.run(s2)
    assert merged_s == {(r["flag"], float(r["q"]))
                        for r in ref1.df("S").collect()}
    assert merged_m_n == ref2.df("M").count()
    eng.clear_session_cache()


def test_simulate_signatures_match_executor(spark, sf_dir):
    """The pre-pass produces the same signatures the Executor binds at
    run time — a mismatch would silently disable all sharing."""
    script = (
        "L = LOAD '{d}/nation.parquet' USING ParquetStorage();\n"
        "F1 = FILTER L BY n_regionkey > 1;\n"
        "P = FOREACH F1 GENERATE n_name, n_regionkey;\n"
    ).format(d=sf_dir)
    eng = pg.PigEngine(spark)
    ops = eng.parse(script)
    pre = {s for s, spliceable, _ in simulate_signatures(ops) if spliceable}
    eng.run(script)
    assert eng.executor.lineage["F1"] in pre
    assert eng.executor.lineage["P"] in pre


def test_sql_signature_ignores_aliases_in_string_literals(spark, sf_dir):
    """An alias name inside a SQL string literal is data, not a
    dependency: editing that alias upstream must NOT change the SQL
    statement's signature (r04 — was a conservative over-inclusion)."""
    from piglet_spark.operators.executor import bind_signatures, op_signature
    from piglet_spark.plans import ast as A

    def sigs(script):
        eng = pg.PigEngine(spark)
        ops = eng.parse(script)
        lin = {}
        for op in ops:
            bind_signatures(op, lin, op_signature(op, lin))
        sql = [op for op in ops if isinstance(op, A.SqlStmt)][0]
        return lin, op_signature(sql, lin)

    load = "N = LOAD '{d}/nation.parquet' USING ParquetStorage();\n".format(
        d=sf_dir)
    quoted = 'S = SQL \'select "N" AS tag, 1 AS one\';\n'
    lin_a, sql_a = sigs(load + quoted)
    lin_b, sql_b = sigs(load + "N = FILTER N BY n_regionkey > 0;\n" + quoted)
    assert lin_a["N"] != lin_b["N"]  # upstream really differs...
    assert sql_a == sql_b            # ...but quoted 'N' is just data
    # a genuine (unquoted) FROM N reference still folds lineage in
    real = "S = SQL 'select count(*) AS n FROM N';\n"
    _, sql_ra = sigs(load + real)
    _, sql_rb = sigs(load + "N = FILTER N BY n_regionkey > 0;\n" + real)
    assert sql_ra != sql_rb


def test_run_all_sql_share_despite_stale_alias(spark, sf_dir):
    """Pre-pass sigs must equal execution sigs even when an EARLIER
    script bound an alias whose name appears in a later script's SQL
    text: the Executor's lineage accumulates across run() calls and
    op_signature folds in every referenced alias it can see, so the
    run_all pre-pass threads ONE lineage dict across scripts. A
    per-script fresh dict would compute a different SqlStmt sig than
    execution and silently never share (r04 review)."""
    load = ("L = LOAD '{d}/nation.parquet' USING ParquetStorage();\n"
            ).format(d=sf_dir)
    # s1 binds an alias literally named `qty` — a word s2/s3's SQL
    # also uses as an output column name
    s1 = load + "qty = FOREACH L GENERATE n_name;\nDUMP qty;\n"
    tail = ("Q = SQL 'select n_regionkey, count(*) AS qty from L "
            "group by n_regionkey';\n"
            "D = FOREACH Q GENERATE n_regionkey;\nDUMP D;\n")
    s2, s3 = load + tail, load + tail
    eng = pg.PigEngine(spark)
    eng.run_all([s1, s2, s3])
    # the shared frontier (D — the deepest shared op with a sink
    # consumer; Q is interior, its consumer splices) made it into the
    # session cache, which requires the SqlStmt sig to have matched
    assert eng.executor.lineage["D"] in eng.executor.session_cache
    assert eng.executor.env["D"] is eng.executor.session_cache[
        eng.executor.lineage["D"]]
    assert eng.df("Q").count() == 5
    eng.clear_session_cache()


@pytest.mark.parametrize("n_scripts", [3])
def test_run_all_three_scripts(spark, data_dir, tmp_path, n_scripts):
    """Sharing holds for N>2 scripts: prefix still executes once."""
    marker = str(tmp_path / "marks3.txt")
    eng = pg.PigEngine(spark)
    eng.register_function("MARK", _mark_udf(marker))
    tails = ["D = FOREACH C GENERATE a + b AS v;\nDUMP D;\n",
             "D = FOREACH C GENERATE a - b AS v;\nDUMP D;\n",
             "D = FOREACH C GENERATE a * a AS v;\nDUMP D;\n"]
    scripts = [PREFIX.format(d=data_dir) + t for t in tails[:n_scripts]]
    eng.run_all(scripts)
    assert _lines(marker) == 4
    eng.clear_session_cache()


def test_run_all_with_profiling_enabled(spark, sf_dir, tmp_path):
    """Shared-subplan execution composes with auto-materialization:
    both splice mechanisms may fire in one session without stale or
    wrong results."""
    mat = str(tmp_path / "mat")
    s1 = (
        "L = LOAD '{d}/lineitem.parquet' USING ParquetStorage();\n"
        "F1 = FILTER L BY l_quantity > 30.0;\n"
        "G = GROUP F1 BY l_linestatus;\n"
        "S = FOREACH G GENERATE group AS st, COUNT(F1) AS n;\nDUMP S;\n"
    ).format(d=sf_dir)
    s2 = (
        "L = LOAD '{d}/lineitem.parquet' USING ParquetStorage();\n"
        "F1 = FILTER L BY l_quantity > 30.0;\n"
        "M = FOREACH F1 GENERATE l_orderkey;\nDUMP M;\n"
    ).format(d=sf_dir)
    eng = pg.PigEngine(spark, options={
        "materialization_dir": mat, "profiling": True})
    eng.run_all([s1, s2])
    got_s = sorted(tuple(r) for r in eng.df("S").collect())
    got_m_n = eng.df("M").count()
    # session cache holds the shared F1 frontier — and script 1's
    # profiling pass must NOT have unpersisted it (that would make
    # every later script silently recompute the shared prefix)
    assert eng.executor.session_cache
    for df in eng.executor.session_cache.values():
        assert df.storageLevel.useMemory or df.storageLevel.useDisk
    # script 2 physically read the in-memory shared result
    plan = eng.df("M")._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    # values match a plain unprofiled engine
    ref = pg.PigEngine(spark)
    ref.run(s1)
    assert got_s == sorted(tuple(r) for r in ref.df("S").collect())
    ref2 = pg.PigEngine(spark)
    ref2.run(s2)
    assert got_m_n == ref2.df("M").count()
    eng.clear_session_cache()
