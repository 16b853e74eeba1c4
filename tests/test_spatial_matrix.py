"""Spatial operators, matrix type, infrastructure long tail."""

import piglet_spark as pg


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_geometry_point_filter(spark, tmp_path):
    p = tmp_path / "ev.csv"
    p.write_text("a,50.1,10.2\nb,50.5,10.9\nc,50.1,10.2\n")
    eng = pg.PigEngine(spark)
    eng.run(f"""
a = LOAD '{p}' USING PigStorage(',') AS (name: chararray, lat: double, lon: chararray);
b = FOREACH a GENERATE name, geometry('POINT(' + lat + ' ' + lon + ')') AS loc;
c = SPATIAL_FILTER b BY containedby(loc, geometry('POINT(50.1 10.2)'));
d = FOREACH c GENERATE name;
""")
    assert rows(eng.df("d")) == [("a",), ("c",)]


def test_point_in_polygon(spark, tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text("in1,0.5,0.5\nout1,2.0,2.0\nin2,0.9,0.1\nedgeout,1.5,0.5\n")
    eng = pg.PigEngine(spark)
    eng.run(f"""
a = LOAD '{p}' USING PigStorage(',') AS (name: chararray, x: double, y: double);
b = FOREACH a GENERATE name, geometry('POINT(' + x + ' ' + y + ')') AS loc;
c = SPATIAL_FILTER b BY containedby(loc, geometry('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))'));
d = FOREACH c GENERATE name;
""")
    assert rows(eng.df("d")) == [("in1",), ("in2",)]


def test_spatial_join(spark, tmp_path):
    p = tmp_path / "ev2.csv"
    p.write_text("a,1.0,1.0\nb,2.0,2.0\nc,1.0,1.0\n")
    eng = pg.PigEngine(spark)
    eng.run(f"""
a1 = LOAD '{p}' USING PigStorage(',') AS (name: chararray, x: double, y: double);
b1 = FOREACH a1 GENERATE name, geometry('POINT(' + x + ' ' + y + ')') AS loc;
a2 = LOAD '{p}' USING PigStorage(',') AS (name: chararray, x: double, y: double);
b2 = FOREACH a2 GENERATE name, geometry('POINT(' + x + ' ' + y + ')') AS loc;
c = SPATIAL_JOIN b1, b2 ON containedby(loc, loc);
d = FOREACH c GENERATE b1::name AS n1, b2::name AS n2;
""")
    got = rows(eng.df("d"))
    # a and c coincide; b only matches itself
    assert got == [("a", "a"), ("a", "c"), ("b", "b"), ("c", "a"), ("c", "c")]


def test_polygon_polygon_exact(spark):
    """Exact polygon⊇polygon / polygon∩polygon (not bbox-approximate):
    bbox-overlapping-but-disjoint triangles must NOT intersect; a
    partially-escaping polygon must intersect but not be contained."""
    from pyspark.sql import functions as F
    from piglet_spark.functions import spatial as sp

    outer = "POLYGON((0 0, 10 0, 0 10, 0 0))"          # lower-left triangle
    corner = "POLYGON((9 9, 10 9, 9 10, 9 9))"         # in bbox, outside shape
    inner = "POLYGON((1 1, 3 1, 1 3, 1 1))"            # fully inside outer
    crossing = "POLYGON((4 4, 14 4, 4 14, 4 4))"       # straddles the edge
    df = spark.range(1).select(
        sp.geometry(F.lit(outer)).alias("a"),
        sp.geometry(F.lit(corner)).alias("corner"),
        sp.geometry(F.lit(inner)).alias("inner"),
        sp.geometry(F.lit(crossing)).alias("crossing"))
    row = df.select(
        sp.intersects(F.col("a"), F.col("corner")).alias("i_corner"),
        sp.contains(F.col("a"), F.col("inner")).alias("c_inner"),
        sp.intersects(F.col("a"), F.col("inner")).alias("i_inner"),
        sp.contains(F.col("a"), F.col("crossing")).alias("c_crossing"),
        sp.intersects(F.col("a"), F.col("crossing")).alias("i_crossing"),
        sp.intersects(F.col("a"), F.col("a")).alias("i_self"),
    ).collect()[0]
    assert row.i_corner is False      # bbox overlap alone is not enough
    assert row.c_inner is True and row.i_inner is True
    assert row.c_crossing is False and row.i_crossing is True
    assert row.i_self is True         # shared vertices → intersecting


def test_polygon_touch_intersects(spark):
    """Boundary-touching polygons intersect (JTS/STARK 'touches' ⊂
    intersects): edge-adjacent with no shared vertex, and T-touch."""
    from pyspark.sql import functions as F
    from piglet_spark.functions import spatial as sp

    a = "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"
    edge_adj = "POLYGON((4 1, 8 1, 8 3, 4 3, 4 1))"   # shares x=4 segment
    t_touch = "POLYGON((4 2, 8 5, 8 6, 4 2))"         # vertex on a's edge
    away = "POLYGON((5 5, 8 5, 8 8, 5 5))"            # bbox-overlap only
    df = spark.range(1).select(
        sp.geometry(F.lit(a)).alias("a"),
        sp.geometry(F.lit(edge_adj)).alias("e"),
        sp.geometry(F.lit(t_touch)).alias("t"),
        sp.geometry(F.lit(away)).alias("w"))
    row = df.select(
        sp.intersects(F.col("a"), F.col("e")).alias("i_edge"),
        sp.intersects(F.col("a"), F.col("t")).alias("i_t"),
        sp.intersects(F.col("a"), F.col("w")).alias("i_away"),
    ).collect()[0]
    assert row.i_edge is True
    assert row.i_t is True
    assert row.i_away is False


def test_matrix_sparse_empty_and_null(spark):
    """Sparse constructor handles all-zero/empty data; NULL elements
    are preserved (not silently read back as 0)."""
    from pyspark.sql import functions as F
    from piglet_spark.functions.matrix import matrix_cons, matrix_get

    df = spark.range(1).select(
        matrix_cons("double", True, 2, 2,
                    F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0))
        .alias("z"),
        matrix_cons("double", True, 2, 2,
                    F.lit(None).cast("double"), F.lit(3.0),
                    F.lit(0.0), F.lit(0.0)).alias("n"))
    row = df.select(
        F.col("z")["idx"].alias("z_idx"),
        matrix_get(F.col("z"), 1, 1).alias("z_get"),
        matrix_get(F.col("n"), 0, 0).alias("n_null"),
        matrix_get(F.col("n"), 1, 0).alias("n_val"),
    ).collect()[0]
    assert list(row.z_idx) == [] and row.z_get == 0.0
    assert row.n_null is None and row.n_val == 3.0


def test_st_distance(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("a,0.0,0.0\n")
    eng = pg.PigEngine(spark)
    eng.run(f"""
a = LOAD '{p}' USING PigStorage(',') AS (name: chararray, x: double, y: double);
b = FOREACH a GENERATE ST_DISTANCE(geometry('POINT(' + x + ' ' + y + ')'),
                                   geometry('POINT(3.0 4.0)')) AS d;
""")
    assert rows(eng.df("b")) == [(5.0,)]


def test_matrix_constructor(spark, tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("1.0,2.0,3.0,4.0,5.0,6.0\n")
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{p}' USING PigStorage(',') AS (v11: double, v12: double, v21: double, v22: double, v31: double, v32: double);
B = FOREACH A GENERATE ddmatrix(2, 3, {{v11, v12, v21, v22, v31, v32}}) AS m;
C = FOREACH B GENERATE m.rows AS r, m.cols AS c, matrix_get(m, 1, 2) AS e12;
""")
    assert rows(eng.df("C")) == [(2, 3, 6.0)]


def test_matrix_scalar_args(spark, tmp_path):
    p = tmp_path / "m2.csv"
    p.write_text("1,2,3,4\n")
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{p}' USING PigStorage(',') AS (a: int, b: int, c: int, d: int);
B = FOREACH A GENERATE dimatrix(2, 2, a, b, c, d) AS m;
C = FOREACH B GENERATE matrix_get(m, 0, 1) AS e01, matrix_get(m, 1, 0) AS e10;
""")
    # column-major (Breeze) layout: [1,2,3,4] → (0,1)=3, (1,0)=2
    assert rows(eng.df("C")) == [(3, 2)]


def test_matrix_sparse(spark, tmp_path):
    """Sparse spellings store only nonzeros (COO over column-major
    linear indices); access and transpose agree with the dense path."""
    p = tmp_path / "m3.csv"
    p.write_text("0.0,5.0,0.0,0.0,0.0,7.0\n")
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{p}' USING PigStorage(',') AS (a: double, b: double, c: double, d: double, e: double, f: double);
B = FOREACH A GENERATE sdmatrix(2, 3, a, b, c, d, e, f) AS m;
C = FOREACH B GENERATE m.rows AS r, m.cols AS c, matrix_get(m, 1, 0) AS nz,
    matrix_get(m, 0, 0) AS z, matrix_get(m, 1, 2) AS f_val;
D = FOREACH B GENERATE matrix_transpose(m) AS t;
E = FOREACH D GENERATE t.rows AS r, t.cols AS c, matrix_get(t, 0, 1) AS nz,
    matrix_get(t, 2, 1) AS f_val;
""")
    assert rows(eng.df("C")) == [(2, 3, 5.0, 0.0, 7.0)]
    assert rows(eng.df("E")) == [(3, 2, 5.0, 7.0)]
    # only the two nonzeros are stored
    m = eng.df("B").collect()[0]["m"]
    assert list(m["idx"]) == [1, 5] and list(m["data"]) == [5.0, 7.0]


def test_partition_and_index(spark, data_dir):
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{data_dir}/t.csv' USING PigStorage(',') AS (f1:int, f2:int, f3:int);
P = PARTITION A ON f1 USING grid(2.0);
I = INDEX P ON f1 USING rtree();
D = DELAY I BY (1, 1);
""")
    # wtime=1ms/partition, sample factor 1 = identity (ref arg order:
    # PigParser.scala:1041 — wait time first, sample second)
    assert len(rows(eng.df("D"))) == 4


def test_delay_semantics(spark, data_dir):
    """DELAY's real reference semantics (DelayEmitter.scala): sleep
    per partition, then duplicate rows (sample ≥ 0) or hash-subsample
    ~1/|sample| (sample < 0, deterministic divergence)."""
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{data_dir}/t.csv' USING PigStorage(',') AS (f1:int, f2:int, f3:int);
T = DELAY A BY (0, 3);
Z = DELAY A BY (0, 0);
S = DELAY A BY ('0.01S', -2);
""")
    base = rows(eng.df("A"))
    trip = rows(eng.df("T"))
    assert len(trip) == 3 * len(base)       # each row 3×
    assert sorted(set(trip)) == base
    assert rows(eng.df("Z")) == []          # 0 until 0 = empty
    sub = rows(eng.df("S"))
    assert set(sub) <= set(base)            # deterministic subsample
    assert rows(eng.df("S")) == sub          # reproducible
    import pytest as _pytest
    with _pytest.raises(Exception, match="unparseable wait time"):
        eng.run("B = DELAY A BY ('nonsense', 1);\nDESCRIBE B;")


def test_visualize_svg(spark, tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text("a,1.0,2.0\nb,3.0,4.0\n")
    out = tmp_path / "plot"
    eng = pg.PigEngine(spark)
    eng.run(f"""
a = LOAD '{p}' USING PigStorage(',') AS (name: chararray, x: double, y: double);
b = FOREACH a GENERATE geometry('POINT(' + x + ' ' + y + ')') AS loc;
VISUALIZE b BY loc INTO '{out}' AS (200, 100);
""")
    svg = (tmp_path / "plot.svg").read_text()
    assert svg.count("<circle") == 2 and 'width="200"' in svg


def test_fs_cmd(spark, tmp_path):
    src = tmp_path / "src.txt"
    src.write_text("hello")
    dst = tmp_path / "dst.txt"
    pg.run(spark, f"""
fs -mkdir '{tmp_path}/newdir';
fs -cp '{src}' '{dst}';
""")
    assert dst.read_text() == "hello"
    assert (tmp_path / "newdir").is_dir()


def test_fs_cmd_hadoop_passthrough(spark, tmp_path, monkeypatch):
    """r06 (advisor): passthrough to a hadoop binary is OPT-IN — via
    `SET piglet.fs 'hdfs'` or HADOOP_CONF_DIR — so a dev machine that
    merely has hadoop on PATH keeps local-filesystem semantics."""
    import os
    fake = tmp_path / "bin" / "hadoop"
    fake.parent.mkdir()
    log = tmp_path / "calls.log"
    fake.write_text(f"#!/bin/sh\necho \"$@\" >> '{log}'\n")
    fake.chmod(0o755)
    monkeypatch.setenv("PATH",
                       f"{fake.parent}:{os.environ.get('PATH', '')}")
    monkeypatch.delenv("HADOOP_CONF_DIR", raising=False)
    # binary presence alone does NOT trigger passthrough: the dir is
    # created locally and the fake hadoop logs nothing
    d0 = tmp_path / "plainlocal"
    pg.run(spark, f"fs -mkdir '{d0}';")
    assert d0.is_dir()
    assert not log.exists()
    # explicit opt-in routes through hadoop verbatim
    pg.run(spark, "SET piglet.fs 'hdfs';\nfs -mkdir '/hdfs/path/one';")
    assert log.read_text().strip() == "fs -mkdir /hdfs/path/one"
    # HADOOP_CONF_DIR (a configured edge node) also opts in
    monkeypatch.setenv("HADOOP_CONF_DIR", str(tmp_path))
    pg.run(spark, "fs -mkdir '/hdfs/path/two';")
    assert log.read_text().strip().splitlines()[-1] \
        == "fs -mkdir /hdfs/path/two"
    # failure propagates as ExecError with the hadoop stderr
    import pytest as _pytest
    from piglet_spark.operators.executor import ExecError
    fake.write_text("#!/bin/sh\necho boom >&2\nexit 1\n")
    with _pytest.raises(ExecError, match="boom"):
        pg.run(spark, "SET piglet.fs 'hdfs';\nfs -rm '/hdfs/x';")
    # piglet.fs 'hdfs' with no binary at all is a clear error
    monkeypatch.setenv("PATH", "/nonexistent")
    with _pytest.raises(ExecError, match="no hadoop"):
        pg.run(spark, "SET piglet.fs 'hdfs';\nfs -ls '/';")
    # explicit local override wins even with HADOOP_CONF_DIR set
    monkeypatch.setenv("PATH",
                       f"{fake.parent}:{os.environ.get('PATH', '')}")
    d = tmp_path / "localdir"
    before = log.read_text() if log.exists() else ""
    pg.run(spark, f"SET piglet.fs 'local';\nfs -mkdir '{d}';")
    assert d.is_dir()
    assert (log.read_text() if log.exists() else "") == before


def test_rscript_clear_error(spark, data_dir):
    import pytest
    from piglet_spark.operators.executor import ExecError
    with pytest.raises(ExecError, match="RSCRIPT"):
        pg.run(spark, f"""
A = LOAD '{data_dir}/t.csv' USING PigStorage(',') AS (f1:int, f2:int, f3:int);
B = RSCRIPT A USING 'res <- $_';
C = FOREACH B GENERATE $0;
""")


def test_fs_cmd_flag_args(spark, tmp_path, monkeypatch):
    """r05 review: `fs -rm -r '/x'` must keep '-r' as one flag token —
    forwarded verbatim to hadoop, ignored by the local handlers."""
    import os
    d = tmp_path / "doomed"
    d.mkdir()
    (d / "f.txt").write_text("x")
    # local: flag ignored, dir removed recursively
    pg.run(spark, f"fs -rm -r '{d}';")
    assert not d.exists()
    # passthrough: hadoop sees the flag intact
    fake = tmp_path / "bin" / "hadoop"
    fake.parent.mkdir()
    log = tmp_path / "calls.log"
    fake.write_text(f"#!/bin/sh\necho \"$@\" >> '{log}'\n")
    fake.chmod(0o755)
    monkeypatch.setenv("PATH",
                       f"{fake.parent}:{os.environ.get('PATH', '')}")
    pg.run(spark, "SET piglet.fs 'hdfs';\nfs -rm -r '/hdfs/x';")
    assert log.read_text().strip() == "fs -rm -r /hdfs/x"


def test_macro_with_split_and_string_param(spark, tmp_path):
    """r05: macros containing SPLIT get their branch aliases renamed
    and substituted; $params inside string literals substitute
    textually (Pig parity)."""
    p = tmp_path / "v.csv"
    p.write_text("1\n7\n9\n3\n")
    eng = pg.PigEngine(spark)
    env = eng.run(f"""
DEFINE splitld(path, big) RETURNS hi {{
  a = LOAD '$path' USING PigStorage(',') AS (x:int);
  SPLIT a INTO $hi IF x > $big, lo IF x <= $big;
}};
H = splitld('{p}', 5);
C = FILTER H BY x > 8;
""")
    assert sorted(r["x"] for r in env["H"].collect()) == [7, 9]
    assert [r["x"] for r in env["C"].collect()] == [9]


def test_point_on_polygon_edge_intersects(spark):
    from pyspark.sql import functions as F
    from piglet_spark.functions import spatial as sp
    df = spark.range(1).select(
        sp.geometry(F.lit("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")).alias("p"),
        sp.geometry(F.lit("POINT(2 4)")).alias("top"),
        sp.geometry(F.lit("POINT(2 0)")).alias("bot"),
        sp.geometry(F.lit("POINT(9 9)")).alias("far"))
    r = df.select(
        sp.intersects(F.col("top"), F.col("p")).alias("t"),
        sp.intersects(F.col("p"), F.col("top")).alias("t2"),
        sp.intersects(F.col("bot"), F.col("p")).alias("b"),
        sp.intersects(F.col("far"), F.col("p")).alias("f")).collect()[0]
    assert r.t is True and r.t2 is True and r.b is True and r.f is False


def test_wkt_holes_rejected(spark):
    from pyspark.sql import functions as F
    from piglet_spark.functions import spatial as sp
    import pytest as _pt
    df = spark.range(1).select(sp.geometry(F.lit(
        "POLYGON ((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))"))
        .alias("g"))
    with _pt.raises(Exception, match="interior rings"):
        df.collect()


def test_matrix_1x1_scalar_field(spark, tmp_path):
    p = tmp_path / "one.csv"
    p.write_text("7\n")
    eng = pg.PigEngine(spark)
    env = eng.run(f"""
A = LOAD '{p}' USING PigStorage(',') AS (x:int);
B = FOREACH A GENERATE dimatrix(1, 1, x) AS m;
C = FOREACH B GENERATE matrix_get(m, 0, 0) AS v;
""")
    assert env["C"].first()["v"] == 7


def test_matrix_algebra_numpy_parity(spark, tmp_path):
    """r09: matrix_add/sub/scale/mul vs numpy on a dense×sparse mix —
    Breeze arithmetic the reference only reaches via RSCRIPT, exposed
    engine-side as pure HOF expressions (no UDF, no R runtime)."""
    import numpy as np
    p = tmp_path / "ma.csv"
    p.write_text("1.0,2.0,3.0,4.0,5.0,6.0\n")
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{p}' USING PigStorage(',') AS (a: double, b: double, c: double, d: double, e: double, f: double);
B = FOREACH A GENERATE ddmatrix(2, 3, a, b, c, d, e, f) AS m,
    sdmatrix(2, 3, a, 0.0, c, 0.0, e, f) AS s,
    ddmatrix(3, 2, a, b, c, d, e, f) AS n;
C = FOREACH B GENERATE matrix_add(m, s) AS madd, matrix_sub(m, s) AS msub,
    matrix_scale(m, 2.5) AS msc, matrix_mul(m, n) AS mprod,
    matrix_mul(s, n) AS sprod, matrix_add(m, n) AS bad;
""")
    r = eng.df("C").collect()[0]
    M = np.array([1, 2, 3, 4, 5, 6], dtype=float).reshape((3, 2)).T
    S = np.array([1, 0, 3, 0, 5, 6], dtype=float).reshape((3, 2)).T
    N = np.array([1, 2, 3, 4, 5, 6], dtype=float).reshape((2, 3)).T

    def as_np(mr):
        return np.array(mr["data"]).reshape((mr["cols"], mr["rows"])).T

    assert np.allclose(as_np(r["madd"]), M + S)
    assert np.allclose(as_np(r["msub"]), M - S)
    assert np.allclose(as_np(r["msc"]), M * 2.5)
    assert r["mprod"]["rows"] == 2 and r["mprod"]["cols"] == 2
    assert np.allclose(as_np(r["mprod"]), M @ N)
    assert np.allclose(as_np(r["sprod"]), S @ N)
    # dimension mismatch is Pig null-on-error, not an exception
    assert r["bad"] is None


def test_matrix_algebra_int_and_sparse_scale(spark, tmp_path):
    """Int matrices keep int arithmetic; scaling a sparse matrix
    keeps the sparse representation (O(nnz), zeros never stored)."""
    p = tmp_path / "mi.csv"
    p.write_text("1,2,3,4\n")
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{p}' USING PigStorage(',') AS (a: int, b: int, c: int, d: int);
B = FOREACH A GENERATE dimatrix(2, 2, a, b, c, d) AS m,
    simatrix(2, 2, a, 0, 0, d) AS s;
C = FOREACH B GENERATE matrix_mul(m, m) AS sq, matrix_scale(s, 3) AS s3;
D = FOREACH C GENERATE matrix_get(sq, 0, 0) AS p00, matrix_get(sq, 1, 1) AS p11,
    matrix_get(s3, 0, 0) AS t00, matrix_get(s3, 1, 0) AS t10;
""")
    # col-major [1,2,3,4] = [[1,3],[2,4]]; square = [[7,15],[10,22]]
    assert rows(eng.df("D")) == [(7, 22, 3, 0)]
    r = eng.df("C").collect()[0]
    assert r["s3"]["idx"] is not None and len(r["s3"]["data"]) == 2


def test_matrix_mul_all_zero_sparse(spark, tmp_path):
    """An all-zero sparse operand (empty data array) multiplies to
    zeros, not NULLs."""
    p = tmp_path / "mz.csv"
    p.write_text("1.0,2.0,3.0,4.0\n")
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{p}' USING PigStorage(',') AS (a: double, b: double, c: double, d: double);
B = FOREACH A GENERATE ddmatrix(2, 2, a, b, c, d) AS m,
    sdmatrix(2, 2, 0.0, 0.0, 0.0, 0.0) AS z;
C = FOREACH B GENERATE matrix_mul(m, z) AS mz;
D = FOREACH C GENERATE matrix_get(mz, 0, 0) AS e00, matrix_get(mz, 1, 1) AS e11;
""")
    assert rows(eng.df("D")) == [(0.0, 0.0)]


def test_spatial_join_bsp_matches_grid(spark, tmp_path):
    """r10 BSP prejoin (ref PartitionerEmitter.scala:29 STARK
    BSPartitioner): SPATIAL_JOIN routed through PARTITION BY bsp(n)
    returns exactly the grid-prejoin result set — the prejoin only
    shapes the candidate set (closed leaf rects ⇒ completeness); the
    exact predicate decides membership either way."""
    import random
    rng = random.Random(11)
    p = tmp_path / "pts_bsp.csv"
    rows_ = [f"p{i},{rng.uniform(0, 4):.3f},{rng.uniform(0, 4):.3f}"
             for i in range(60)]
    p.write_text("\n".join(rows_) + "\n")
    poly = tmp_path / "poly_bsp.csv"
    poly.write_text(  # ';'-delimited: the WKT itself contains commas
        "z1;POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))\n"
        "z2;POLYGON((1 1, 4 1, 4 4, 1 4, 1 1))\n")
    script = """
a1 = LOAD '{pts}' USING PigStorage(',') AS (name: chararray, x: double, y: double);
b1 = FOREACH a1 GENERATE name, geometry('POINT(' + x + ' ' + y + ')') AS loc;
a2 = LOAD '{poly}' USING PigStorage(';') AS (zone: chararray, wkt: chararray);
b2 = FOREACH a2 GENERATE zone, geometry(wkt) AS area;
c = SPATIAL_JOIN b1{lp}, b2{rp} ON containedby(loc, area);
d = FOREACH c GENERATE b1::name AS n, b2::zone AS z;
"""
    eng1 = pg.PigEngine(spark)
    eng1.run(script.format(pts=p, poly=poly, lp="", rp=""))
    grid = rows(eng1.df("d"))
    eng2 = pg.PigEngine(spark)
    eng2.run(script.format(pts=p, poly=poly,
                           lp=" PARTITION BY bsp(8)", rp=""))
    bsp = rows(eng2.df("d"))
    assert bsp == grid and len(grid) > 0


def test_partition_bsp_keeps_rows_and_balances_skew(spark, tmp_path):
    """PARTITION … USING bsp(n): the relation's rows are unchanged
    (it is a partitioning, not a filter), and on SKEWED points the
    adaptive median splits bound every leaf near the equi-depth
    ideal while a fixed grid piles ~90% of the data into one hot
    cell — the reason STARK ships a BSPartitioner at all."""
    import random
    from pyspark.sql import functions as F
    from piglet_spark.functions import spatial as sp
    rng = random.Random(7)
    # 90% clustered in [0, 0.1)², 10% spread over [0, 10)²
    lines = []
    for i in range(900):
        lines.append(f"c{i},{rng.uniform(0, 0.1):.5f},"
                     f"{rng.uniform(0, 0.1):.5f}")
    for i in range(100):
        lines.append(f"s{i},{rng.uniform(0, 10):.5f},"
                     f"{rng.uniform(0, 10):.5f}")
    p = tmp_path / "skew.csv"
    p.write_text("\n".join(lines) + "\n")
    eng = pg.PigEngine(spark)
    eng.run(f"""
a = LOAD '{p}' USING PigStorage(',') AS (name: chararray, x: double, y: double);
b = FOREACH a GENERATE name, geometry('POINT(' + x + ' ' + y + ')') AS loc;
P = PARTITION b ON loc USING bsp(16);
""")
    out = eng.df("P")
    assert out.count() == 1000
    assert sorted(r["name"] for r in out.collect()) == \
        sorted(l.split(",")[0] for l in lines)
    # leaf balance, measured directly on the assignment expression
    df = out
    g = F.col("loc")
    pts = sp.bsp_sample_points(df, g, 4096)
    tree = sp.bsp_tree(pts, 16)
    leaf = sp.bsp_assign(g["xs"][0], g["ys"][0], tree)
    counts = sorted(
        r["n"] for r in
        df.groupBy(leaf.alias("_l")).agg(F.count("*").alias("n"))
        .collect())
    ideal = 1000 / 16
    assert counts[-1] <= 3 * ideal, counts  # no hot leaf
    # the fixed 1.0-grid piles the whole cluster into ONE cell
    gcounts = sorted(
        r["n"] for r in
        df.groupBy(sp.grid_cell(g, 1.0).alias("_c"))
        .agg(F.count("*").alias("n")).collect())
    assert gcounts[-1] >= 900  # hot cell
    assert counts[-1] < gcounts[-1] / 4


def test_partition_bsp_numeric_field(spark, data_dir):
    """1-D BSP on a plain numeric field: equi-depth value splits,
    rows unchanged."""
    eng = pg.PigEngine(spark)
    eng.run(f"""
A = LOAD '{data_dir}/t.csv' USING PigStorage(',') AS (f1: int, f2: int, f3: int);
P = PARTITION A ON f1 USING bsp(2);
""")
    assert rows(eng.df("P")) == rows(eng.df("A"))


def test_spatial_join_bsp_to_code_parity(spark, tmp_path):
    """to_code emits the runtime-trained BSP prejoin; exec'd code
    matches the engine result."""
    p = tmp_path / "pts_cg.csv"
    p.write_text("a,1.0,1.0\nb,2.0,2.0\nc,1.0,1.0\n")
    script = f"""
a1 = LOAD '{p}' USING PigStorage(',') AS (name: chararray, x: double, y: double);
b1 = FOREACH a1 GENERATE name, geometry('POINT(' + x + ' ' + y + ')') AS loc;
a2 = LOAD '{p}' USING PigStorage(',') AS (name: chararray, x: double, y: double);
b2 = FOREACH a2 GENERATE name, geometry('POINT(' + x + ' ' + y + ')') AS loc;
c = SPATIAL_JOIN b1 PARTITION BY bsp(4), b2 ON containedby(loc, loc);
d = FOREACH c GENERATE b1::name AS n1, b2::name AS n2;
"""
    eng = pg.PigEngine(spark)
    eng.run(script)
    want = rows(eng.df("d"))
    code = eng.to_code(script)
    ns = {"spark": spark}
    exec(code, ns)
    assert rows(ns["d"]) == want == [
        ("a", "a"), ("a", "c"), ("b", "b"), ("c", "a"), ("c", "c")]
