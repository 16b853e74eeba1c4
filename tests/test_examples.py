"""The examples/ scripts run end-to-end through the engine."""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

import piglet_spark as pg

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def test_training_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """quality gates -> repetition gates -> pii scrub -> exact dedup
    -> per-source cap -> mixture -> packing, composed purely in the
    DSL; every stage is monotone non-increasing in row count and the
    packed output covers the survivors' tokens exactly."""
    script = (EXAMPLES / "training_pipeline.pig").read_text()
    out = tmp_path / "packed"
    eng = pg.PigEngine(spark, params={"sf": str(sf_dir),
                                      "out": str(out)})
    env = eng.run(script)

    n_docs = env["D"].count()
    n_q = env["QOK"].count()
    n_u = eng.df("U").count()
    n_cap = eng.df("CAP").count()
    n_mix = eng.df("MIX").count()
    n_train = eng.df("TRAIN").count()
    packed = eng.df("PACKED")
    n_packed = packed.count()
    assert n_docs >= n_q >= 1
    assert n_u >= n_cap >= n_mix >= n_train >= 1
    assert n_packed == n_train  # chunk_pack: one row per surviving doc
    # the split partitions MIX exactly
    spl = {r["split"]: r["n"] for r in
           eng.df("SPL").groupBy("split")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(spl.values()) == n_mix and spl.get("train") == n_train

    # per-source cap actually binds
    caps = (eng.df("CAP").groupBy("source").count()
            .agg(F.max("count")).collect()[0][0])
    assert caps <= 40

    # packing invariant: consecutive docs tile the token stream
    rows = sorted(packed.collect(), key=lambda r: r["doc_id"])
    pos = 0
    for r in rows:
        assert r["start_tok"] == pos
        pos += r["n_tokens"]

    # the STORE landed readable parquet with the same rows
    back = spark.read.parquet(str(out))
    assert back.count() == n_packed


def test_training_pipeline_quality_gate_filters(spark, sf_dir):
    """The quality gate is a real filter: QOK strictly excludes some
    documents at the test SF (guards against a vacuous example)."""
    script = (EXAMPLES / "training_pipeline.pig").read_text()
    eng = pg.PigEngine(spark, params={"sf": str(sf_dir),
                                      "out": "/tmp/_tpx"})
    env = eng.run(script)
    assert env["QOK"].count() < env["D"].count()


def test_rag_index_end_to_end(spark, sf_dir):
    """duplicate-span gate -> chunking -> SemDeDup -> IVF ANN, in the
    DSL; the ANN hits agree with brute-force cosine top-k restricted
    to the deduped vectors."""
    from piglet_spark.datapipe import similarity

    script = (EXAMPLES / "rag_index.pig").read_text()
    qvec = ",".join(["0.1"] * 64)
    eng = pg.PigEngine(spark, params={"sf": str(sf_dir), "qvec": qvec})
    env = eng.run(script)

    assert env["CLEAN"].count() <= env["SP"].count()
    # every chunk respects the window size
    mx = eng.df("CH").agg(F.max("n_chunk_tokens")).collect()[0][0]
    assert mx <= 64
    # deduped vector set is a subset, ANN returns k hits from it
    kept = {r["vec_id"] for r in env["KEEP"].collect()}
    hits = eng.df("HITS").collect()
    assert 0 < len(hits) <= 10
    assert {r["vec_id"] for r in hits} <= kept
    # recall sanity vs exact top-k over the same deduped set
    v = eng.df("V")
    exact = {r["vec_id"] for r in similarity.cosine_topk(
        v, [0.1] * 64, k=10).collect()}
    got = {r["vec_id"] for r in hits}
    assert len(got & exact) >= 5  # IVF probes >= half the exact set


def test_corpus_curation_end_to_end(spark, sf_dir, tmp_path):
    """The r07d curation example runs end-to-end: decontamination
    gate keeps a non-trivial subset, the report covers every
    surviving source, sessions are well-formed."""
    import piglet_spark as pg
    script = (EXAMPLES / "corpus_curation.pig").read_text()
    eng = pg.PigEngine(spark,
                       params={"sf": str(sf_dir),
                               "out": str(tmp_path / "cur")})
    eng.run(script)
    n_docs = eng.df("D").count()
    n_clean = eng.df("CLEAN").count()
    assert 0 < n_clean < n_docs  # src0 (the benchmark) always drops
    rpt = {r["source"]: r for r in eng.df("RPT").collect()}
    assert "src0" not in rpt and rpt
    assert all(r["n_docs"] > 0 and 0 <= r["dup_rate"] <= 1
               for r in rpt.values())
    nd = eng.df("ND").collect()
    assert all(r["id_b"] < r["id_a"] for r in nd)  # first-seen = min id
    sess = spark.read.parquet(str(tmp_path / "cur" / "sessions"))
    srow = sess.collect()
    assert srow and all(r["duration_sec"] >= 0 for r in srow)
    assert sess.count() == eng.df("SESS").count()


def test_retrieval_quality_end_to_end(spark, sf_dir):
    """The r08f surfaces compose in one DSL script: MMR ranks are
    dense 1..5 per query, the quantization audit partitions the
    vectors, the OOV screen covers every doc, the funnel is monotone,
    and compaction yields one row per user."""
    script = (EXAMPLES / "retrieval_quality.pig").read_text()
    eng = pg.PigEngine(spark, params={"sf": str(sf_dir)})
    env = eng.run(script)
    m = env["M"].collect()
    per_q = {}
    for r in m:
        per_q.setdefault(r.qid, []).append(r.mmr_rank)
    assert per_q and all(sorted(v) == list(range(1, len(v) + 1))
                         for v in per_q.values())
    n_vec = env["E"].count()
    assert env["Q"].count() <= n_vec          # degenerate excluded
    assert env["SAFE"].count() <= env["Q"].count()
    assert env["VC"].count() == env["D"].count()
    fu = {r.step: r.users for r in env["FU"].collect()}
    assert list(fu) and fu[1] >= fu[2] >= fu[3] >= 0
    users = env["EV"].select("user_id").distinct().count()
    assert env["CUR"].count() == users


def test_knowledge_graph_end_to_end(spark, sf_dir):
    """RDF example: plain BGP, TUPLIFY'd grouped layout, grouped star
    join and bound-group-key patterns — results pinned against
    DataFrame-computed truth on the same events table."""
    script = (EXAMPLES / "knowledge_graph.pig").read_text()
    eng = pg.PigEngine(spark, params={"sf": str(sf_dir)})
    env = eng.run(script)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # plain path: one row per purchase edge, triple schema kept
    assert env["PUR"].columns == ["subject", "predicate", "object"]
    assert env["PUR"].count() == ev.filter("event_type = 'purchase'").count()
    # grouped star join: users with BOTH a click and a purchase
    want = {f"u{r['user_id']}" for r in
            (ev.filter("event_type = 'click'").select("user_id")
             .intersect(ev.filter("event_type = 'purchase'")
                        .select("user_id")).collect())}
    got = {r["subject"] for r in env["BUYERS"].collect()}
    assert env["BUYERS"].columns == ["subject", "stmts"]
    assert got == want and len(got) > 0
    # bound group key: u1's bag survives iff u1 ever clicked
    u1_clicked = ev.filter("user_id = 1 and event_type = 'click'").count() > 0
    assert (env["U1"].count() == 1) == u1_clicked
    # report: edge counts equal the user's full event count
    n1 = {r["user"]: r["n_edges"] for r in eng.df("N").collect()}
    per_user = {f"u{r['user_id']}": r["n"] for r in
                ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
    for u, n in n1.items():
        assert per_user[u] == n
