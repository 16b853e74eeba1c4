"""End-to-end LLM-data-pipeline integration: the full assembly line
composed in ONE Pig script — hygiene (PII scrub) → exact dedup →
quality gate → mixture sampling → DSIR resampling → sequence packing →
partitioned parquet out. Proves the STREAM THROUGH ops compose (each
op's output schema feeds the next) and that the engine executes the
whole DAG lazily with sinks driving it."""

import pyspark.sql.functions as F
import pytest

import piglet_spark as pg


@pytest.fixture(scope="module")
def docs_parquet(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    p = str(d / "docs.parquet")
    rows = []
    words = ["the", "model", "trains", "on", "clean", "text", "data",
             "quality", "tokens", "corpus"]
    for i in range(120):
        n = 6 + (i % 9)
        text = " ".join(words[(i + j) % len(words)] for j in range(n))
        if i % 10 == 0:
            text += " contact bob@example.com now"  # PII to scrub
        if i % 17 == 0:
            text = "the model trains on clean text"  # exact dups
        rows.append((i, text, f"src{i % 3}"))
    spark.createDataFrame(rows, ["doc_id", "text", "source"]) \
        .write.mode("overwrite").parquet(p)
    return p


def test_full_pipeline_one_script(spark, docs_parquet, tmp_path):
    out = str(tmp_path / "packed")
    eng = pg.PigEngine(spark)
    env = eng.run(f"""
D  = LOAD '{docs_parquet}' USING ParquetStorage();
-- hygiene: redact PII in place
C  = STREAM D THROUGH pii_scrub();
-- exact dedup: fingerprint -> keeper table, join back to keep one
K  = STREAM C THROUGH exact_dedup();
J  = JOIN C BY doc_id, K BY keep_id;
U  = FOREACH J GENERATE C::doc_id AS doc_id, C::text AS text,
                        C::source AS source;
-- mixture: downsample src2, keep the rest
M  = STREAM U THROUGH mixture_sample('src0:1.0,src1:1.0,src2:0.5', 7);
-- target-aware resampling toward src0
R  = STREAM M THROUGH dsir_resample('src0', 0.8, 64, 7);
-- keep only resampled winners, then pack into 16-token sequences
W  = JOIN M BY doc_id, R BY doc_id;
S  = FOREACH W GENERATE M::doc_id AS doc_id, M::text AS text,
                        M::source AS source;
P  = STREAM S THROUGH chunk_pack(16);
STORE P INTO '{out}' USING ParquetStorage();
""")
    packed = spark.read.parquet(out).orderBy("doc_id").collect()
    assert len(packed) > 0
    # no PII survived the scrub (check the kept text side)
    kept_text = [r["text"] for r in env["S"].collect()]
    assert all("bob@example.com" not in t for t in kept_text)
    assert any("<EMAIL>" in t or "example" not in t for t in kept_text)
    # exact dups collapsed: every fingerprint appears once in S
    fps = (env["S"].select(
        F.md5(F.trim(F.regexp_replace(F.regexp_replace(
            F.lower("text"), "[^a-z0-9 ]", " "), " +", " ")))
        .alias("fp")).groupBy("fp").count().collect())
    assert all(r["count"] == 1 for r in fps)
    # packing invariant: start offsets are a prefix sum in id order
    off = 0
    for r in packed:
        assert r["start_tok"] == off
        off += r["n_tokens"]
    # dsir_resample holds the target slice (src0) out of `raw`, so
    # the final set contains only the other sources, with src2
    # downsampled by its 0.5 mixture rate relative to src1's 1.0
    by_src = {r["source"]: r["n"] for r in env["S"].groupBy("source")
              .agg(F.count("*").alias("n")).collect()}
    assert "src0" not in by_src
    assert by_src.get("src1", 0) > by_src.get("src2", 0)


def test_incremental_ingest_lifecycle(spark, tmp_path):
    """The r10 build-once/append loop composed end-to-end across two
    'daily' batches: standing corpus → lsh_write_index; each batch
    runs quality_filter_chain → minhash_cross_index vs the standing
    index → accepted (clean AND novel) docs lsh_append_index'd. A
    day-2 near-dup of a doc ACCEPTED on day 1 must be caught (the
    append is what makes that possible), and the grown index must
    answer exactly like a fresh build over corpus + all accepted."""
    from piglet_spark.datapipe import dedup as dp
    from piglet_spark.datapipe import text as dt

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa", "lam", "mu", "nu",
             "xi", "omicron", "pi", "rho", "sigma", "tau", "upsilon"]

    def mk_text(seed, mutate=None):
        import random
        toks = random.Random(seed).choices(words, k=25)
        if mutate is not None:
            toks[mutate] = "changed"
        return " ".join(toks)

    corpus = spark.createDataFrame(
        [(i, mk_text(i)) for i in range(10)], ["doc_id", "text"])
    idx = str(tmp_path / "standing")
    dp.lsh_write_index(corpus, idx)

    def ingest(batch):
        ok = dt.quality_filter_chain(batch).filter("keep") \
            .select("doc_id")
        clean = batch.join(ok, on="doc_id")
        dup_ids = (dp.minhash_cross_index(spark, idx, clean,
                                          threshold=0.5)
                   .select(F.col("id_new").alias("doc_id")).distinct())
        accepted = clean.join(dup_ids, on="doc_id", how="left_anti")
        dp.lsh_append_index(accepted, idx)
        return (sorted(r.doc_id for r in accepted.collect()),
                sorted(r.doc_id for r in dup_ids.collect()))

    # day 1: 100/101 novel, 102 near-dups corpus doc 3, 103 too short
    day1 = spark.createDataFrame(
        [(100, mk_text(50)), (101, mk_text(51)),
         (102, mk_text(3, mutate=5)), (103, "tiny text")],
        ["doc_id", "text"])
    acc1, dup1 = ingest(day1)
    assert acc1 == [100, 101] and dup1 == [102]

    # day 2: 200 near-dups doc 100 (ACCEPTED day 1 — only the append
    # makes it visible), 201 novel
    day2 = spark.createDataFrame(
        [(200, mk_text(50, mutate=2)), (201, mk_text(60))],
        ["doc_id", "text"])
    acc2, dup2 = ingest(day2)
    assert acc2 == [201] and dup2 == [200]

    # grown index == fresh build over corpus + everything accepted
    fresh = str(tmp_path / "fresh")
    dp.lsh_write_index(
        corpus.union(day1.filter("doc_id in (100, 101)"))
        .union(day2.filter("doc_id = 201")), fresh)
    probe = spark.createDataFrame(
        [(900, mk_text(60, mutate=1)), (901, mk_text(3, mutate=9))],
        ["doc_id", "text"])
    key = lambda r: (r["id_new"], r["id_old"], r["jaccard"])
    got = sorted(map(key, dp.minhash_cross_index(
        spark, idx, probe, threshold=0.5).collect()))
    want = sorted(map(key, dp.minhash_cross_index(
        spark, fresh, probe, threshold=0.5).collect()))
    assert got == want and {p[1] for p in got} == {201, 3}


def test_partitioned_parquet_store(spark, docs_parquet, tmp_path):
    out = str(tmp_path / "bysrc")
    eng = pg.PigEngine(spark)
    eng.run(f"""
D = LOAD '{docs_parquet}' USING ParquetStorage();
STORE D INTO '{out}' USING ParquetStorage('source');
""")
    import os
    dirs = sorted(d for d in os.listdir(out) if d.startswith("source="))
    assert dirs == ["source=src0", "source=src1", "source=src2"]
    back = spark.read.parquet(out)
    assert back.count() == 120
    # partition pruning: a source filter reads only one directory
    plan = back.filter("source = 'src1'") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(source" in plan \
        or "source=src1" in plan


def test_partitioned_store_unknown_column_errors(spark, docs_parquet,
                                                 tmp_path):
    from piglet_spark.sources.storage import StorageError
    eng = pg.PigEngine(spark)
    with pytest.raises(StorageError, match="nope"):
        eng.run(f"""
D = LOAD '{docs_parquet}' USING ParquetStorage();
STORE D INTO '{tmp_path}/x' USING ParquetStorage('nope');
""")
