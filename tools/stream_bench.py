"""Structured-Streaming throughput benchmark over the engine's
streaming dialect — the measured evidence behind SCALE.md's streaming
claims (the batch bench never exercises readStream/State paths).

Stages the sf-dir events table as CSV chunk files (a file stream with
``n_files`` arrival units), then measures end-to-end wall time —
query start → processAllAvailable — for three pipelines through the
PUBLIC PigEngine streaming surface:

- window_agg: event-time tumbling window + keyed aggregation
  (watermark-capable SS aggregation — the bread-and-butter path).
- keyed_rows_window: WINDOW ... ROWS n PARTITION BY key — the r04
  per-key count window (applyInPandasWithState cross-batch state).
- keyed_cep: MATCH_EVENT SEQ with a per-key NFA
  (applyInPandasWithState per-key streaming state).
- neardup_ingest: first-seen MinHash-LSH near-dup detection over a
  documents file stream (per-row signatures + per-bucket holder
  state; r07d).

Prints one JSON line: {"rows": N, "pipelines": {name: {"sec": s,
"rows_per_sec": r, "out_rows": m}}}.

Usage: python tools/stream_bench.py [--sf-dir DIR] [--n-files 16]
                                    [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def stage_docs(spark, sf_dir: str, out_dir: str, n_files: int) -> int:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = d.count()
    # tab-separated; strip tabs/newlines from text so one row = one line
    (d.selectExpr("doc_id",
                  r"regexp_replace(text, '[\t\n\r]', ' ') AS text")
       .repartition(n_files)
       .write.mode("overwrite").option("sep", "\t").csv(out_dir))
    return n


def stage_csv(spark, sf_dir: str, out_dir: str, n_files: int) -> int:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()
    (ev.selectExpr("event_id", "user_id",
                   "date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts",
                   "event_type", "value")
       .repartition(n_files)
       .write.mode("overwrite").option("sep", ",").csv(out_dir))
    return n


def run_pipeline(spark, script: str, alias: str, name: str,
                 mode: str) -> tuple[float, int]:
    import piglet_spark as pg
    eng = pg.PigEngine(spark, options={"streaming": True})
    eng.run(script)
    df = eng.df(alias)
    assert df.isStreaming
    t0 = time.perf_counter()
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode).start())
    q.processAllAvailable()
    q.stop()
    sec = time.perf_counter() - t0
    out_rows = spark.sql(f"select count(*) n from {name}").collect()[0]["n"]
    eng.stop_streams()
    return sec, out_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n-files", type=int, default=16)
    ap.add_argument("--cpus", default="16")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.adaptive.enabled", "false")  # SS: no AQE
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .appName("piglet-stream-bench").getOrCreate())
    stage = tempfile.mkdtemp(prefix="pigstream_")
    try:
        n = stage_csv(spark, args.sf_dir, stage, args.n_files)
        decl = (f"E = LOAD '{stage}' USING PigStorage(',') AS ("
                f"event_id:long, user_id:long, ts:datetime, "
                f"event_type:chararray, value:double) TIMESTAMP(ts);\n")
        results = {}

        s = decl + ("W = WINDOW E RANGE 60 SECONDS;\n"
                    "G = GROUP W BY event_type;\n"
                    "C = FOREACH G GENERATE group AS et, COUNT(W) AS n, "
                    "SUM(W.value) AS sv;\n")
        sec, out = run_pipeline(spark, s, "C", "sb_window", "complete")
        results["window_agg"] = {"sec": round(sec, 3),
                                 "rows_per_sec": round(n / sec),
                                 "out_rows": out}

        s = decl + "R = WINDOW E ROWS 100 PARTITION BY event_type;\n"
        sec, out = run_pipeline(spark, s, "R", "sb_rows", "append")
        results["keyed_rows_window"] = {"sec": round(sec, 3),
                                        "rows_per_sec": round(n / sec),
                                        "out_rows": out}

        s = ("SET piglet.cep.partition_key 'user_id';\n" + decl +
             "M = MATCH_EVENT E PATTERN SEQ(a, b) WITH "
             "(a: event_type == 'click', b: event_type == 'purchase') "
             "WITHIN 3600 SECONDS;\n")
        sec, out = run_pipeline(spark, s, "M", "sb_cep", "append")
        results["keyed_cep"] = {"sec": round(sec, 3),
                                "rows_per_sec": round(n / sec),
                                "out_rows": out}

        dstage = tempfile.mkdtemp(prefix="pigstreamdocs_")
        try:
            nd = stage_docs(spark, args.sf_dir, dstage, args.n_files)
            s = (f"D = LOAD '{dstage}' USING PigStorage('\\t') AS ("
                 f"doc_id:long, text:chararray);\n"
                 "N = STREAM D THROUGH neardup_ingest(0.5);\n")
            sec, out = run_pipeline(spark, s, "N", "sb_neardup", "append")
            results["neardup_ingest"] = {"sec": round(sec, 3),
                                         "rows_per_sec": round(nd / sec),
                                         "out_rows": out}
        finally:
            shutil.rmtree(dstage, ignore_errors=True)

        print(json.dumps({"rows": n, "docs": nd, "n_files": args.n_files,
                          "pipelines": results}))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    main()
