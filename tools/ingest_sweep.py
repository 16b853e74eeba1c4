"""Streaming near-dup ingest saturation sweep — the measured evidence
behind SCALE.md's neardup_ingest scale section (r08, requested by the
r07 review: characterize WHERE the ingest path saturates).

Two experiments over a staged documents file-stream:

1. shards × throughput: run ``streaming_neardup_pairs`` at several
   ``n_shards`` settings and record docs/s. The state function is
   invoked once per GROUP per trigger, so shard count trades Python
   invocation overhead (few shards → giant groups → big pandas
   concats; many shards → one call per occupied shard) — the sweep
   finds the plateau.
2. state growth: occupied-bucket count (== holder entries, the thing
   the state store keeps) as a function of docs ingested, computed
   batch-side with the SAME signature path (_rowwise_banded_pandas is
   pinned byte-identical to it) — shows the no-TTL growth rate that
   ``ttl_sec`` is there to bound.

Prints one JSON line:
{"docs": N, "sweep": {shards: {"sec": s, "docs_per_sec": r,
 "out_rows": m}}, "state_growth": [{"docs": k, "buckets": b}, ...]}

Usage: python tools/ingest_sweep.py [--sf-dir DIR] [--n-files 16]
                                    [--cpus 16] [--shards 1,32,...]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n-files", type=int, default=16)
    ap.add_argument("--cpus", default="16")
    ap.add_argument("--shards", default="1,32,256,1024,4096")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.adaptive.enabled", "false")  # SS: no AQE
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .appName("piglet-ingest-sweep").getOrCreate())
    from stream_bench import stage_docs
    from piglet_spark.datapipe import dedup

    stage = tempfile.mkdtemp(prefix="pigingest_")
    try:
        nd = stage_docs(spark, args.sf_dir, stage, args.n_files)
        schema = "doc_id long, text string"
        sweep = {}
        for shards in [int(s) for s in args.shards.split(",")]:
            stream = (spark.readStream.schema(schema)
                      .option("sep", "\t").csv(stage))
            out = dedup.streaming_neardup_pairs(stream,
                                                n_shards=shards)
            name = f"ingest_s{shards}"
            t0 = time.perf_counter()
            q = (out.writeStream.format("memory").queryName(name)
                 .outputMode("append").start())
            q.processAllAvailable()
            q.stop()
            sec = time.perf_counter() - t0
            m = spark.sql(f"select count(*) n from {name}") \
                .collect()[0]["n"]
            sweep[shards] = {"sec": round(sec, 3),
                             "docs_per_sec": round(nd / sec),
                             "out_rows": m}
            print(f"# shards={shards}: {sec:.1f}s "
                  f"({nd / sec:.0f} docs/s, {m} pair rows)",
                  file=sys.stderr, flush=True)

        # state growth: occupied (band,bucket) holders after each
        # quartile of the corpus (the stream keeps ONE holder per
        # occupied bucket; quartiles by doc_id order = arrival order
        # in the batch twin's semantics)
        batch = (spark.read.schema(schema).option("sep", "\t")
                 .csv(stage))
        banded = dedup._rowwise_banded_pandas(
            batch, "text", "doc_id", 32, 8, 3).cache()
        # quartile cut points from the actual id distribution (scaled
        # corpora stride doc_id per replica, so ids are NOT 0..nd-1)
        cuts = batch.approxQuantile("doc_id",
                                    [0.25, 0.5, 0.75, 1.0], 0.001)
        growth = []
        for frac, cut in zip((0.25, 0.5, 0.75, 1.0), cuts):
            b = (banded.filter(F.col("_id") <= int(cut))
                 .select("_band", "_bucket").distinct().count())
            growth.append({"docs": int(nd * frac), "buckets": b})
        banded.unpersist()
        print(json.dumps({"docs": nd, "n_files": args.n_files,
                          "sweep": sweep, "state_growth": growth}))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    main()
