"""Worked example: the incremental-crawl ingest loop with persisted
indexes (r10) — the daily-batch shape of a 100 TB training-data
pipeline, run here on the tiny sf0.001 fixtures.

  standing corpus ──lsh_write_index──▶ LSH index (buckets+shingles)
  benchmark suite ──bloom_write─────▶ Bloom bitmap sidecar

  each arriving batch:
    1. quality_filter_chain  → drop low-quality docs (full audit)
    2. bloom_decontaminate   → flag benchmark-contaminated docs
    3. minhash_cross_index   → near-dups vs the STANDING corpus
                               (bucket-table read, no corpus rescan)
    4. lsh_append_index      → accepted docs join the corpus, so the
                               NEXT batch is checked against them
    …periodically: lsh_compact_index (small-file defrag)

Every step is a lazy DataFrame plan; the only driver-side data are
the index sidecars. Run: python examples/incremental_ingest.py
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from piglet_spark.datapipe import dedup as dp          # noqa: E402
from piglet_spark.datapipe import text as dt           # noqa: E402


def main() -> None:
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .appName("incremental-ingest").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("source") != "src0")
    batch = docs.filter(F.col("source") == "src0")
    bench = docs.filter(F.col("source") == "src1").limit(20)

    idx = "/tmp/ingest_example_lsh"
    bloom = "/tmp/ingest_example.bloom.json"
    dp.lsh_write_index(corpus, idx)
    dp.bloom_write(bench, bloom)

    # 1. quality gate (complete per-rule audit)
    audited = dt.quality_filter_chain(batch)
    clean = batch.join(audited.filter("keep").select("doc_id"),
                       on="doc_id")
    print("quality: kept",
          clean.count(), "of", batch.count(), "docs")

    # 2. benchmark decontamination from the persisted bitmap
    contaminated = (dp.bloom_decontaminate(clean, None,
                                           bloom_path=bloom)
                    .filter("bloom_contamination > 0.5")
                    .select("doc_id"))
    clean = clean.join(contaminated, on="doc_id", how="left_anti")

    # 3. near-dups vs the standing corpus — index-served
    dups = (dp.minhash_cross_index(spark, idx, clean, threshold=0.5)
            .select(F.col("id_new").alias("doc_id")).distinct())
    accepted = clean.join(dups, on="doc_id", how="left_anti")
    print("dedup: dropped", dups.count(), "near-dups; accepting",
          accepted.count())

    # 4. accepted docs join the standing corpus for the next batch
    dp.lsh_append_index(accepted, idx)
    dp.lsh_compact_index(spark, idx)
    print("index grown and compacted — next batch sees today's docs")
    spark.stop()


if __name__ == "__main__":
    main()
