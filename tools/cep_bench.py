"""CEP runs-pool micro-benchmark (VERDICT r05 item 2).

Measures the pooled MATCH_EVENT engines (reference: ceplib
engines/AnyMatch.scala, engines/NextMatch.scala — re-expressed in
piglet_spark/streaming/cep.py::_scan_pooled) along the two axes that
govern their cost at scale:

1. **Throughput vs n** at a fixed WITHIN horizon — the pool is bounded
   by (start-event rate x WITHIN window), so wall time must step
   ~linearly with row count.  A super-linear step would mean the pool
   (not the scan) dominates.
2. **Pool growth without WITHIN** — sase_any_match keeps every
   partial run alive, so the pool grows with the number of start
   events until the ``piglet.cep.max_runs`` guard raises (clear error,
   not OOM).  This run demonstrates the guard fires.

Usage:  python tools/cep_bench.py [--rows 50000 100000 200000]
Prints one JSON line: {"modes": {mode: {rows: sec}}, "guard": "..."}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


SCRIPT = """
SET piglet.cep.partition_key 'user_id';
{extra}
E = LOAD '{path}' USING ParquetStorage();
M = MATCH_EVENT E PATTERN SEQ(A, B, C)
    WITH (A: event_type == 'a', B: event_type == 'b',
          C: event_type == 'c')
    MODE {mode} {within};
P = FOREACH M GENERATE A::event_id AS a_id, B::event_id AS b_id,
    C::event_id AS c_id;
"""


def gen_events(spark, n: int, n_keys: int, path: str) -> None:
    """Synthetic per-key event stream: uniform a/b/c/x mix, 1-second
    cadence per key.  Deterministic (hash-based) so runs compare."""
    from pyspark.sql import functions as F

    df = (spark.range(n)
          .withColumn("user_id", (F.col("id") % n_keys).cast("int"))
          .withColumn("seq", (F.col("id") / n_keys).cast("long"))
          .withColumn("ts", F.timestamp_seconds(
              F.lit(1_700_000_000) + F.col("seq")))
          .withColumn("event_type", F.element_at(
              F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("x"),
                      F.lit("x"), F.lit("x"), F.lit("x"), F.lit("x")),
              (F.abs(F.hash("id")) % 8 + 1).cast("int")))
          .withColumnRenamed("id", "event_id")
          .select("event_id", "user_id", "ts", "event_type"))
    df.write.mode("overwrite").parquet(path)


def run_mode(engine_cls, spark, path: str, mode: str, within: str,
             extra: str = "") -> float:
    eng = engine_cls(spark)
    script = SCRIPT.format(path=path, within=within, mode=mode,
                           extra=extra)
    t0 = time.perf_counter()
    eng.run(script)
    n = eng.df("P").count()
    dt = time.perf_counter() - t0
    print(f"# {mode:22s} within={within or '-':16s} rows->matches "
          f"{n}: {dt:.2f}s", file=sys.stderr)
    return round(dt, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", nargs="+", type=int,
                    default=[50_000, 100_000, 200_000])
    ap.add_argument("--keys", type=int, default=100)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    import piglet_spark as pg

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("cep_bench").getOrCreate())

    for n in args.rows:
        gen_events(spark, n, args.keys, f"/tmp/cep_bench_{n}.parquet")
    # warm-up: compile the mapInPandas/codegen path once, untimed
    run_mode(pg.PigEngine, spark, f"/tmp/cep_bench_{args.rows[0]}.parquet",
             "skip_till_next_match", "WITHIN 30 SECONDS")

    # WITHIN 30s on a 1-event/sec/key stream → the pool is GC-bounded
    # at ~(start rate x 30) runs per key regardless of n, so every
    # mode must step ~linearly in n.
    out: dict = {"modes": {}, "guard": None}
    for mode in ("skip_till_next_match", "skip_till_any_match",
                 "next_match_pooled", "sase_any_match"):
        out["modes"][mode] = {}
        for n in args.rows:
            path = f"/tmp/cep_bench_{n}.parquet"
            dt = run_mode(pg.PigEngine, spark, path, mode,
                          "WITHIN 30 SECONDS")
            out["modes"][mode][n] = dt

    # Guard demonstration: sase_any_match, NO WITHIN, low cap — the
    # pool keeps every partial alive and must hit the max_runs error.
    path = f"/tmp/cep_bench_{args.rows[0]}.parquet"
    try:
        run_mode(pg.PigEngine, spark, path, "sase_any_match", "",
                 extra="SET piglet.cep.max_runs '500';\n")
        out["guard"] = "NOT RAISED (unexpected)"
    except Exception as e:  # noqa: BLE001 - capture the guard message
        msg = str(e)
        out["guard"] = ("max_runs guard raised"
                        if "run pool exceeded" in msg
                        else f"other error: {msg[:200]}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
