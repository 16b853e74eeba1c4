"""CLI entry point — the batch compile-and-run path.

Mirror of the reference CLI (`piglet --backend spark script.pig`,
Piglet.scala:43-345), minus codegen: scripts execute directly against
a SparkSession.

Usage:
    python -m piglet_spark script.pig [-p key=value ...] [--streaming]
        [--profiling] [--mat-dir DIR] [--master local[*]]
        [--shuffle-partitions N] [--explain alias]
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="piglet_spark",
        description="Run Pig Latin scripts on PySpark")
    ap.add_argument("script", nargs="*",
                    help="Pig script file(s) (omit for REPL). Several "
                         "files run with shared-subplan execution: a "
                         "prefix common to 2+ scripts computes once "
                         "(ref PlanMerger, Piglet.scala:222)")
    ap.add_argument("-p", "--param", action="append", default=[],
                    metavar="KEY=VALUE", help="script parameter ($KEY)")
    ap.add_argument("--streaming", action="store_true",
                    help="streaming dialect (Structured Streaming sources)")
    ap.add_argument("--profiling", action="store_true",
                    help="profiler-driven auto-materialization: persist "
                         "per-operator stats across runs and splice cached "
                         "intermediates back in (the reference's -P/profiling "
                         "mode, mm/MaterializationManager)")
    ap.add_argument("--mat-dir", default=None, metavar="DIR",
                    help="materialization base directory "
                         "(default /tmp/piglet_mat)")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--explain", metavar="ALIAS",
                    help="print the physical plan of ALIAS instead of running sinks")
    ap.add_argument("--show", metavar="ALIAS",
                    help="show() ALIAS after the script runs")
    return ap


def make_session(master: str, shuffle_partitions=None):
    from pyspark.sql import SparkSession
    b = (SparkSession.builder.master(master)
         .config("spark.sql.adaptive.enabled", "true")
         .appName("piglet-spark"))
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return b.getOrCreate()


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    params = {}
    for p in args.param:
        if "=" not in p:
            print(f"bad -p {p!r}: expected KEY=VALUE", file=sys.stderr)
            return 2
        k, v = p.split("=", 1)
        params[k] = v

    import os

    from .engine import PigEngine

    spark = make_session(args.master, args.shuffle_partitions)
    options = {"streaming": True} if args.streaming else {}
    if args.profiling:
        options["profiling"] = True
    if args.mat_dir:
        options["materialization_dir"] = args.mat_dir
    base_dir = os.path.dirname(os.path.abspath(args.script[0])) \
        if args.script else "."
    eng = PigEngine(spark, params=params, options=options,
                    base_dir=base_dir)

    if not args.script:
        from .repl import repl
        return repl(eng)

    sources = []
    for path in args.script:
        try:
            with open(path) as f:
                sources.append(f.read())
        except OSError as e:
            print(f"cannot read {path}: {e}", file=sys.stderr)
            return 2

    try:
        if len(sources) == 1:
            eng.run(sources[0])
        else:
            eng.run_all(sources)
    except Exception as e:
        print(f"error: {type(e).__name__}: {e}", file=sys.stderr)
        return 1

    try:
        if args.explain:
            eng.df(args.explain).explain("formatted")
        if args.show:
            eng.df(args.show).show(truncate=False)
    except Exception as e:
        # unknown alias etc. — same clean error contract as script
        # failures, not a raw traceback (r05)
        print(f"error: {type(e).__name__}: {e}", file=sys.stderr)
        return 1
    for q in eng.stream_queries:
        q.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
