"""Shared datapipe helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame

# logical nodes that imply an exchange downstream of the scan — if one
# is present, the data is already redistributed across
# spark.sql.shuffle.partitions and spread() has nothing to fix
_WIDE_NODES = ("Join", "Aggregate", "Repartition", "Sort ", "Window",
               "Deduplicate", "Intersect", "Except", "RepartitionByExpression")


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition up to the cluster's parallelism when the scan
    produced too few splits (small local files → 1 partition → any
    CPU-heavy map stage runs on one core). A no-op at scale, where
    scans already have ≥ defaultParallelism splits.

    With ``key_cols``, hash-partition on those columns so a downstream
    groupBy/join on the same keys reuses this exchange instead of
    shuffling a second time.

    Only narrow scan/project/filter plans are probed: for them
    ``df.rdd`` is metadata-only. A plan that already contains a
    shuffle is returned unchanged — probing it via ``.rdd`` under AQE
    would EXECUTE the upstream stages at plan-build time (the probe's
    jobs are then thrown away and re-run by the real action), and its
    parallelism is already spark.sql.shuffle.partitions."""
    from pyspark.sql import functions as F
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return df
    if any(node in plan for node in _WIDE_NODES):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if key_cols:
            return df.repartition(target, *[F.col(c) for c in key_cols])
        return df.repartition(target)
    return df
