"""Shared datapipe helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition up to the cluster's parallelism when the scan
    produced too few splits (small local files → 1 partition → any
    CPU-heavy map stage runs on one core). A no-op at scale, where
    scans already have ≥ defaultParallelism splits.

    With ``key_cols``, hash-partition on those columns so a downstream
    groupBy/join on the same keys reuses this exchange instead of
    shuffling a second time."""
    from pyspark.sql import functions as F
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if key_cols:
            return df.repartition(target, *[F.col(c) for c in key_cols])
        return df.repartition(target)
    return df
