"""Event-stream operators: gap-based sessionization.

Batch: one shuffle on the user key + per-user window (skew bounded
by a single user's event count). Streaming: Spark's native
``session_window`` aggregation — state merges windows across
micro-batches and the watermark closes sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_sec: int = 1800,
               id_col: str = "event_id") -> DataFrame:
    """Assign gap-based session numbers: a new session starts when a
    user's inter-event gap exceeds ``gap_sec``. Returns the input
    keys plus ``session_seq`` (1-based per user) and ``session_id``
    (``user-seq`` string).

    Gaps compare in microseconds (``unix_micros`` ⟷ DuckDB
    ``epoch_us``) so sub-second timestamps never round across the
    boundary differently in the oracle. Ties on ``ts`` order by
    ``id_col`` — deterministic output.

    Scale shape: ONE hash shuffle on the user key; both window passes
    (lag, running sum) reuse the same partitioning — Catalyst plans a
    single Exchange. No global ordering anywhere."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # parquet TIMESTAMP_NTZ needs the cast; a session-tz offset is
    # constant so it cancels in the gap difference
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > int(gap_sec) * 1_000_000),
        F.lit(1)).otherwise(F.lit(0))
    seq = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return (df.select(id_col, user_col, ts_col)
            .withColumn("session_seq", seq)
            .withColumn("session_id",
                        F.concat_ws("-", F.col(user_col).cast("string"),
                                    F.col("session_seq").cast("string"))))


def session_stats(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_sec: int = 1800,
                  id_col: str = "event_id") -> DataFrame:
    """Per-session rollup over :func:`sessionize`: (user, session_seq,
    n_events, start/end timestamps, duration_sec). Batch form."""
    s = sessionize(df, user_col, ts_col, gap_sec, id_col)
    return (s.groupBy(user_col, "session_seq")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"))
            .withColumn(
                "duration_sec",
                ((F.unix_micros(F.col("session_end").cast("timestamp"))
                  - F.unix_micros(F.col("session_start")
                                  .cast("timestamp"))) / 1_000_000.0)))


def session_stats_stream(df: DataFrame, user_col: str = "user_id",
                         ts_col: str = "ts", gap_sec: int = 1800,
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization via Spark's native ``session_window``
    aggregation: windows merge across micro-batches while events keep
    arriving within the gap; the watermark closes and emits finished
    sessions (append mode). Returns (user, session_start,
    session_end, n_events).

    Scale shape: keyed state per OPEN session only — closed sessions
    leave the store at watermark passage."""
    if not df.isStreaming:
        raise ValueError("session_stats_stream needs a streaming "
                         "DataFrame; use session_stats for batch")
    win = F.session_window(F.col(ts_col), f"{int(gap_sec)} seconds")
    return (df.withWatermark(ts_col, watermark)
            .groupBy(win, F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col(user_col),
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "n_events"))
