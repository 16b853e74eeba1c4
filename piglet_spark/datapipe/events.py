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


def funnel_conversion(df: DataFrame, steps: list[str],
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """Strictly-ordered funnel analysis: for each user, step ``i+1``
    counts only if an event of type ``steps[i+1]`` occurs STRICTLY
    AFTER the user's earliest qualifying step-``i`` event (the
    standard product-analytics funnel — Amplitude/Mixpanel "this
    order" semantics; ties on the timestamp break by ``id_col`` so
    an equal-timestamp later step still converts iff its id is
    larger).

    Returns one row per funnel step:
    ``(step, event_type, users, conv_overall, conv_step)`` where
    ``conv_overall`` = users ÷ step-1 users and ``conv_step`` =
    users ÷ previous-step users (both round-6; step 1 is 1.0, and a
    0-user previous step yields null).

    Scale shape: the step chain is |steps|−1 self-aggregations, ALL
    keyed on the user column — the first ``groupBy`` establishes the
    hash partitioning and every later join + ``groupBy`` reuses the
    same key, so Catalyst plans ONE user-key Exchange per step input
    with no data-sized windows and no collect. Per-step frontier
    DataFrames carry one row per surviving user (monotonically
    shrinking). The final rollup is |steps| tiny counts unioned
    driver-free. Events not in ``steps`` are filtered before any
    shuffle; at 100 TB the dominant cost is the one filtered scan.
    """
    if len(steps) < 2:
        raise ValueError("funnel_conversion needs >= 2 steps")
    # (ts, id) as a lexicographic micro-key: "strictly after" on the
    # pair gives deterministic semantics on equal timestamps
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = (df.filter(F.col(type_col).isin([str(s) for s in steps]))
            .select(F.col(user_col).alias("_u"),
                    F.col(type_col).alias("_t"),
                    F.struct(us.alias("_us"),
                             F.col(id_col).cast("long").alias("_i"))
                    .alias("_k")))
    frontier = (base.filter(F.col("_t") == steps[0])
                .groupBy("_u").agg(F.min("_k").alias("_k")))
    reached = [frontier.select("_u")]
    for step in steps[1:]:
        nxt = (base.filter(F.col("_t") == step)
               .join(frontier.withColumnRenamed("_k", "_prev"),
                     on="_u")
               .filter((F.col("_k._us") > F.col("_prev._us"))
                       | ((F.col("_k._us") == F.col("_prev._us"))
                          & (F.col("_k._i") > F.col("_prev._i"))))
               .groupBy("_u").agg(F.min("_k").alias("_k")))
        reached.append(nxt.select("_u"))
        frontier = nxt
    counts = None
    for i, (step, users) in enumerate(zip(steps, reached), start=1):
        c = users.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i).alias("step"),
            F.lit(str(step)).alias("event_type"), "users")
        counts = c if counts is None else counts.unionByName(c)
    wp = Window.orderBy("step")
    first = F.first("users").over(
        wp.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prev = F.lag("users").over(wp)
    # the window runs over |steps| rows total — not a scale concern
    return (counts.withColumn(
                "conv_overall",
                F.round(F.col("users") / F.nullif(first, F.lit(0)), 6))
            .withColumn(
                "conv_step",
                F.round(F.col("users")
                        / F.nullif(F.coalesce(prev, F.col("users")),
                                   F.lit(0)), 6)))


def latest_by_key(df: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts",
                  tiebreak_col: str = "event_id") -> DataFrame:
    """CDC changelog compaction / upsert materialization: the latest
    record per key, "latest" = lexicographic max of
    ``(ts, tiebreak)``. The standard last-write-wins pass that turns
    an append-only event/change stream into current state (Kafka
    log compaction, Delta/Hudi upsert semantics) — and, in a
    training-data pipeline, "keep the newest crawl of each URL".

    Returns the full input row (original column order), one per key.

    Scale shape: ONE partial-aggregating hash shuffle — ``max_by``
    over the (ts, tiebreak) pair combines map-side, so the exchange
    carries one candidate row per key per map partition. Deliberately
    NOT a row_number window (a window shuffles every input row and
    sorts each key group; at 100 TB of events that is strictly
    worse). Deterministic when ``(ts, tiebreak)`` is unique per key,
    which a changelog's sequence column guarantees.

    STREAMS TOO: on a streaming DataFrame the same ``max_by``
    aggregation runs stateful — state is exactly the current row per
    key (the upsert view itself, the minimum any engine must hold),
    updated incrementally each micro-batch. Emit with
    ``outputMode("update")`` (changed keys per trigger — a changelog
    of the compaction) or ``"complete"`` (the full state). Pinned by
    a cross-batch pytest.
    """
    others = [c for c in df.columns if c not in (key_col,)]
    ordk = F.struct(F.col(ts_col).alias("_ts"),
                    F.col(tiebreak_col).alias("_tb"))
    agg = (df.groupBy(key_col)
           .agg(F.max_by(F.struct(*[F.col(c) for c in others]),
                         ordk).alias("_r")))
    return agg.select(key_col, *[F.col(f"_r.{c}").alias(c)
                                 for c in others]).select(*df.columns)


def trending_keys(df: DataFrame, key_col: str = "event_type",
                  ts_col: str = "ts", window_sec: int = 3600,
                  k: int = 3) -> DataFrame:
    """Per-tumbling-window top-``k`` keys by count — trending
    detection (terms, entities, event types) over a timestamped
    stream's batch view. Returns ``(window_start, key, n, rank)``,
    rank 1..k per window (ties → count desc, then key ascending —
    deterministic, oracle-portable).

    Window starts are computed with plain integer-μs math
    (``floor(unix_micros/W)·W``), not ``F.window``, so the DuckDB
    oracle reproduces the exact bucket boundaries.

    Scale shape: one (window, key) partial-agg shuffle — the only
    data-sized move. The top-k rank does NOT use a bare per-window
    window (trending TERMS puts millions of keys in each window
    partition): the same two-phase salted rank as
    ``pack.stratified_sample_n`` — 64 lanes per window keep every
    reducer bounded at lane-top-k, the final rank sees ≤ 64·k
    survivors per window, and the result is provably the exact
    single-window answer."""
    from pyspark.sql.window import Window as W
    w_us = int(window_sec) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ws = F.timestamp_micros(
        (F.floor(us / F.lit(w_us)) * F.lit(w_us)).cast("long"))
    counts = (df.select(ws.alias("window_start"),
                        F.col(key_col).alias("key"))
              .groupBy("window_start", "key")
              .agg(F.count(F.lit(1)).alias("n")))
    salt = (F.conv(F.substring(F.md5(F.col("key").cast("string")),
                               29, 4), 16, 10).cast("int") % 64)
    w1 = (W.partitionBy("window_start", "_s")
          .orderBy(F.desc("n"), F.asc("key")))
    cand = (counts.withColumn("_s", salt)
            .withColumn("_r", F.row_number().over(w1))
            .filter(F.col("_r") <= int(k)).drop("_r", "_s"))
    w2 = W.partitionBy("window_start").orderBy(F.desc("n"),
                                               F.asc("key"))
    return (cand.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= int(k))
            .select("window_start",
                    F.col("key").alias(key_col), "n", "rank"))


def trending_keys_stream(df: DataFrame, key_col: str = "event_type",
                         ts_col: str = "ts", window_sec: int = 3600,
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of :func:`trending_keys`: event-time tumbling
    windowed counts with a watermark — closed windows emit in append
    mode; the per-window top-k rank applies downstream (a rank over
    a CLOSED window's counts is a bounded batch step —
    ``foreachBatch`` or the batch :func:`trending_keys` over the
    sink). State = one count per open (window, key)."""
    if not df.isStreaming:
        raise ValueError("trending_keys_stream needs a streaming "
                         "DataFrame; use trending_keys for batch")
    win = F.window(F.col(ts_col), f"{int(window_sec)} seconds")
    return (df.withWatermark(ts_col, watermark)
            .groupBy(win, F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("window_start"),
                    key_col, "n"))


def funnel_stream(df: DataFrame, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  id_col: str = "event_id",
                  event_time_buffer: str | None = None) -> DataFrame:
    """Streaming twin of :func:`funnel_conversion`: a per-user funnel
    state machine over an unbounded event stream. Emits one row per
    ADVANCE — ``(user, step, event_type, reached_us)`` when a user
    first reaches step ``step`` — so per-step user counts are a
    bounded downstream aggregation of the emission stream.

    DEFAULT (``event_time_buffer=None``) — greedy single-pass:
    within each micro-batch events process in (ts, id) order and a
    step advances only strictly after the previous step's reach key
    — identical to the batch min-chain when each user's events
    arrive in order across batches (pinned by test). Under
    cross-batch reordering the reach TIME can be later than the
    batch answer (a greedy machine can't retroactively prefer an
    earlier event it hadn't seen) — the standard caveat of any
    single-pass funnel. State per user is THREE integers (stage,
    last-us, last-id) — no event buffering.

    ``event_time_buffer='10 minutes'`` (r10) — watermark-buffered
    EXACT variant: a watermark of that delay is attached to the
    event time, per-user events BUFFER in state until the watermark
    passes them, and each batch replays the funnel over the
    now-FINAL sorted prefix (events with time < watermark can no
    longer arrive — Spark drops them as late). Emissions are
    therefore exactly the batch min-chain regardless of delivery
    order within the horizon (pinned by a shuffled-delivery test);
    the trade is state = the per-user events inside the watermark
    horizon (the same bound as a stream-stream join buffer) and
    emission latency = the watermark delay.

    Scale shape: events not in ``steps`` are filtered before the
    shuffle; the one shuffle is the keyed state exchange."""
    if not df.isStreaming:
        return funnel_conversion(df, steps, user_col, ts_col,
                                 type_col, id_col)
    if len(steps) < 2:
        raise ValueError("funnel_stream needs >= 2 steps")
    from pyspark.sql.streaming.state import GroupStateTimeout
    steps = [str(s) for s in steps]
    # the state key keeps user_col's NATIVE type — casting string
    # ids to long would NULL them and merge every user into one
    # state group (and diverge from the batch funnel's semantics)
    u_type = df.select(user_col).schema[0].dataType.simpleString()
    if event_time_buffer is not None:
        # the watermark column must be a timestamp. NOTE: Catalyst
        # pushes the step filter BELOW the EventTimeWatermark node
        # (it doesn't reference the event-time column), so only
        # STEP-TYPE events advance the watermark — the funnel's
        # emissions flush when later step events flow, which is the
        # natural trigger for a funnel anyway
        df = df.withColumn("_wts", F.col(ts_col).cast("timestamp")) \
               .withWatermark("_wts", str(event_time_buffer))
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = (df.filter(F.col(type_col).isin(steps))
            .select(F.col(user_col).alias("_u"),
                    F.col(type_col).alias("_t"),
                    us.alias("_us"),
                    F.col(id_col).cast("long").alias("_i"),
                    *([F.col("_wts")]
                      if event_time_buffer is not None else [])))
    out_t = (f"user_id {u_type}, step int, event_type string, "
             "reached_us long")

    def advance(stage, last_us, last_id, evs, key, rows):
        """Shared greedy core: replay sorted (us, id, type) events
        from the given machine state, appending ADVANCE rows."""
        for e_us, e_id, e_t in evs:
            if stage >= len(steps):
                break
            if e_t != steps[stage]:
                continue
            if stage > 0 and (e_us, e_id) <= (last_us, last_id):
                continue
            stage += 1
            last_us, last_id = int(e_us), int(e_id)
            rows.append((key, stage, e_t, last_us))
        return stage, last_us, last_id

    if event_time_buffer is None:
        state_t = "stage int, last_us long, last_id long"

        def machine(key, pdf_iter, state):
            import pandas as pd
            stage, last_us, last_id = (state.get if state.exists
                                       else (0, -1, -1))
            rows = []
            evs = []
            for pdf in pdf_iter:
                evs.extend(zip(pdf["_us"], pdf["_i"], pdf["_t"]))
            evs.sort()
            stage, last_us, last_id = advance(
                stage, last_us, last_id, evs, key[0], rows)
            state.update((stage, last_us, last_id))
            if rows:
                yield pd.DataFrame(rows, columns=["user_id", "step",
                                                  "event_type",
                                                  "reached_us"])
    else:
        state_t = ("stage int, last_us long, last_id long, "
                   "buf_us array<long>, buf_id array<long>, "
                   "buf_t array<string>")

        def machine(key, pdf_iter, state):
            import pandas as pd
            if state.exists:
                stage, last_us, last_id, bus, bid, bt = state.get
                buf = list(zip(bus or [], bid or [], bt or []))
            else:
                stage, last_us, last_id, buf = 0, -1, -1, []
            for pdf in pdf_iter:
                buf.extend(zip(pdf["_us"], pdf["_i"], pdf["_t"]))
            buf = sorted((int(a), int(b), str(c)) for a, b, c in buf)
            # events with time < watermark are FINAL — no earlier
            # event can still arrive (Spark drops late rows before
            # the state op), so replaying the final prefix in (ts,
            # id) order reproduces the batch min-chain exactly
            wm_us = (state.getCurrentWatermarkMs() or 0) * 1000
            final = [e for e in buf if e[0] < wm_us]
            pend = [e for e in buf if e[0] >= wm_us]
            rows = []
            stage, last_us, last_id = advance(
                stage, last_us, last_id, final, key[0], rows)
            state.update((stage, last_us, last_id,
                          [e[0] for e in pend],
                          [e[1] for e in pend],
                          [e[2] for e in pend]))
            if pend:
                # a group is only re-invoked on NEW data or a
                # timeout — without this, a user whose events all
                # arrived would never flush once the watermark
                # passes them. Fire when the watermark crosses the
                # earliest pending event.
                state.setTimeoutTimestamp(pend[0][0] // 1000 + 1)
            if rows:
                yield pd.DataFrame(rows, columns=["user_id", "step",
                                                  "event_type",
                                                  "reached_us"])

        return (base.groupBy("_u")
                .applyInPandasWithState(
                    machine, out_t, state_t, "append",
                    GroupStateTimeout.EventTimeTimeout))

    return (base.groupBy("_u")
            .applyInPandasWithState(machine, out_t, state_t,
                                    "append",
                                    GroupStateTimeout.NoTimeout))
