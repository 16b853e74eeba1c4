"""Streaming dialect on Structured Streaming.

Reference semantics: SOCKET_READ/SOCKET_WRITE (op/SocketRead.scala:34,
op/SocketWrite.scala:28), stream LOAD/STORE
(codegen/spark/StreamLoadEmitter.scala:9), WINDOW (op/Window.scala:29,
codegen/spark/StreamWindowEmitter.scala:26-28).

Upgrades over the reference (DStream era): event-time windows ride
``F.window`` + ``withWatermark`` (real late-data handling — the
reference has none); sinks are Structured Streaming sinks. ROWS
(count-based) windows are not expressible in Structured Streaming —
``apply_window`` raises with guidance (documented limitation,
SURVEY.md §2.8).
"""

from __future__ import annotations

import socket as pysocket
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import ast as A
from ..plans import schema as S


class StreamingError(Exception):
    pass


_UNIT_SECONDS = {
    "SECONDS": 1, "SECOND": 1, "MINUTES": 60, "MINUTE": 60,
    "HOURS": 3600, "HOUR": 3600,
}


def window_duration(spec: tuple[int, str]) -> str:
    n, unit = spec
    if unit == "ROWS":
        raise StreamingError(
            "ROWS (count-based) windows are not supported on Structured "
            "Streaming; use RANGE windows or foreachBatch")
    return f"{n * _UNIT_SECONDS[unit]} seconds"


def socket_read(spark: SparkSession, op: A.SocketRead,
                pump_registry: Optional[list] = None) -> DataFrame:
    if op.mode and op.mode.lower() == "zmq":
        return zmq_read(spark, op, registry=pump_registry)
    raw = (spark.readStream.format("socket")
           .option("host", op.host or "localhost")
           .option("port", op.port)
           .load())
    return _parse_lines(raw, op.func, op.func_args, op.schema,
                        op.timestamp_field)


def _require_zmq():
    try:
        import zmq
        return zmq
    except ImportError as e:
        raise StreamingError(
            "SOCKET … MODE zmq requires the optional 'pyzmq' package, "
            "which is not installed in this environment; install pyzmq "
            "or use the plain TCP socket mode") from e


# live SUB pump threads: {"stop": Event, "spool": dir, "thread": Thread}
# — registered so engine.stop_streams() / stop_zmq_pumps() can end the
# thread, close its socket and remove the spool (r04, ADVICE: pumps
# used to run forever and spool files were never pruned). Each pump is
# ALSO registered on the executor that started it (its `registry`
# argument), so one engine's stop_streams() doesn't kill another
# engine's live pump in the same process (r04 review).
_ZMQ_PUMPS: list[dict] = []


def stop_pumps(pumps: list[dict]) -> None:
    """Stop the given ZMQ SUB pumps and delete their spool dirs,
    removing them from the module registry."""
    import shutil

    while pumps:
        p = pumps.pop()
        p["stop"].set()
        p["thread"].join(timeout=2.0)
        shutil.rmtree(p["spool"], ignore_errors=True)
        try:
            _ZMQ_PUMPS.remove(p)
        except ValueError:
            pass


def stop_zmq_pumps() -> None:
    """Stop every live ZMQ SUB pump in the process (all engines) and
    delete their spool directories."""
    stop_pumps(_ZMQ_PUMPS)


def zmq_read(spark: SparkSession, op: A.SocketRead,
             registry: Optional[list] = None) -> DataFrame:
    """SOCKET_READ … MODE zmq: a ZeroMQ SUB subscriber (connects to
    tcp://host:port, subscribes to everything — ref ZmqSubscriber,
    flinklib SourceFuncs.scala:27-75). Structured Streaming has no ZMQ
    source, so a driver-side daemon thread spools received messages
    into batch files consumed by a file stream — single-receiver
    ingest, exactly the parallelism of the reference's one-instance
    source function; the parsed stream itself is fully parallel.

    Spool lifecycle (r04): processed files are deleted by the file
    source (``cleanSource=delete``); un-consumed files are NEVER
    age-pruned while the pump lives — the pump cannot tell a stopped
    query from a live query with a long backlog, and deleting
    backlogged batch files silently drops stream data (r04 review) —
    and the whole spool dir is removed when the pump is stopped
    (``stop_zmq_pumps`` / ``PigEngine.stop_streams``)."""
    zmq = _require_zmq()
    import tempfile
    import threading
    import time as _time

    addr = f"tcp://{op.host or 'localhost'}:{op.port}"
    spool = tempfile.mkdtemp(prefix="piglet_zmq_")
    stop = threading.Event()

    def pump():
        import os
        ctx = zmq.Context.instance()
        sub = ctx.socket(zmq.SUB)
        sub.setsockopt(zmq.RCVHWM, 0)
        sub.connect(addr)
        sub.setsockopt(zmq.SUBSCRIBE, b"")
        buf: list[str] = []
        seq = 0
        last = _time.time()
        while not stop.is_set():
            try:
                if sub.poll(200):
                    buf.append(sub.recv().decode("utf-8", "replace"))
                if buf and (_time.time() - last > 0.5 or len(buf) >= 1000):
                    tmp = os.path.join(spool, f"._{seq}.txt")
                    with open(tmp, "w") as f:
                        f.write("\n".join(buf) + "\n")
                    os.replace(tmp, os.path.join(spool, f"zmq_{seq}.txt"))
                    seq += 1
                    buf.clear()
                    last = _time.time()
            except Exception:
                break
        sub.close(linger=0)

    thread = threading.Thread(target=pump, daemon=True,
                              name=f"piglet-zmq-sub-{op.port}")
    thread.start()
    pump_rec = {"stop": stop, "spool": spool, "thread": thread}
    _ZMQ_PUMPS.append(pump_rec)
    if registry is not None:
        registry.append(pump_rec)
    raw = (spark.readStream.format("text")
           .option("cleanSource", "delete")  # drop processed spool files
           .load(spool))
    return _parse_lines(raw, op.func, op.func_args, op.schema,
                        op.timestamp_field)


def zmq_write(df: DataFrame, op, options: Optional[dict] = None):
    """SOCKET_WRITE … MODE zmq: a ZeroMQ PUB publisher BOUND at
    tcp://host:port sending each row as one UTF-8 message (ref
    ZmqPublisher, flinklib SinkFuncs.scala:25-70: PUB + bind +
    sndhwm=0 + linger). A single bound PUB endpoint is inherently one
    socket, so rows are published from the driver — streamed via
    ``toLocalIterator`` so no batch is ever fully materialized; the
    reference's sink had the same single-endpoint constraint."""
    zmq = _require_zmq()
    import time as _time

    from ..sources.storage import pig_format_rows

    addr = f"tcp://{op.host or '*'}:{op.port}"
    ctx = zmq.Context.instance()
    pub = ctx.socket(zmq.PUB)
    pub.setsockopt(zmq.SNDHWM, 0)
    pub.setsockopt(zmq.LINGER, 5000)
    pub.bind(addr)
    _time.sleep(0.3)  # PUB/SUB slow-joiner: let subscribers attach

    def send_batch(batch_df: DataFrame, _batch_id: int):
        for r in pig_format_rows(batch_df).toLocalIterator():
            pub.send_string(r[0])

    if not df.isStreaming:
        try:
            send_batch(df, 0)
        finally:
            pub.close()  # linger=5000 flushes queued messages first
        return None
    opts = options or {}
    q = (df.writeStream.outputMode(opts.get("output_mode", "append"))
         .foreachBatch(send_batch)
         .trigger(processingTime=opts.get("trigger", "1 second"))
         .start())
    # close the PUB socket when the query ends — by stop() OR failure
    # (r04, ADVICE: the streaming path used to leak the bound socket)
    _on_query_terminated(df.sparkSession, q.id,
                         lambda: pub.close())  # linger flushes first
    return q


# query id → cleanup callback, fired by one session-wide listener
_QUERY_CLEANUPS: dict[str, object] = {}
_LISTENED_SESSIONS: set[int] = set()


def _on_query_terminated(spark: SparkSession, query_id, callback) -> None:
    """Run ``callback`` once when the given streaming query terminates
    (stop(), completion, or failure), via a StreamingQueryListener."""
    _QUERY_CLEANUPS[str(query_id)] = callback
    key = id(spark)
    if key in _LISTENED_SESSIONS:
        return
    from pyspark.sql.streaming import StreamingQueryListener

    class _CleanupListener(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            cb = _QUERY_CLEANUPS.pop(str(event.id), None)
            if cb is not None:
                try:
                    cb()
                except Exception:
                    pass

    spark.streams.addListener(_CleanupListener())
    _LISTENED_SESSIONS.add(key)


def stream_load(spark: SparkSession, path: str, func: Optional[str],
                args: list, decl: Optional[A.TupleDecl],
                ts_field=None) -> DataFrame:
    """File-stream source: watch a directory of delimited text/json."""
    name = (func or "PigStorage").split(".")[-1].lower()
    if name in ("jsonstorage", "jsonstorage2"):
        reader = spark.readStream
        if decl is not None:
            reader = reader.schema(S.tuple_decl_to_struct(decl))
        return _apply_timestamp(reader.json(path), ts_field)
    delim = str(args[0]) if args else "\t"
    if decl is None:
        raise StreamingError("stream LOAD requires an AS(...) schema")
    reader = (spark.readStream.format("csv")
              .option("sep", delim)
              # plain-split parity with the batch PigStorage loader
              # (Storage.scala split semantics): no CSV quote/escape
              # handling — the same line must parse identically in
              # batch and streaming mode (r05 review)
              .option("quote", "").option("emptyValue", "")
              .schema(S.tuple_decl_to_struct(decl)))
    df = reader.load(path)
    return _apply_timestamp(df, ts_field)


def _parse_lines(raw: DataFrame, func: Optional[str], args: list,
                 decl: Optional[A.TupleDecl], ts_field) -> DataFrame:
    name = (func or "PigStorage").split(".")[-1].lower()
    if name == "rdfstream":
        # RDFStream(): lines → (subject, predicate, object)
        # (Language.md Socket Read; token rule = RDFFileStorage's)
        tok = r'("[^"]*"|\S+)'
        pat = rf'^\s*{tok}\s+{tok}\s+{tok}'
        names = ["subject", "predicate", "object"]
        if decl is not None and len(decl.fields) == 3:
            names = [f.name or names[i] for i, f in enumerate(decl.fields)]
        out = raw.select(*[
            F.regexp_extract(F.col("value"), pat, i + 1).alias(n)
            for i, n in enumerate(names)
        ]).filter(F.col(names[0]) != "")
        return _apply_timestamp(out, ts_field)
    if decl is None or name == "textloader":
        out = raw.select(F.col("value").alias(
            (decl.fields[0].name if decl and decl.fields else "line")))
        return _apply_timestamp(out, ts_field)
    delim = str(args[0]) if args else "\t"
    # F.split takes a Java REGEX — a literal '|' or '.' delimiter
    # must be escaped or every line mis-splits (r05 review)
    import re as _re
    parts = F.split(F.col("value"), _re.escape(delim), -1)
    cols = []
    for i, fd in enumerate(decl.fields):
        c = parts[i].cast(S.pig_to_spark(fd.pig_type))
        cols.append(c.alias(fd.name or f"_c{i}"))
    return _apply_timestamp(raw.select(*cols), ts_field)


def _apply_timestamp(df: DataFrame, ts_field) -> DataFrame:
    if ts_field is None:
        return df
    if isinstance(ts_field, A.PositionalField):
        name = df.columns[ts_field.pos]
    else:
        name = ts_field.name
    return df.withColumn(name, F.col(name).cast("timestamp"))


class RowsWindowSpec:
    """Count-window metadata: the window id lives in the precomputed
    ``__rowwin`` column (executor._rows_window); downstream grouping
    adds it to its keys like a time-window column. Keyed windows
    (``PARTITION BY k``) identify a window by (key, per-key id) —
    window ids restart at 0 for every key, so the key is part of the
    window identity."""

    def __init__(self, size: int, slide: Optional[int] = None,
                 key: Optional[str] = None):
        self.size = size
        self.slide = slide
        self.key = key
        self.ts_col = None

    def window_col(self):
        if self.key is not None:
            return F.struct(F.col(self.key).alias("key"),
                            F.col("__rowwin").alias("win"))
        return F.col("__rowwin")


def rows_window_stream(df: DataFrame, n: int, m: Optional[int],
                       key: Optional[str] = None
                       ) -> tuple[DataFrame, RowsWindowSpec]:
    """True-streaming count windows with Flink countWindow semantics
    (the reference's Flink backend compiled WINDOW ROWS this way,
    StreamWindowEmitter.scala:50-62; its Spark backend never compiled
    ROWS at all — this exceeds reference parity).

    Cross-micro-batch state via ``applyInPandasWithState``: each state
    key holds (elements-seen, pickled tail buffer). Tumbling (slide ==
    size): only complete windows of n fire, spanning batch boundaries.
    Sliding (slide m): window w fires when element (w+1)·m−1 arrives
    and contains the ≤n elements before it (early windows partial —
    Flink semantics); the buffer keeps the trailing n−1 elements.

    ``key`` (r04): ``PARTITION BY k`` runs an independent count
    window per key — state is keyed on k, tasks are distributed by
    the shuffle on k, windows fire per key in per-key arrival order
    (Flink ``keyBy(k).countWindow``). Without a key, a GLOBAL
    arrival-order counter is inherently serial — all rows pass
    through one stateful task, exactly as Flink's un-keyed
    ``countWindowAll`` is parallelism-1. That is the semantics of the
    operator, not an implementation shortcut."""
    import pickle

    import pandas as pd
    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    cols = df.columns
    out_schema = StructType(list(df.schema.fields)
                            + [StructField("__rowwin", LongType())])
    state_schema = StructType([StructField("pos", LongType()),
                               StructField("buf", BinaryType())])
    slide = m or n

    def assign(key, pdf_iter, state):
        if state.exists:
            pos, bufb = state.get
            buf = pickle.loads(bytes(bufb)) if bufb else None
        else:
            pos, buf = 0, None
        parts = ([buf] if buf is not None and len(buf) else []) \
            + [p[cols] for p in pdf_iter]
        rows = (pd.concat(parts, ignore_index=True)
                if parts else pd.DataFrame(columns=cols))
        buffered = len(buf) if buf is not None else 0
        start = pos - buffered  # global position of rows[0]
        new_pos = start + len(rows)
        outs = []
        if slide == n:  # tumbling: buffer is the incomplete tail,
            # so start is always a window boundary
            for w in range(start // n, new_pos // n):
                sl = rows.iloc[w * n - start:(w + 1) * n - start].copy()
                sl["__rowwin"] = w
                outs.append(sl)
            keep = rows.iloc[(new_pos // n) * n - start:]
        else:
            for w in range(pos // slide, new_pos // slide):
                lo = max(0, (w + 1) * slide - n)
                sl = rows.iloc[max(lo - start, 0)
                               :(w + 1) * slide - start].copy()
                sl["__rowwin"] = w
                outs.append(sl)
            keep = rows.iloc[max(len(rows) - (n - 1), 0):]
        state.update((int(new_pos), pickle.dumps(keep)))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    grouped = (df.groupBy(key) if key is not None
               else df.withColumn("__wkey", F.lit(0)).groupBy("__wkey"))
    out = grouped.applyInPandasWithState(assign, out_schema, state_schema,
                                         "append", "NoTimeout")
    return out, RowsWindowSpec(n, m, key=key)


class WindowSpec:
    """WINDOW op result metadata: downstream grouping adds
    F.window(ts, size, slide) to its keys (the Structured-Streaming
    equivalent of the reference's windowMode rewrite,
    internals/WindowSupport.scala:37-120)."""

    def __init__(self, size: str, slide: Optional[str], ts_col: str):
        self.size = size
        self.slide = slide
        self.ts_col = ts_col

    def window_col(self):
        if self.slide and self.slide != self.size:
            return F.window(F.col(self.ts_col), self.size, self.slide)
        return F.window(F.col(self.ts_col), self.size)


def apply_window(df: DataFrame, op: A.Window,
                 ts_col: Optional[str] = None,
                 watermark: Optional[str] = None
                 ) -> tuple[DataFrame, WindowSpec]:
    size = window_duration(op.size)
    slide = window_duration(op.slide) if op.slide else None
    if ts_col is None:
        # arrival time (reference default: DStream batch time)
        df = df.withColumn("__event_time", F.current_timestamp())
        ts_col = "__event_time"
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df, WindowSpec(size, slide, ts_col)


def socket_write(df: DataFrame, op: A.SocketWrite,
                 options: Optional[dict] = None):
    """Send each row as a text line to a TCP endpoint via foreachBatch
    (SS has no socket sink). Rows are sent from the EXECUTORS —
    ``foreachPartition`` opens one connection per partition — so no
    batch is ever materialized on the driver (at scale a driver-side
    collect-and-send serializes the whole stream through one
    process)."""
    if getattr(op, "mode", "") and op.mode.lower() == "zmq":
        return zmq_write(df, op, options)
    from ..sources.storage import pig_format_rows
    host, port = op.host or "localhost", op.port

    def send_partition(rows):
        import socket as _socket
        it = iter(rows)
        first = next(it, None)
        if first is None:  # empty partition: don't open a connection
            return
        with _socket.create_connection((host, port), timeout=10) as sock:
            sock.sendall((first[0] + "\n").encode())
            for r in it:
                sock.sendall((r[0] + "\n").encode())

    def send_batch(batch_df: DataFrame, _batch_id: int):
        pig_format_rows(batch_df).foreachPartition(send_partition)

    if not df.isStreaming:
        send_batch(df, 0)
        return None
    opts = options or {}
    return (df.writeStream.outputMode(opts.get("output_mode", "append"))
            .foreachBatch(send_batch)
            .trigger(processingTime=opts.get("trigger", "1 second"))
            .start())


def stream_store(df: DataFrame, path: str, func: Optional[str],
                 args: list, options: Optional[dict] = None):
    name = (func or "PigStorage").split(".")[-1].lower()
    opts = options or {}
    checkpoint = opts.get("checkpoint", path.rstrip("/") + "_chk")
    if name in ("binstorage", "parquetstorage"):
        fmt = "parquet"
        out = df
    else:
        from ..sources.storage import pig_format_rows
        fmt = "text"
        out = pig_format_rows(df, str(args[0]) if args else ",")
    return (out.writeStream.format(fmt)
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .start())
