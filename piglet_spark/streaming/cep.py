"""MATCH_EVENT — complex-event pattern matching (CEP).

Reference: op/Matcher.scala:83 + NFA runtime in
ceplib/src/main/scala/dbis/piglet/cep/** (SEQ/AND/OR/NEG patterns,
skip_till_next_match / skip_till_any_match modes, WITHIN horizon).

Spark-first re-expression: the NFA runs inside Arrow-batched
``applyInPandas`` groups. With ``piglet.cep.partition_key`` set
(SET command), matching is per-key and fully distributed — the scale
path. Without a key, events are matched globally: they are sorted and
processed in a single group (documented driver-size limitation, same
as any global-order CEP).

Output: one row per match, with each pattern event's fields prefixed
``<EventName>::`` (same lineage convention as JOIN).
"""

from __future__ import annotations

import operator
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.functions import col as F_col

from ..plans import ast as A

_CMP = {"==": operator.eq, "!=": operator.ne, "<": operator.lt,
        "<=": operator.le, ">": operator.gt, ">=": operator.ge}
_ARITH = {"+": operator.add, "-": operator.sub, "*": operator.mul,
          "/": operator.truediv, "%": operator.mod}

_UNIT_SECONDS = {"SECONDS": 1, "SECOND": 1, "MINUTES": 60, "MINUTE": 60,
                 "HOURS": 3600, "HOUR": 3600}


def compile_pred_vec(expr: A.Expr, colnames: list[str]):
    """Pig predicate AST →
    function(pdf) → boolean Series/scalar. The NFA precomputes one
    mask per event name over the whole frame, so the per-row scan
    does numpy indexing instead of a Python predicate call per row
    (measured ~5× on the sf0.1 event stream)."""
    if isinstance(expr, A.Literal):
        v = expr.value
        return lambda pdf: v
    if isinstance(expr, A.NamedField):
        name = expr.name
        return lambda pdf: pdf[name]
    if isinstance(expr, A.PositionalField):
        name = colnames[expr.pos]
        return lambda pdf: pdf[name]
    if isinstance(expr, A.Cmp):
        lf = compile_pred_vec(expr.left, colnames)
        rf = compile_pred_vec(expr.right, colnames)
        op = _CMP[expr.op]
        return lambda pdf: op(lf(pdf), rf(pdf))
    if isinstance(expr, A.And):
        lf = compile_pred_vec(expr.left, colnames)
        rf = compile_pred_vec(expr.right, colnames)
        return lambda pdf: lf(pdf) & rf(pdf)
    if isinstance(expr, A.Or):
        lf = compile_pred_vec(expr.left, colnames)
        rf = compile_pred_vec(expr.right, colnames)
        return lambda pdf: lf(pdf) | rf(pdf)
    if isinstance(expr, A.Not):
        f = compile_pred_vec(expr.expr, colnames)
        return lambda pdf: ~f(pdf)
    if isinstance(expr, A.BinOp):
        lf = compile_pred_vec(expr.left, colnames)
        rf = compile_pred_vec(expr.right, colnames)
        op = _ARITH[expr.op]
        return lambda pdf: op(lf(pdf), rf(pdf))
    if isinstance(expr, A.Neg):
        f = compile_pred_vec(expr.expr, colnames)
        return lambda pdf: -f(pdf)
    raise ValueError(f"unsupported CEP predicate {expr!r}")


def _pred_masks(pdf: pd.DataFrame, preds_vec: dict, names) -> dict:
    """name → boolean numpy mask over the (sorted) frame. Missing
    predicate = always-true; scalar results broadcast."""
    import numpy as np
    n = len(pdf)
    masks = {}
    for name in names:
        f = preds_vec.get(name)
        if f is None:
            masks[name] = np.ones(n, dtype=bool)
        else:
            masks[name] = np.broadcast_to(
                np.asarray(f(pdf)).astype(bool), (n,))
    return masks


def _find_ts_col(in_fields) -> str | None:
    """First timestamp-typed field — either flavor. Parquet written with
    isAdjustedToUTC=false loads as TimestampNTZType, not TimestampType;
    matching only the latter silently disabled WITHIN enforcement and
    time-ordering (found via the r02 CEP oracle)."""
    ts_types = (T.TimestampType, T.TimestampNTZType)
    for f_ in in_fields:
        if isinstance(f_.dataType, ts_types):
            return f_.name
    return None


def _match_conjunction(df: DataFrame, op: A.MatchEvent, executor,
                       names: list[str], require_all: bool) -> DataFrame:
    """AND: every event occurs (any order, distinct events) within the
    horizon; OR: any one occurs. Matched slots carry the event's
    fields, unmatched slots are null (ref cep engines Any/First)."""
    in_fields = df.schema.fields
    preds_vec = {n: compile_pred_vec(op.definitions[n],
                                     [f.name for f in in_fields])
                 for n in names if n in op.definitions}
    within = None
    if op.within is not None:
        within = op.within[0] * _UNIT_SECONDS[op.within[1]]
    # declared TIMESTAMP(f) wins over auto-detection, same as the SEQ
    # path (r05 fix: with 2+ timestamp columns AND/OR sorted and
    # enforced WITHIN on the wrong event-time axis)
    ts_col = executor.ts_fields.get(op.rel) \
        if hasattr(executor, "ts_fields") else None
    if ts_col is None:
        ts_col = _find_ts_col(in_fields)
    order_col = ts_col or in_fields[0].name
    colnames = [f_.name for f_ in in_fields]
    out_schema = T.StructType(
        [T.StructField(f"{n}::{f_.name}", f_.dataType, True)
         for n in names for f_ in in_fields])

    def step_conj(pdf: pd.DataFrame, state0=None):
        """Resumable conjunction matcher (see step_nfa): state is
        (slots, start_ts). Predicate masks precomputed vectorized."""
        import numpy as np
        pdf = pdf.sort_values(order_col, kind="mergesort")
        n_rows = len(pdf)
        masks = _pred_masks(pdf, preds_vec, names)
        col_arrays = {c: pdf[c].to_numpy() for c in colnames}
        ts_arr = pdf[ts_col].to_numpy() if ts_col is not None else None

        def row_at(i):
            r = {}
            for c in colnames:
                v = col_arrays[c][i]
                if isinstance(v, np.datetime64):
                    v = pd.Timestamp(v)
                r[c] = v
            return r

        matches = []
        if state0 is None:
            slots, start_ts = {}, None
        else:
            slots, start_ts = state0
            slots = dict(slots)
        for i in range(n_rows):
            if within is not None and ts_arr is not None and slots and \
                    (pd.Timestamp(ts_arr[i])
                     - start_ts).total_seconds() > within:
                slots, start_ts = {}, None
            for n in names:
                if n not in slots and bool(masks[n][i]):
                    if not slots:
                        start_ts = pd.Timestamp(ts_arr[i]) \
                            if ts_arr is not None else None
                    slots[n] = row_at(i)
                    break
            done = (len(slots) == len(names)) if require_all else bool(slots)
            if done:
                out = {}
                for n in names:
                    r = slots.get(n)
                    for c in colnames:
                        out[f"{n}::{c}"] = r[c] if r is not None else None
                matches.append(out)
                slots, start_ts = {}, None
        if not matches:
            out_df = pd.DataFrame(columns=[f.name for f in out_schema])
        else:
            out_df = pd.DataFrame(matches)
        return out_df, (slots, start_ts)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return step_conj(pdf)[0]

    key = _partition_key(executor)
    if df.isStreaming:
        return _run_stream_stateful(df, key, step_conj, out_schema)
    if key:
        return _run_per_key(df, key, run, out_schema)
    return _run_global(df, run, out_schema, executor)


def _partition_key(executor) -> str | None:
    if hasattr(executor, "options"):
        return executor.options.get("piglet.cep.partition_key") \
            or executor.options.get("cep.partition_key")
    return None


# Un-keyed matching is inherently single-task (a totally-ordered
# global NFA); above this many rows it is almost certainly a mistake
# — refuse instead of silently serializing the corpus through one
# task. Override with SET piglet.cep.max_global_rows, or better, SET
# piglet.cep.partition_key for the distributed per-key path.
_MAX_GLOBAL_ROWS = 5_000_000


def _run_global(df: DataFrame, run, out_schema, executor) -> DataFrame:
    """Global (un-keyed) matching: totally-ordered NFA in ONE task.
    Warns at plan time and refuses at execution time above the
    configurable row limit (checked inside the task — no extra
    driver-side count job)."""
    import warnings
    limit = _MAX_GLOBAL_ROWS
    if hasattr(executor, "options"):
        limit = int(executor.options.get("piglet.cep.max_global_rows",
                                         limit))
    warnings.warn(
        "MATCH_EVENT without piglet.cep.partition_key runs a GLOBAL "
        "totally-ordered NFA in a single task — set SET "
        "piglet.cep.partition_key '<col>' for distributed per-key "
        f"matching (refuses above {limit} rows)", stacklevel=3)

    def global_run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dfs, total = [], 0
        for b in batches:
            if len(b):
                total += len(b)
                if total > limit:
                    raise RuntimeError(
                        f"un-keyed MATCH_EVENT over more than {limit} "
                        f"rows: global totally-ordered matching would "
                        f"serialize the input through one task. SET "
                        f"piglet.cep.partition_key '<col>' (distributed "
                        f"per-key path) or raise "
                        f"piglet.cep.max_global_rows")
                dfs.append(b)
        if not dfs:  # pd.concat([]) raises; empty input = zero matches
            yield pd.DataFrame(columns=[f.name for f in out_schema])
            return
        yield run(pd.concat(dfs, ignore_index=True))

    return df.coalesce(1).mapInPandas(global_run, out_schema)


def _run_per_key_ranges(df: DataFrame, key: str, prepare, scan, wrap,
                        order_col: str, out_schema) -> DataFrame:
    """Distributed per-key matching with PARTITION-level batching:
    repartition on the key, sort the whole partition frame by
    (key, event order), compute the vectorized predicate masks ONCE,
    then run the NFA per key over contiguous index ranges and emit
    ONE output frame per partition. Compared to a per-key-group loop
    (pandas groupby → sub-frame + masks + output frame per key), the
    per-key fixed costs vanish — at 1500 keys × ~100 events this was
    most of the operator's runtime."""
    import numpy as np

    def partition_runner(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dfs = [b for b in batches if len(b)]
        if not dfs:
            return
        pdf = pd.concat(dfs, ignore_index=True)
        ctx = prepare(pdf, sort_by=[key, order_col])
        keys = ctx["pdf"][key].to_numpy()
        n = ctx["n"]
        # contiguous group boundaries (nulls group together too:
        # NaN != NaN, so use pandas-aware comparison on codes)
        codes = pd.factorize(keys, use_na_sentinel=False)[0]
        bounds = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1], True])
        matches: list = []
        for gi in range(len(bounds) - 1):
            scan(ctx, int(bounds[gi]), int(bounds[gi + 1]), None, matches)
        out = wrap(matches)
        if len(out):
            yield out

    return df.repartition(F_col(key)).mapInPandas(
        partition_runner, out_schema)


def _run_per_key(df: DataFrame, key: str, run, out_schema) -> DataFrame:
    """Distributed per-key matching: repartition on the key, then ONE
    pandas frame per PARTITION with a vectorized groupby inside —
    not ``groupBy(key).applyInPandas`` (that builds one pandas frame
    per key; at high key cardinality the per-frame overhead dominates
    — measured ~3 s for 1500 keys at sf0.1, ~6× the actual NFA
    time). Memory holds one shuffle partition, bounded by
    spark.sql.shuffle.partitions, not one key group."""
    import pandas as _pd

    def partition_runner(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dfs = [b for b in batches if len(b)]
        if not dfs:
            return
        pdf = _pd.concat(dfs, ignore_index=True)
        # dropna=False: Spark's groupBy treats a null key as a real
        # group — pandas would silently drop those events
        for _, grp in pdf.groupby(key, sort=False, dropna=False):
            out = run(grp)
            if len(out):
                yield out

    return df.repartition(F_col(key)).mapInPandas(
        partition_runner, out_schema)


def _seq_events(pattern: Any) -> list[tuple[str, bool]]:
    """Flatten a SEQ pattern into [(event_name, negated)]."""
    kind, payload = pattern
    if kind == "event":
        return [(payload, False)]
    if kind == "seq":
        out = []
        for child in payload:
            out.extend(_seq_events(child))
        return out
    if kind == "neg":
        inner = _seq_events(payload[0])
        return [(n, True) for n, _ in inner]
    raise ValueError(f"only SEQ/NEG patterns flatten to sequences: {kind}")


def match_event(df: DataFrame, op: A.MatchEvent, executor) -> DataFrame:
    kind = op.pattern[0]
    if kind in ("seq", "event", "neg"):
        steps = _seq_events(op.pattern)
    elif kind in ("and", "or"):
        names = []
        for child in op.pattern[1]:
            if child[0] != "event":
                raise ValueError(
                    "AND/OR patterns support single events as children")
            names.append(child[1])
        return _match_conjunction(df, op, executor, names,
                                  require_all=(kind == "and"))
    else:
        raise ValueError(f"unknown pattern {kind}")

    in_fields = df.schema.fields
    preds_vec = {name: compile_pred_vec(p, [f.name for f in in_fields])
                 for name, p in op.definitions.items()}
    within = None
    if op.within is not None:
        within = op.within[0] * _UNIT_SECONDS[op.within[1]]
    mode = op.mode
    ts_col = executor.ts_fields.get(op.rel) if hasattr(executor, "ts_fields") \
        else None
    if ts_col is None:
        ts_col = _find_ts_col(in_fields)
    order_col = ts_col or in_fields[0].name

    out_fields = []
    for name, neg in steps:
        if neg:
            continue
        for f_ in in_fields:
            out_fields.append(T.StructField(f"{name}::{f_.name}",
                                            f_.dataType, True))
    out_schema = T.StructType(out_fields)
    colnames = [f_.name for f_ in in_fields]
    # NEG semantics (r05 fix): a NEG step guards the whole INTERVAL
    # until the next positive event matches, not just one row.
    # positives = the consuming steps in order; guards[k] = negated
    # event names that must NOT occur while waiting for positive k.
    positives = [n for n, neg in steps if not neg]
    if not positives:
        raise ValueError("SEQ pattern of only NEG events matches nothing")
    if steps[-1][1]:
        raise ValueError(
            "SEQ pattern ending in NEG is unsupported: negation guards "
            "the interval before the NEXT positive event, so a trailing "
            "NEG has no completion point (ref NegationState sits "
            "between normal states)")
    guards: list[list[str]] = [[] for _ in positives]
    _pi = 0
    for n, neg in steps:
        if neg:
            guards[_pi].append(n)
        else:
            _pi += 1
    max_runs = 10000
    if hasattr(executor, "options"):
        max_runs = int(executor.options.get("piglet.cep.max_runs",
                                            max_runs))

    def prepare(pdf: pd.DataFrame, sort_by=None):
        """Vectorized per-frame context: one boolean numpy mask per
        event name + raw column arrays. Computed ONCE per pandas
        frame (the whole Spark partition on the per-key path — NOT
        once per key: at high key cardinality per-group mask/frame
        construction dominated the NFA time)."""
        import numpy as np
        pdf = pdf.sort_values(sort_by or order_col, kind="mergesort")
        masks = _pred_masks(pdf, preds_vec, {n for n, _ in steps})
        col_arrays = {c: pdf[c].to_numpy() for c in colnames}
        ts_arr = pdf[ts_col].to_numpy() if ts_col is not None else None

        def row_at(i):
            r = {}
            for c in colnames:
                v = col_arrays[c][i]
                if isinstance(v, np.datetime64):
                    v = pd.Timestamp(v)
                r[c] = v
            return r

        return {"pdf": pdf, "masks": masks, "row_at": row_at,
                "ts_arr": ts_arr, "n": len(pdf)}

    def _emit(partial, matches):
        out = {}
        for n, r in zip(positives, partial):
            for c in colnames:
                out[f"{n}::{c}"] = r[c]
        matches.append(out)

    def scan(ctx, lo, hi, state0, matches):
        """Run the NFA over rows [lo, hi) of a prepared frame,
        appending match dicts to ``matches``; returns the resume
        state — (step_i, start_ts, partial) for the single-run modes,
        a list of such runs for the pooled modes
        (skip_till_any_match / sase_any_match / next_match_pooled)."""
        if mode in ("skip_till_any_match", "sase_any_match",
                    "next_match_pooled"):
            return _scan_pooled(ctx, lo, hi, state0, matches)
        masks, ts_arr, row_at = ctx["masks"], ctx["ts_arr"], ctx["row_at"]
        if state0 is None:
            partial, step_i, start_ts = [], 0, None
        else:
            step_i, start_ts, partial = state0
            partial = list(partial)
        for i in range(lo, hi):
            while True:
                if partial and any(bool(masks[g][i])
                                   for g in guards[step_i]):
                    # negated event inside the guarded interval →
                    # abort; the row may still start a fresh run
                    partial, step_i, start_ts = [], 0, None
                    continue
                ok = bool(masks[positives[step_i]][i])
                if ok:
                    if within is not None and ts_arr is not None and partial:
                        dt = (pd.Timestamp(ts_arr[i])
                              - start_ts).total_seconds()
                        if dt > within:
                            partial, step_i, start_ts = [], 0, None
                            continue
                    if not partial:
                        start_ts = pd.Timestamp(ts_arr[i]) \
                            if ts_arr is not None else None
                    partial.append(row_at(i))
                    step_i += 1
                    if step_i >= len(positives):
                        _emit(partial, matches)
                        partial, step_i, start_ts = [], 0, None
                elif mode == "strict" and partial:
                    # contiguity violated → reset AND reconsider this
                    # row as the start of a new run (r05 fix: `break`
                    # here dropped valid back-to-back matches)
                    partial, step_i, start_ts = [], 0, None
                    continue
                break
        return (step_i, start_ts, partial)

    def _scan_pooled(ctx, lo, hi, state0, matches):
        """Pooled-run engines — a run pool where EVERY event may also
        start a new run (ref engines/CEPEngine.createNewStructue),
        with the per-mode transition mirroring the reference engine:

        * ``skip_till_any_match`` → ref engines/AnyMatch.scala:
          clone-on-advance AND kill-on-mismatch — a run whose
          current-state predicate fails on an event is DELETED (the
          reference NFA has forward edges only, no self-loops, so a
          mismatch has no surviving transition). For [X1,X2,Y3] the
          reference emits only (X2,Y3): X2 kills the X1-run. Exact
          reference parity, verified against AnyMatch.scala:13-32.
        * ``next_match_pooled`` → ref engines/NextMatch.scala: runs
          survive mismatches (no kill, no clone); each run advances
          greedily, every start event spawns a run, so [X1,X2,Y3]
          emits (X1,Y3) AND (X2,Y3). (The reference maps the DEFAULT
          mode string to this engine; this repo's default is the
          single-run FirstMatch engine — deliberate, documented
          divergence, with this mode giving exact NextMatch parity.)
        * ``sase_any_match`` → extension, NOT in the reference:
          textbook SASE skip-till-any-match — clone-on-advance and
          runs survive mismatches. Strictly more matches than both
          reference engines.

        WITHIN expiry garbage-collects runs in every mode; without
        WITHIN the pool is capped at piglet.cep.max_runs (clear
        error, not OOM)."""
        kill_on_mismatch = (mode == "skip_till_any_match")
        clone_on_advance = (mode != "next_match_pooled")
        masks, ts_arr, row_at = ctx["masks"], ctx["ts_arr"], ctx["row_at"]
        runs = [] if state0 is None else \
            [(s, t, list(p)) for s, t, p in state0]
        n_pos = len(positives)
        for i in range(lo, hi):
            ts_i = pd.Timestamp(ts_arr[i]) if ts_arr is not None else None
            nxt = []
            for step_i, start_ts, partial in runs:
                if within is not None and ts_i is not None and \
                        (ts_i - start_ts).total_seconds() > within:
                    continue  # window expired → GC the run
                if any(bool(masks[g][i]) for g in guards[step_i]):
                    continue  # negated event → kill the run
                if bool(masks[positives[step_i]][i]):
                    adv = partial + [row_at(i)]
                    if clone_on_advance:
                        # ref AnyMatch clones BEFORE addEvent, so the
                        # waiting copy survives even when the advance
                        # completes the match
                        nxt.append((step_i, start_ts, partial))
                    if step_i + 1 >= n_pos:
                        _emit(adv, matches)
                    else:
                        nxt.append((step_i + 1, start_ts, adv))
                elif kill_on_mismatch:
                    continue  # ref AnyMatch: mismatch deletes the run
                else:
                    nxt.append((step_i, start_ts, partial))  # wait
            if bool(masks[positives[0]][i]):
                if n_pos == 1:
                    _emit([row_at(i)], matches)
                else:
                    nxt.append((1, ts_i, [row_at(i)]))
            if len(nxt) > max_runs:
                raise RuntimeError(
                    f"{mode} run pool exceeded "
                    f"{max_runs} concurrent partial matches — add a "
                    f"WITHIN horizon (expired runs are GC'd) or raise "
                    f"piglet.cep.max_runs")
            runs = nxt
        return runs

    def _wrap(matches):
        if not matches:
            return pd.DataFrame(columns=[f.name for f in out_schema])
        return pd.DataFrame(matches)

    def step_nfa(pdf: pd.DataFrame, state0=None):
        """Resumable whole-frame NFA (streaming/global paths): run
        from state0, return (matches_df, state1)."""
        ctx = prepare(pdf)
        matches: list = []
        st = scan(ctx, 0, ctx["n"], state0, matches)
        return _wrap(matches), st

    def run_nfa(pdf: pd.DataFrame) -> pd.DataFrame:
        return step_nfa(pdf)[0]

    key = _partition_key(executor)
    if df.isStreaming:
        return _run_stream_stateful(df, key, step_nfa, out_schema)
    if key:
        return _run_per_key_ranges(df, key, prepare, scan, _wrap,
                                   order_col, out_schema)
    return _run_global(df, run_nfa, out_schema, executor)


# GroupState value: one pickled blob of the NFA resume state —
# (step_i, start_ts, partial row dicts). Pickle (not JSON) so
# timestamps and arbitrary column values round-trip with their types.
_STREAM_STATE_SCHEMA = T.StructType(
    [T.StructField("blob", T.BinaryType(), True)])


def _run_stream_stateful(df: DataFrame, key: str | None, step_fn,
                         out_schema) -> DataFrame:
    """Streaming MATCH_EVENT with per-key NFA state that SURVIVES
    micro-batch boundaries (``applyInPandasWithState``) — the
    Structured-Streaming re-expression of the reference's DStream CEP
    engine, which kept its NFA alive across batches
    (ceplib ``NFAController``). Events are time-ordered within each
    micro-batch; cross-batch ordering follows arrival, as in the
    reference. Requires a partition key: per-key state is what makes
    the operator distributable AND bounded — a global streaming NFA
    would need a single totally-ordered task holding the whole
    stream."""
    import pickle

    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    if not key:
        raise ValueError(
            "streaming MATCH_EVENT requires SET piglet.cep."
            "partition_key '<col>' — per-key NFA state is the "
            "distributable formulation (a global streaming NFA would "
            "serialize the stream through one task)")

    def with_state(key_tuple, pdf_iter, state: "GroupState"):
        if state.exists:
            st = pickle.loads(bytes(state.get[0]))
        else:
            st = None
        frames = [p for p in pdf_iter if len(p)]
        if frames:
            out, st = step_fn(pd.concat(frames, ignore_index=True), st)
            state.update((pickle.dumps(st),))
            if len(out):
                yield out

    return (df.groupBy(key)
            .applyInPandasWithState(
                with_state, out_schema, _STREAM_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))
