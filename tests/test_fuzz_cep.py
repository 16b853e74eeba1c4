"""Differential CEP fuzzer: random event streams and SEQ/NEG
patterns run through MATCH_EVENT in every mode, compared against
brute-force oracles implemented independently from the documented
semantics (streaming/cep.py docstrings; ref ceplib engines
AnyMatch/NextMatch/FirstMatch):

* default / strict — single-run FirstMatch simulation.
* skip_till_any_match — subsequence enumeration where every gap row
  must satisfy the waiting step's predicate (ref AnyMatch:
  clone-on-advance + kill-on-mismatch).
* sase_any_match — FULL subsequence enumeration (keep-alive
  branching): structurally independent of the engine's run-pool
  loop, so correlated bugs can't hide.
* next_match_pooled — per-start greedy walk (ref NextMatch: runs
  survive mismatches, no clone).

All modes share the guard rule (a NEG event's predicate firing while
a run waits kills that run) and the WITHIN horizon (run GC'd past
the horizon; with strictly increasing timestamps this reduces to
ts[last] − ts[first] ≤ within)."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import piglet_spark as pg

# Deep-sweep control: PIGLET_FUZZ_SCALE multiplies every arm's
# max_examples (default 1 — the CI-fast counts). A one-off
# `PIGLET_FUZZ_SCALE=8 pytest tests/test_fuzz_*.py` is the deep
# sweep recorded per round.
import os as _os
_FSCALE = max(1, int(_os.environ.get("PIGLET_FUZZ_SCALE", "1")))

KINDS = "XYZ"

# (kinds, deltas) — strictly increasing timestamps via positive deltas
events_strategy = st.tuples(
    st.lists(st.sampled_from(KINDS), min_size=1, max_size=18),
    st.lists(st.integers(min_value=1, max_value=6), min_size=18,
             max_size=18),
)

# positives: 2-3 step kinds; guard: optional (kind, gap_position)
pattern_strategy = st.tuples(
    st.lists(st.sampled_from(KINDS), min_size=2, max_size=3),
    st.one_of(st.none(),
              st.tuples(st.sampled_from(KINDS),
                        st.integers(min_value=1, max_value=2))),
    st.one_of(st.none(), st.integers(min_value=3, max_value=12)),
)


def _guards(m: int, guard) -> list[list[str]]:
    gs: list[list[str]] = [[] for _ in range(m)]
    if guard is not None:
        kind, pos = guard
        gs[min(pos, m - 1)].append(kind)
    return gs


def brute_single(ks, ts, pos, guards, within, strict=False):
    """FirstMatch single-run simulation (default / strict modes)."""
    out, partial, step, start = [], [], 0, None
    for i in range(len(ks)):
        while True:
            if partial and ks[i] in guards[step]:
                partial, step, start = [], 0, None
                continue
            if ks[i] == pos[step]:
                if within is not None and partial and \
                        ts[i] - start > within:
                    partial, step, start = [], 0, None
                    continue
                if not partial:
                    start = ts[i]
                partial = partial + [i]
                step += 1
                if step >= len(pos):
                    out.append(tuple(partial))
                    partial, step, start = [], 0, None
            elif strict and partial:
                partial, step, start = [], 0, None
                continue
            break
    return sorted(out)


def _gap_ok(ks, lo, hi, pred_kind, guard_kinds, require_pred):
    for r in range(lo + 1, hi):
        if ks[r] in guard_kinds:
            return False
        if require_pred and ks[r] != pred_kind:
            return False
    return True


def brute_enumerate(ks, ts, pos, guards, within, kill_on_mismatch):
    """All index tuples i1<…<im with per-step gap constraints —
    sase_any_match (gaps free of guard events) and
    skip_till_any_match (gaps additionally all-match the waiting
    predicate)."""
    m = len(pos)
    idx = range(len(ks))
    out = []
    for tup in itertools.combinations(idx, m):
        if any(ks[i] != pos[j] for j, i in enumerate(tup)):
            continue
        if within is not None and ts[tup[-1]] - ts[tup[0]] > within:
            continue
        # consumed rows (after the first) must not fire their step's
        # guard; gap rows kill per the mode rule
        ok = True
        for j in range(1, m):
            if ks[tup[j]] in guards[j]:
                ok = False
                break
            if not _gap_ok(ks, tup[j - 1], tup[j], pos[j], guards[j],
                           kill_on_mismatch):
                ok = False
                break
        if ok:
            out.append(tup)
    return sorted(out)


def brute_greedy(ks, ts, pos, guards, within):
    """next_match_pooled: every start spawns one run that advances at
    the next row matching its current predicate; mismatches are
    survived, guard rows and horizon expiry kill."""
    m = len(pos)
    out = []
    for i1 in range(len(ks)):
        if ks[i1] != pos[0]:
            continue
        tup, j = [i1], 1
        for r in range(i1 + 1, len(ks)):
            if j >= m:
                break
            if within is not None and ts[r] - ts[i1] > within:
                tup = None
                break
            if ks[r] in guards[j]:
                tup = None
                break
            if ks[r] == pos[j]:
                tup.append(r)
                j += 1
        if tup is not None and len(tup) == m:
            out.append(tuple(tup))
    return sorted(out)


@given(events_strategy, pattern_strategy)
@settings(max_examples=10 * _FSCALE, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_cep_modes_match_bruteforce(spark, tmp_path_factory, events,
                                    patspec):
    kinds, deltas = events
    pos, guard, within = patspec
    ks = list(kinds)
    ts = list(itertools.accumulate(deltas[:len(ks)]))
    guards = _guards(len(pos), guard)

    import datetime
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        f"{i},{(t0 + datetime.timedelta(seconds=ts[i]))},{ks[i]}"
        for i in range(len(ks))
    ]
    p = tmp_path_factory.mktemp("cepfuzz") / "ev.csv"
    p.write_text("\n".join(rows) + "\n")

    names = [f"P{j}" for j in range(len(pos))]
    steps = []
    for j, n in enumerate(names):
        for g in guards[j]:
            steps.append(f"NEG(G{j})")
        steps.append(n)
    defs = [f"{n}: k == '{k}'" for n, k in zip(names, pos)]
    for j, gs in enumerate(guards):
        for g in gs:
            defs.append(f"G{j}: k == '{g}'")
    clauses = f"WITHIN {within} SECONDS " if within is not None else ""
    script = [
        f"E = LOAD '{p}' USING PigStorage(',') AS "
        "(id:int, ts:datetime, k:chararray) TIMESTAMP(ts);"
    ]
    modes = {
        "D": "", "S": "MODE strict",
        "A": "MODE skip_till_any_match",
        "E2": "MODE sase_any_match",
        "N": "MODE next_match_pooled",
    }
    for alias, mode in modes.items():
        script.append(
            f"{alias} = MATCH_EVENT E PATTERN SEQ({', '.join(steps)}) "
            f"WITH ({', '.join(defs)}) {clauses}{mode};")
    eng = pg.PigEngine(spark)
    eng.run("\n".join(script))

    def got(alias):
        cols = [f"{n}::id" for n in names]
        return sorted(tuple(r) for r in
                      eng.df(alias).select(*cols).collect())

    expect = {
        "D": brute_single(ks, ts, pos, guards, within),
        "S": brute_single(ks, ts, pos, guards, within, strict=True),
        "A": brute_enumerate(ks, ts, pos, guards, within,
                             kill_on_mismatch=True),
        "E2": brute_enumerate(ks, ts, pos, guards, within,
                              kill_on_mismatch=False),
        "N": brute_greedy(ks, ts, pos, guards, within),
    }
    for alias in modes:
        assert got(alias) == expect[alias], (
            alias, ks, ts, pos, guards, within,
            got(alias), expect[alias])


# ------------------------------------------------- AND / OR patterns
# (r08 — the SEQ/NEG arms above never exercised the conjunction
# matcher in cep.py:_match_conjunction; its documented semantics:
# single run, an event fills the FIRST unfilled slot in declaration
# order whose predicate it satisfies, WITHIN resets the slots before
# filling, AND emits when every slot is filled / OR as soon as any
# slot fills, then the run resets.)

conj_pattern_strategy = st.tuples(
    st.lists(st.sampled_from(KINDS), min_size=2, max_size=3),  # slot kinds
    st.booleans(),                                             # AND vs OR
    st.one_of(st.none(), st.integers(min_value=3, max_value=12)),
)


def brute_conjunction(ks, ts, slot_kinds, within, require_all):
    """Independent simulation of the conjunction matcher."""
    m = len(slot_kinds)
    slots: dict[int, int] = {}
    start = None
    out = []
    for i, (k, t) in enumerate(zip(ks, ts)):
        if within is not None and slots and (t - start) > within:
            slots, start = {}, None
        for j in range(m):
            if j not in slots and k == slot_kinds[j]:
                if not slots:
                    start = t
                slots[j] = i
                break
        done = (len(slots) == m) if require_all else bool(slots)
        if done:
            out.append(tuple(slots.get(j, -1) for j in range(m)))
            slots, start = {}, None
    return sorted(out)


@given(events_strategy, conj_pattern_strategy)
@settings(max_examples=12 * _FSCALE, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_cep_and_or_match_bruteforce(spark, tmp_path_factory, events,
                                     patspec):
    kinds, deltas = events
    slot_kinds, require_all, within = patspec
    ks = list(kinds)
    ts = list(itertools.accumulate(deltas[:len(ks)]))

    import datetime
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        f"{i},{(t0 + datetime.timedelta(seconds=ts[i]))},{ks[i]}"
        for i in range(len(ks))
    ]
    p = tmp_path_factory.mktemp("cepconj") / "ev.csv"
    p.write_text("\n".join(rows) + "\n")

    names = [f"P{j}" for j in range(len(slot_kinds))]
    defs = [f"{n}: k == '{k}'" for n, k in zip(names, slot_kinds)]
    head = "AND" if require_all else "OR"
    clauses = f" WITHIN {within} SECONDS" if within is not None else ""
    eng = pg.PigEngine(spark)
    eng.run(
        f"E = LOAD '{p}' USING PigStorage(',') AS "
        f"(id:int, ts:datetime, k:chararray) TIMESTAMP(ts);\n"
        f"M = MATCH_EVENT E PATTERN {head}({', '.join(names)}) "
        f"WITH ({', '.join(defs)}){clauses};")
    cols = [f"{n}::id" for n in names]
    got = sorted(tuple(-1 if v is None else v for v in r)
                 for r in eng.df("M").select(*cols).collect())
    want = brute_conjunction(ks, ts, slot_kinds, within, require_all)
    assert got == want, (ks, ts, slot_kinds, require_all, within,
                         got, want)
