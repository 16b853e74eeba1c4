"""Registry hygiene: ``queries()`` and ``oracle_sql()`` in
``__spark_entry__.py`` are two parallel 101-key dicts that must stay
in sync — the driver's correctness gate looks up each query's oracle
by key, and a reorder (like the r10 rotation) that touches one dict
but not the other would silently orphan a query into the weaker
rows-only check. These tests import the entry module WITHOUT a
SparkSession (both functions only build dicts of callables/strings).
"""

import importlib.util
import sys
from pathlib import Path

ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"


def _load_entry():
    mod = sys.modules.get("__spark_entry_test__")
    if mod is None:
        spec = importlib.util.spec_from_file_location(
            "__spark_entry_test__", ENTRY)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["__spark_entry_test__"] = mod
        spec.loader.exec_module(mod)
    return mod


def test_every_query_has_an_oracle():
    """set(queries()) == set(oracle_sql()) at the driver's default
    scale factor (sf0.01, where the zlib fixture oracle is feasible).
    ``compression_ratio`` is the one key whose oracle is allowed to
    drop out — only when its python-zlib fixture recompute is
    infeasible (>1M docs), which never happens at the gate's sf."""
    mod = _load_entry()
    q = set(mod.queries())
    o = set(mod.oracle_sql())
    missing = q - o
    assert missing <= {"compression_ratio"}, (
        f"queries without an oracle_sql entry: {sorted(missing)}")
    assert missing == set(), (
        "compression_ratio oracle should be feasible at sf0.01")
    orphans = o - q
    assert orphans == set(), (
        f"oracle_sql keys with no queries() entry: {sorted(orphans)}")


def test_oracles_are_nonempty_sql_strings():
    mod = _load_entry()
    for k, sql in mod.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), (
            f"oracle for {k!r} is not a SQL string")


def test_gate_window_holds_rotation_targets():
    """The driver adjudicates exactly the first 50 registry entries
    (observed r01-r09). Pin the r10 rotation: every query the r9
    VERDICT flagged as never-driver-gated must sit inside the
    50-entry gate window this round."""
    mod = _load_entry()
    first50 = list(mod.queries())[:50]
    for k in ("pagerank_graph", "hybrid_rrf", "mmr_rerank",
              "mmr_rerank_blas", "bm25_topk", "hard_negatives",
              "hard_negatives_blas", "knn_join_exact", "knn_join_lsh",
              "seq_pack", "global_shuffle", "stratified_sample",
              "latest_by_key", "funnel_conversion", "dedup_semantic",
              "minhash_cross", "dsir_resample", "token_entropy",
              "mmr_rerank_ivf", "hard_negatives_ivf",
              "minhash_cross_index", "quality_filter_report",
              "token_budget_sample",
              "cep_next_match_pooled", "spatial_join_grid",
              "salted_join_agg", "lm_perplexity", "duplicate_spans"):
        assert k in first50, f"{k} fell out of the driver-gate window"
