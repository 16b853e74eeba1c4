"""Hybrid-retrieval operators: rank fusion over multiple retrievers.

A curation/RAG pipeline rarely trusts ONE retriever: the standard
recipe runs a lexical ranker (BM25) and a dense ranker (kNN over an
embedding index) and fuses the two top-k lists per query.
Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009:
"Reciprocal rank fusion outperforms Condorcet and individual rank
learning methods") is the fusion every major engine ships
(Elasticsearch/OpenSearch "rrf", Vespa, Milvus) because it needs no
score calibration — only ranks.

Reference parity note: the reference engine (dbis-ilm/piglet) has no
retrieval fusion; the nearest shape is its JOIN + FOREACH idiom over
two ranked relations. This module is part of the training-data
toolkit layered on the same engine.

Scale shape: fusion consumes ALREADY top-k-truncated rankings —
|queries| x k rows per retriever, never corpus-sized — so the union +
per-(query,doc) aggregation + per-query rank window all operate on
bounded data. The heavy lifting (corpus scans, ANN) lives in the
upstream retrievers (text.bm25_topk, similarity.knn_join); at 100 TB
this operator's own cost is noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fusion(rankings: dict[str, DataFrame], k_rrf: int = 60,
               topk: int = 10, query_col: str = "query_id",
               id_col: str = "doc_id",
               rank_col: str = "rank") -> DataFrame:
    """Reciprocal Rank Fusion of named per-query rankings.

    Each value of ``rankings`` is a DataFrame carrying at least
    ``(query_col, id_col, rank_col)`` with ``rank_col`` 1-based per
    query (the shape ``text.bm25_topk`` and a windowed
    ``similarity.knn_join`` both produce). A document absent from one
    list simply contributes nothing from it — RRF's outer-union
    semantics, no imputation.

    ``rrf_score(q, d) = Σ_lists 1 / (k_rrf + rank_list(q, d))``
    with the SIGIR-2009 default ``k_rrf=60``. Returns
    ``(query_col, id_col, rrf_score, n_lists, rank)`` — score rounded
    to 6 decimals BEFORE the rank window (ties → ascending id), rank
    1..``topk`` per query. ``n_lists`` counts the lists that
    contributed (diagnostic: 2-list agreement is the usual relevance
    signal).

    Deterministic and oracle-reproducible: the score is a sum of at
    most ``len(rankings)`` reciprocals per (query, doc) — round-6 is
    stable under any addition order at realistic list counts.

    ``id_col`` keeps its NATIVE type (string ids group correctly —
    no cast; tie ordering is the type's natural order), so every
    list must carry the same id type or a union-compatible one.
    """
    if not rankings:
        raise ValueError("rrf_fusion needs at least one ranking")
    contribs = []
    for name, df in rankings.items():
        contribs.append(
            df.select(F.col(query_col).alias("_q"),
                      F.col(id_col).alias("_d"),
                      (1.0 / (F.lit(int(k_rrf))
                              + F.col(rank_col).cast("double")))
                      .alias("_c")))
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    fused = (allc.groupBy("_q", "_d")
             .agg(F.round(F.sum("_c"), 6).alias("rrf_score"),
                  F.count(F.lit(1)).cast("int").alias("n_lists")))
    rn = F.row_number().over(
        Window.partitionBy("_q").orderBy(F.desc("rrf_score"),
                                         F.asc("_d")))
    return (fused.withColumn("rank", rn)
            .filter(F.col("rank") <= int(topk))
            .select(F.col("_q").alias(query_col),
                    F.col("_d").alias(id_col),
                    "rrf_score", "n_lists", "rank"))


def hybrid_search(docs: DataFrame, embeddings: DataFrame,
                  queries: list[tuple[int, str]],
                  query_vecs: DataFrame,
                  k: int = 10, k_rrf: int = 60,
                  text_col: str = "text", doc_id_col: str = "doc_id",
                  vec_col: str = "embedding",
                  vec_id_col: str = "vec_id",
                  knn_method: str = "exact") -> DataFrame:
    """Lexical + dense hybrid retrieval: BM25 over ``docs`` fused
    (RRF) with a cosine kNN join of ``query_vecs`` against
    ``embeddings``. ``queries`` supplies ``(query_id, text)`` pairs;
    ``query_vecs`` supplies ``(query_id, vector)`` rows (column names
    ``query_id`` / ``vec_col``) for the SAME query ids. Document ids
    on both sides must live in one id space (doc_id == vec_id), as
    in any store that indexes text and embedding per document.

    Returns the :func:`rrf_fusion` shape. Scale: one corpus text
    scan (BM25 semi-joined postings) + one embedding scan (kNN, see
    ``similarity.knn_join`` strategy notes); fusion is bounded."""
    from . import similarity as _sim
    from . import text as _text
    lex = _text.bm25_topk(docs, queries, text_col=text_col,
                          id_col=doc_id_col, k=k)
    qv = query_vecs.select(F.col("query_id").alias("_qid2"),
                           F.col(vec_col).alias(vec_col))
    dense = _sim.knn_join(embeddings, qv, k=k, vec_col=vec_col,
                          id_col=vec_id_col, q_vec_col=vec_col,
                          q_id_col="_qid2", exclude_self=False,
                          method=knn_method)
    rnw = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.desc("cos"),
                                          F.asc("nbr_id")))
    dense_rk = (dense.withColumn("rank", rnw)
                .select(F.col("qid").alias("query_id"),
                        F.col("nbr_id").alias(doc_id_col), "rank"))
    lex_rk = lex.select("query_id", doc_id_col, "rank")
    return rrf_fusion({"bm25": lex_rk, "dense": dense_rk},
                      k_rrf=k_rrf, topk=k, query_col="query_id",
                      id_col=doc_id_col)


def mmr_rerank(corpus: DataFrame | None, queries: DataFrame,
               k: int = 5,
               pool: int = 20, lam: float = 0.7,
               vec_col: str = "embedding", id_col: str = "vec_id",
               q_vec_col: str | None = None,
               q_id_col: str | None = None,
               exclude_self: bool = True,
               dim: int | None = None,
               method: str = "exact",
               index_path: str | None = None,
               n_probe: int = 4) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): per query, greedily select ``k`` of the top-``pool``
    cosine candidates trading relevance against redundancy —
    ``score_t(c) = λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`` —
    the standard diversification pass for RAG context assembly and
    diverse few-shot / training-subset selection (a near-dup-heavy
    corpus otherwise fills all k slots with copies).

    Returns ``(qid, nbr_id, mmr_rank, mmr_score)`` — rank 1 is the
    pure-relevance argmax (its score = rel, round-6); later ranks
    carry the penalized score at selection time. Relevances and
    pairwise similarities round to 6 decimals; the penalized score
    then computes in EXACT INTEGER nano-units
    (``lam_mill·ci − (1000−lam_mill)·pi`` over micro-unit ints — λ
    must be a multiple of 0.001) and every argmax orders on that
    integer (ties → ascending id), so the selection is deterministic
    and oracle-reproducible: the greedy loop unrolls into k SQL
    layers (see the registry's generated oracle) because each step is
    a plain argmax over bounded relations — an ITERATIVE algorithm
    with a full value-hash oracle.

    Scale shape: the corpus-sized work is the candidate retrieval
    (``knn_join``, see its strategy notes). Everything after is
    bounded by construction: candidates are |Q|·pool rows, pairwise
    sims |Q|·pool² (pool defaults to 20 → 400 rows/query), and each
    of the k−1 greedy steps is a keyed argmax over those bounded
    relations — no data-sized shuffle, no driver loop over rows (the
    loop builds the PLAN, k is small). Candidate vectors join the
    pool by id, so the wide arrays never enter the iteration."""
    from . import similarity as _sim
    if k > pool:
        raise ValueError(f"mmr_rerank: k={k} > pool={pool}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"mmr_rerank: lambda must be in [0,1], "
                         f"got {lam}")
    if index_path is not None:
        # r10: query-many composition — candidates come from the
        # PERSISTED IVF index (partition-pruned read, ~n_probe/
        # n_cells of the corpus bytes instead of the full blas
        # scan), and the kernel emits each neighbor's vector
        # alongside, so the pool's pairwise-similarity stage needs
        # NO second corpus scan and no unprunable id join. Same
        # greedy loop below, byte-identical given the same pool.
        dim = dim or int(_sim._ivf_load_meta(index_path,
                                             verify=False)["dim"])
        cand_v = _sim.knn_join_ivf_index(
            queries.sparkSession, index_path, queries, k=pool,
            n_probe=n_probe, q_vec_col=q_vec_col or vec_col,
            q_id_col=q_id_col or id_col, exclude_self=exclude_self,
            return_vecs=True)
        cand = cand_v.select("qid", "nbr_id", "cos")
        cv = (cand_v.withColumn("_n", _sim.norm_expr("_v", dim))
              .select("qid", "nbr_id", "cos", "_v", "_n"))
    else:
        if corpus is None:
            raise ValueError("mmr_rerank: corpus is required unless "
                             "index_path is given")
        dim = dim or _sim.probe_dim(corpus, vec_col)
        cand = _sim.knn_join(corpus, queries, k=pool, vec_col=vec_col,
                             id_col=id_col, q_vec_col=q_vec_col,
                             q_id_col=q_id_col,
                             exclude_self=exclude_self,
                             dim=dim, method=method)
        vecs = corpus.select(
            F.col(id_col).alias("nbr_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
            .alias("_v")).withColumn("_n", _sim.norm_expr("_v", dim))
        cv = cand.join(vecs, on="nbr_id").select("qid", "nbr_id",
                                                 "cos", "_v", "_n")
    a = cv.select("qid", F.col("nbr_id").alias("_a"),
                  F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = cv.select("qid", F.col("nbr_id").alias("_b"),
                  F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    sims = (a.join(b, on="qid")
            .filter(F.col("_a") != F.col("_b"))
            .select("qid", "_a", "_b",
                    F.round(_sim.cosine_with_norms("_va", "_vb",
                                                   "_na", "_nb", dim),
                            6).alias("_sim")))
    # cand/sims are consumed by every one of the k−1 greedy steps —
    # without a checkpoint each step RE-RUNS the upstream kNN (the
    # corpus-sized part) through its growing lineage: measured 72 s
    # vs 9 s at sf1 (20k vectors, k=5). Both are bounded (|Q|·pool
    # and |Q|·pool² rows), so materializing them is cheap and cuts
    # the lineage the loop would otherwise replay.
    cand = cand.localCheckpoint()
    sims = sims.localCheckpoint()
    # λ in exact per-mille so the penalized score computes in INTEGER
    # nano-units: cos/pen are round-6 values, so λ·cos − (1−λ)·pen
    # always lands within a digit of a decimal ROUNDING BOUNDARY —
    # re-rounding that in binary doubles is engine-dependent (Spark's
    # exact-decimal HALF_UP vs DuckDB's float-multiply round disagreed
    # on a real sf0.01 row). `lam_mill·ci − (1000−lam_mill)·pi` over
    # micro-unit ints is exact, ordered exactly, and divides back to
    # the identical double on every engine.
    lam_mill = int(round(float(lam) * 1000))
    if abs(float(lam) * 1000 - lam_mill) > 1e-9:
        raise ValueError(f"mmr_rerank: lambda must be a multiple of "
                         f"0.001 (exact integer scoring), got {lam}")
    w1 = Window.partitionBy("qid").orderBy(F.desc("cos"),
                                           F.asc("nbr_id"))
    selected = (cand.withColumn("_rn", F.row_number().over(w1))
                .filter(F.col("_rn") == 1)
                .select("qid", "nbr_id",
                        F.lit(1).alias("mmr_rank"),
                        F.col("cos").alias("mmr_score")))
    for t in range(2, int(k) + 1):
        sel_ids = selected.select("qid", F.col("nbr_id").alias("_b"))
        pen = (sims.join(sel_ids, on=["qid", "_b"])
               .groupBy("qid", "_a").agg(F.max("_sim").alias("_pen")))
        remaining = cand.join(selected.select("qid", "nbr_id"),
                              on=["qid", "nbr_id"], how="left_anti")
        ci = F.round(F.col("cos") * 1e6, 0).cast("long")
        pi = F.round(F.col("_pen") * 1e6, 0).cast("long")
        si = (F.lit(lam_mill) * ci
              - F.lit(1000 - lam_mill) * pi)
        scored = (remaining
                  .join(pen, (remaining["qid"] == pen["qid"])
                        & (remaining["nbr_id"] == pen["_a"]))
                  .select(remaining["qid"], "nbr_id", "cos", "_pen")
                  .withColumn("_si", si))
        ws = Window.partitionBy("qid").orderBy(F.desc("_si"),
                                               F.asc("nbr_id"))
        pick = (scored.withColumn("_rn", F.row_number().over(ws))
                .filter(F.col("_rn") == 1)
                .select("qid", "nbr_id",
                        F.lit(t).alias("mmr_rank"),
                        (F.col("_si").cast("double") / F.lit(1.0e9))
                        .alias("mmr_score")))
        # selected feeds both the next step's penalty and its
        # anti-join — un-checkpointed, step t replays every earlier
        # step's windows (depth-squared recompute over the loop)
        selected = selected.unionByName(pick).localCheckpoint()
    return selected
