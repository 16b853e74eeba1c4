"""Shared registry of training-data-pipeline operators.

One source of truth for the name → callable(df, *params) table used
by BOTH the engine executor (`B = STREAM A THROUGH <op>(args);`,
executor._register_datapipe_ops) and generated standalone code
(`PigEngine.to_code` emits `datapipe_ops()[name](df, …)` — the
datapipe analogue of the reference linking its backend library jar
from generated programs, sparklib/… UDF jars).

Params arrive as Pig literals (strings/numbers); each entry coerces
them itself, so the same callable serves script text and Python
callers.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import functions as F


def _sim():
    from . import similarity
    return similarity


def _mmod():
    from . import multimodal
    return multimodal


def _pk():
    from . import pack
    return pack


def _ev():
    from . import events
    return events


def _ret():
    from . import retrieval
    return retrieval


def _gr():
    from . import graph
    return graph


def _parse_vec(qv) -> list[float]:
    """Query vector from a STREAM THROUGH string param:
    '0.1, 0.2, -3e-2' → [0.1, 0.2, -0.03]."""
    if isinstance(qv, (list, tuple)):
        return [float(x) for x in qv]
    return [float(x) for x in str(qv).replace(";", ",").split(",")
            if x.strip()]


def _parse_rates(spec) -> dict[str, float]:
    """Mixture-rate map from a STREAM THROUGH string param:
    'src0:0.5,src1:1.0' → {'src0': 0.5, 'src1': 1.0}."""
    if isinstance(spec, dict):
        return {str(k): float(v) for k, v in spec.items()}
    out: dict[str, float] = {}
    for part in str(spec).replace(";", ",").split(","):
        if not part.strip():
            continue
        k, _, v = part.partition(":")
        out[k.strip()] = float(v)
    return out


def datapipe_ops() -> dict[str, Callable]:
    """Fresh name → callable table (lazy submodule imports keep
    engine startup light)."""
    from . import dedup as dp
    from . import text as dt

    return {
        "doc_stats": lambda df, text="text", idc="doc_id":
            dt.doc_stats(df, str(text), str(idc)),
        "exact_dedup": lambda df, text="text", idc="doc_id":
            dp.exact_dedup(df, str(text), str(idc)),
        "minhash_pairs": lambda df, thr=0.5, text="text", idc="doc_id":
            dp.minhash_lsh_pairs(df, str(text), str(idc),
                                 threshold=float(thr)),
        "simhash": lambda df, text="text", idc="doc_id":
            dp.simhash(df, str(text), str(idc)),
        "simhash_pairs": lambda df, maxham=8, text="text", idc="doc_id":
            dp.simhash_pairs(df, str(text), str(idc),
                             max_hamming=int(maxham)),
        "ngram_jaccard_pairs": lambda df, thr=0.5, text="text",
            idc="doc_id": dp.ngram_jaccard_pairs(
                df, str(text), str(idc), threshold=float(thr)),
        "embedding_neardup": lambda df, thr=0.95, vec="embedding",
            idc="vec_id": dp.embedding_neardup_pairs(
                df, str(vec), str(idc), threshold=float(thr)),
        # SemDeDup (r04): k-means + within-cluster cosine groups,
        # keep the lowest-centroid-cosine member per group.
        # k defaults to the paper's sqrt(n) auto-sizing — a fixed
        # small k at corpus scale would oversize every cluster.
        "semantic_dedup": lambda df, thr=0.9, k=None, vec="embedding",
            idc="vec_id": dp.semantic_dedup(
                df, str(vec), str(idc), threshold=float(thr),
                n_clusters=None if k is None else int(k)),
        # benchmark = rows of the same relation whose `src_col`
        # column equals the first argument
        "contamination": lambda df, src="src0", k=5, text="text",
            idc="doc_id", src_col="source":
            dp.contamination_scores(
                df.filter(F.col(str(src_col)) != str(src)),
                df.filter(F.col(str(src_col)) == str(src)),
                str(text), str(idc), k=int(k)),
        # Bloom-bitmap variant: benchmark compressed to an m-bit
        # filter, corpus pass is map-only (same split convention)
        "bloom_decon": lambda df, src="src0", k=5, m=1048576, h=3,
            text="text", idc="doc_id", src_col="source":
            dp.bloom_decontaminate(
                df.filter(F.col(str(src_col)) != str(src)),
                df.filter(F.col(str(src_col)) == str(src)),
                str(text), str(idc), k=int(k), m_bits=int(m),
                n_hashes=int(h)),
        # gap-based sessionization over event streams (r07d)
        "sessionize": lambda df, gap=1800, user="user_id", ts="ts",
            idc="event_id": _ev().sessionize(
                df, str(user), str(ts), gap_sec=int(gap),
                id_col=str(idc)),
        "session_stats": lambda df, gap=1800, user="user_id", ts="ts",
            idc="event_id": (
                _ev().session_stats_stream(df, str(user), str(ts),
                                           gap_sec=int(gap))
                if df.isStreaming else
                _ev().session_stats(df, str(user), str(ts),
                                    gap_sec=int(gap), id_col=str(idc))),
        # first-seen near-dup detection (r07d): streaming input ->
        # applyInPandasWithState LSH; batch input -> the oracled twin
        "neardup_ingest": lambda df, thr=0.5, nh=32, bands=8, k=3,
            text="text", idc="doc_id": dp.streaming_neardup_pairs(
                df, str(text), str(idc), threshold=float(thr),
                num_hashes=int(nh), bands=int(bands),
                shingle_k=int(k)),
        # similarity search (r03): the query vector is a quoted
        # comma-separated string of floats, e.g.
        # `STREAM E THROUGH cosine_topk('0.1,0.2,…', 10)`
        "cosine_topk": lambda df, qv, k=10, vec="embedding",
            idc="vec_id": _sim().cosine_topk(
                df, _parse_vec(qv), k=int(k),
                vec_col=str(vec), id_col=str(idc)),
        "ann_lsh_topk": lambda df, qv, k=10, vec="embedding",
            idc="vec_id": _sim().ann_lsh_topk(
                df, _parse_vec(qv), k=int(k),
                vec_col=str(vec), id_col=str(idc)),
        "ivf_topk": lambda df, qv, k=10, vec="embedding",
            idc="vec_id": _sim().ivf_topk(
                df, _parse_vec(qv), k=int(k),
                vec_col=str(vec), id_col=str(idc)),
        # multimodal (r03): binary-column decode / frame-sample /
        # resize from scripts
        "decode_images": lambda df, dim=8, fake=0, binc="payload",
            idc="doc_id": _mmod().decode_images(
                df, str(binc), str(idc), dim=int(dim),
                deterministic_fake=bool(int(fake))),
        "sample_audio_frames": lambda df, n=4, fake=0,
            binc="payload", idc="doc_id": _mmod().sample_audio_frames(
                df, str(binc), str(idc), n_frames=int(n),
                deterministic_fake=bool(int(fake))),
        "resize_images": lambda df, w=32, h=32, binc="payload",
            idc="doc_id": _mmod().resize_images(
                df, str(binc), str(idc), out_w=int(w), out_h=int(h)),
        # winnowing rolling-hash fingerprints (r03)
        "winnow_fingerprints": lambda df, k=5, w=4, text="text",
            idc="doc_id": dt.winnow_fingerprints(
                df, str(text), str(idc), k=int(k), w=int(w)),
        # PII hygiene + within-doc repetition filters (r03)
        "pii_scrub": lambda df, text="text":
            dt.pii_scrub(df, str(text)),
        "pii_stats": lambda df, text="text", idc="doc_id":
            dt.pii_stats(df, str(text), str(idc)),
        "repetition_stats": lambda df, text="text", idc="doc_id":
            dt.repetition_stats(df, str(text), str(idc)),
        # r10: composable C4/Gopher quality filter with a complete
        # per-doc audit / corpus-level per-rule report
        "quality_filter": lambda df, text="text", idc="doc_id":
            dt.quality_filter_chain(df, str(text), str(idc)),
        "quality_filter_report": lambda df, text="text", idc="doc_id":
            dt.quality_filter_report(df, str(text), str(idc)),
        "gopher_repetition_ok": lambda df, text="text", idc="doc_id":
            dt.gopher_repetition_ok(df, str(text), str(idc)),
        # MassiveText/Gopher-style cross-document duplicate-line
        # hygiene (r02)
        "line_dedup_stats": lambda df, gran="line", text="text",
            idc="doc_id": dp.line_dedup_stats(
                df, str(text), str(idc), granularity=str(gran)),
        "strip_dup_lines": lambda df, gran="line", text="text",
            idc="doc_id": dp.strip_dup_lines(
                df, dp.line_dedup_stats(df, str(text), str(idc),
                                        granularity=str(gran)),
                str(text), str(idc), granularity=str(gran)),
        # training-set assembly (r05, datapipe/pack.py): sequence
        # packing, deterministic corpus mixing, DSIR weights
        "chunk_pack": lambda df, seqlen=2048, text="text",
            idc="doc_id": _pk().chunk_pack(
                df, str(text), str(idc), seq_len=int(seqlen)),
        # rates is 'src0:0.5,src1:1.0'; unnamed sources keep with
        # `default`
        "mixture_sample": lambda df, rates, seed=42, default=0.0,
            src="source", idc="doc_id": _pk().mixture_sample(
                df, _parse_rates(rates), str(src), str(idc),
                seed=int(seed), default_rate=float(default)),
        # target = rows whose `src_col` equals the first argument
        # (same convention as `contamination`)
        "dsir_weights": lambda df, tgt="src0", nb=4096, text="text",
            idc="doc_id", src_col="source": _pk().dsir_weights(
                df.filter(F.col(str(src_col)) != str(tgt)),
                df.filter(F.col(str(src_col)) == str(tgt)),
                str(text), str(idc), n_buckets=int(nb)),
        # web-corpus hygiene: at most n docs per domain/source
        "cap_per_group": lambda df, n=1000, grp="source",
            idc="doc_id": dp.cap_per_group(
                df, str(grp), str(idc), n=int(n)),
        "mixture_repeat": lambda df, rates, seed=42, default=1.0,
            src="source", idc="doc_id": _pk().mixture_repeat(
                df, _parse_rates(rates), str(src), str(idc),
                seed=int(seed), default_rate=float(default)),
        # RAG-style overlapping token-window chunking (map-only)
        "chunk_text": lambda df, size=128, overlap=16, text="text",
            idc="doc_id": dt.chunk_text(
                df, str(text), str(idc), size=int(size),
                overlap=int(overlap)),
        "dsir_resample": lambda df, tgt="src0", frac=0.1, nb=4096,
            seed=42, meth="gumbel", text="text", idc="doc_id",
            src_col="source": _pk().dsir_resample(
                df.filter(F.col(str(src_col)) != str(tgt)),
                df.filter(F.col(str(src_col)) == str(tgt)),
                str(text), str(idc), n_buckets=int(nb),
                frac=float(frac), seed=int(seed), method=str(meth)),
        # per-doc top-k TF-IDF keyword extraction (r07)
        # zlib quality signal (mapInPandas; not SQL-expressible)
        "compression_ratio": lambda df, level=6, text="text",
            idc="doc_id": dt.compression_ratio(
                df, str(text), str(idc), level=int(level)),
        # per-group corpus card (datasheet stats)
        "corpus_report": lambda df, grp="source", text="text",
            lang="lang", idc="doc_id": dt.corpus_report(
                df, str(grp), str(text), str(lang), str(idc)),
        "tfidf_top_terms": lambda df, k=5, text="text",
            idc="doc_id": dt.tfidf_top_terms(
                df, str(text), str(idc), k=int(k)),
        # CCNet-style bigram-LM perplexity scoring (r07): the
        # reference corpus is the rows whose `ref_col` equals the
        # first argument (same convention as `contamination`)
        "lm_perplexity": lambda df, ref="en", alpha=0.4, text="text",
            idc="doc_id", ref_col="lang": dt.lm_perplexity(
                df, df.filter(F.col(str(ref_col)) == str(ref)),
                str(text), str(idc), alpha=float(alpha)),
        # ExactSubstr-proxy cross-document duplicate-span stats (r07)
        "duplicate_spans": lambda df, k=5, text="text",
            idc="doc_id": dt.duplicate_spans(
                df, str(text), str(idc), k=int(k)),
        # incremental-ingest near-dup pairs (r07): NEW side = rows
        # whose `src_col` equals the first argument, corpus = rest
        # (split-of-self convention, like `contamination`)
        "minhash_cross": lambda df, src="src0", thr=0.5, text="text",
            idc="doc_id", src_col="source": dp.minhash_lsh_pairs_cross(
                df.filter(F.col(str(src_col)) == str(src)),
                df.filter(F.col(str(src_col)) != str(src)),
                str(text), str(idc), threshold=float(thr)),
        # r10: the same ingest served from a PERSISTED LSH index
        # (dedup.lsh_write_index) — batch or stream input; streaming
        # runs as a stateless stream-static join against the index
        "minhash_cross_index": lambda df, path, thr=0.5, text="text",
            idc="doc_id": dp.minhash_cross_index_stream(
                df.sparkSession, str(path), df, str(text), str(idc),
                threshold=float(thr)),
        # deterministic train/val/test assignment (r07): weights as
        # 'train:0.9,val:0.05,test:0.05'
        "split_assign": lambda df, weights="", seed=42, idc="doc_id",
            col="split": _pk().split_assign(
                df, _parse_rates(weights) if weights else None,
                str(idc), seed=int(seed), split_col=str(col)),
        # r10: token-budget mixture sampling — quota in TOKENS per
        # group (flat int budget via the DSL; dict budgets from the
        # Python API)
        "token_budget_sample": lambda df, budget, grp="source",
            text="text", idc="doc_id", seed=42:
            _pk().token_budget_sample(
                df, int(budget), str(grp), str(text), str(idc),
                seed=int(seed)),
        # rank-based quality gate (r07): keep the best frac by a
        # score column; asc=1 keeps the smallest (perplexity-style)
        "take_top_frac": lambda df, by, frac=0.5, asc=0,
            idc="doc_id": _pk().take_top_frac(
                df, str(by), float(frac), str(idc),
                ascending=bool(int(asc))),
        # deterministic global shuffle (r07): reproducible
        # pseudo-random corpus order before packing/sharding
        "global_shuffle": lambda df, seed=42, idc="doc_id",
            pos="shuffle_pos": _pk().global_shuffle(
                df, str(idc), seed=int(seed), pos_col=str(pos)),
        # batch kNN join (r07): queries = rows whose id ≡ 0 mod the
        # first argument (split-of-self convention, like
        # `contamination`); meth ∈ exact|blas|lsh
        "knn_join": lambda df, qmod=100, k=5, meth="exact",
            vec="embedding", idc="vec_id": _sim().knn_join(
                df, df.filter(F.col(str(idc)) % int(qmod) == 0),
                k=int(k), method=str(meth), vec_col=str(vec),
                id_col=str(idc)),
        # hard-negative mining (r08): knn_join restricted to a cosine
        # band [lo, hi) — similar-but-not-duplicate contrastive
        # negatives per query (split-of-self convention)
        "hard_negatives": lambda df, lo=0.15, hi=0.30, qmod=100, k=5,
            meth="exact", vec="embedding", idc="vec_id": _sim().knn_join(
                df, df.filter(F.col(str(idc)) % int(qmod) == 0),
                k=int(k), method=str(meth), vec_col=str(vec),
                id_col=str(idc), band=(float(lo), float(hi))),
        # BM25 top-k lexical retrieval (r08): query literals as
        # 'q1|q2|...' — ids are 1-based positions
        "bm25": lambda df, queries, k=10, text="text",
            idc="doc_id": dt.bm25_topk(
                df, [(i + 1, q) for i, q in
                     enumerate(str(queries).split("|"))],
                str(text), str(idc), k=int(k)),
        # r08f curation additions
        "funnel": lambda df, steps="view,click,purchase",
            user="user_id", ts="ts", typ="event_type",
            idc="event_id": _ev().funnel_stream(
                df, [s.strip() for s in str(steps).split(",")],
                str(user), str(ts), str(typ), str(idc)),
        "latest_by_key": lambda df, key="user_id", ts="ts",
            tb="event_id": _ev().latest_by_key(
                df, str(key), str(ts), str(tb)),
        "token_entropy": lambda df, text="text", idc="doc_id":
            dt.token_entropy(df, str(text), str(idc)),
        "vocab_coverage": lambda df, n=1000, text="text",
            idc="doc_id": dt.vocab_coverage(
                df, int(n), str(text), str(idc)),
        "quantize_embeddings": lambda df, vec="embedding",
            idc="vec_id": _sim().quantize_embeddings(
                df, str(vec), str(idc)),
        "stratified_sample": lambda df, n, grp="source",
            idc="doc_id", seed=42: _pk().stratified_sample_n(
                df, int(n), str(grp), str(idc), int(seed)),
        # MMR diversification (split-of-self convention like knn_join)
        "mmr": lambda df, qmod=100, k=5, pool=20, lam=0.7,
            vec="embedding", idc="vec_id": _ret().mmr_rerank(
                df, df.filter(F.col(str(idc)) % int(qmod) == 0),
                k=int(k), pool=int(pool), lam=float(lam),
                vec_col=str(vec), id_col=str(idc)),
        # per-window trending top-k keys (batch form)
        "trending_keys": lambda df, k=3, win=3600, key="event_type",
            ts="ts": _ev().trending_keys(df, str(key), str(ts),
                                         int(win), int(k)),
        # fixed-iteration PageRank over an edge-list relation
        "pagerank": lambda df, iters=3, damping=0.85, src="src",
            dst="dst": _gr().pagerank(df, int(iters), float(damping),
                                      str(src), str(dst)),
    }
