"""Property-based tests (hypothesis): engine semantics vs brute-force
python references on randomized inputs. The reference repo has no
property tests (SURVEY.md §5.3) — this is added rigor."""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from piglet_spark.datapipe import dedup, text

WORDS = ["spark", "data", "row", "table", "scan", "join", "agg", "key",
         "fast", "slow", "batch", "stream"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12)
    .map(" ".join),
    min_size=1, max_size=8,
)

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=[HealthCheck.too_slow])


def brute_ngrams(toks: list[str], n: int) -> list[str]:
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


@given(docs_strategy)
@SETTINGS
def test_ngrams_match_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {r["doc_id"]: list(r["g"]) for r in df.select(
        "doc_id",
        text.ngrams(F.split(F.col("text"), " "), 3).alias("g")).collect()}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        expected = brute_ngrams(toks, 3) if len(toks) >= 3 else []
        assert got[i] == expected


@given(st.lists(st.text(
    alphabet=st.characters(codec="ascii"), max_size=60),
    min_size=1, max_size=8))
@SETTINGS
def test_text_ngrams_matches_zip_with_formulation(spark, texts):
    """The regex fast path must agree with the generic array
    formulation on any normalized text, including empty/short docs."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    norm = text.normalize_text(F.col("text"))
    rows = df.select(
        text.ngrams(F.split(norm, " "), 3).alias("a"),
        text.text_ngrams(norm, 3).alias("b")).collect()
    for r in rows:
        assert list(r["a"] or []) == list(r["b"] or [])


def test_text_ngrams_empty_text_yields_no_grams(spark):
    """Intentional: empty/punctuation-only text has NO n-grams for any
    n (the pre-regex formulation emitted a single empty-string 1-gram
    for n=1 via split('')==[''] — that was an artifact, not a gram)."""
    df = spark.createDataFrame([("",), ("!!!",), ("ok",)], ["text"])
    rows = df.select(
        *[text.text_ngrams(text.normalize_text(F.col("text")), n)
          .alias(f"g{n}") for n in (1, 2, 3)]).collect()
    assert [list(r["g1"]) for r in rows] == [[], [], ["ok"]]
    assert all(list(r["g2"]) == [] and list(r["g3"]) == [] for r in rows)


@given(docs_strategy)
@SETTINGS
def test_exact_dedup_partitions_docs(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    out = dedup.exact_dedup(df).collect()
    # every doc accounted for exactly once, keep_id is the min of its class
    norm = {}
    for i, t in enumerate(texts):
        key = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
        norm.setdefault(key, []).append(i)
    assert sorted(r["keep_id"] for r in out) == sorted(
        min(v) for v in norm.values())
    assert sum(r["n_copies"] for r in out) == len(texts)


def brute_simhash(t: str) -> int:
    """Python reference for datapipe.dedup.simhash: 60-bit md5-prefix
    token hashes, per-bit ±1 sums, sign fold."""
    import hashlib
    norm = re.sub(r" +", " ",
                  re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
    counts = [0] * 60
    for tok in norm.split(" "):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        for b in range(60):
            counts[b] += 1 if (h >> b) & 1 else -1
    return sum((1 << b) for b in range(60) if counts[b] > 0)


@given(docs_strategy)
@SETTINGS
def test_simhash_matches_brute_force(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == brute_simhash(t), t


@given(docs_strategy)
@SETTINGS
def test_jaccard_pairs_exact(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(df, k=2, threshold=0.01)
           .collect()}

    def shingles(t):
        toks = [w for w in t.lower().split() if w]
        return set(brute_ngrams(toks, 2))
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = shingles(texts[a]), shingles(texts[b])
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.01:
                assert (a, b) in got
                assert abs(got[(a, b)] - round(j, 6)) < 1e-6


@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=30))
@SETTINGS
def test_median_upper_semantics(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    import piglet_spark as pg
    eng = pg.PigEngine(spark)
    eng.executor.env["A"] = df
    eng.run("G = GROUP A ALL; M = FOREACH G GENERATE MEDIAN(A.v) AS m;")
    got = eng.df("M").collect()[0]["m"]
    expected = sorted(values)[len(values) // 2]  # upper median
    assert got == expected


@given(st.lists(st.tuples(st.integers(0, 1000),
                          st.one_of(st.none(), st.integers(-100, 100))),
                min_size=1, max_size=30))
@SETTINGS
def test_split_otherwise_partitions_input(spark, rows):
    """SPLIT with disjoint IF branches + OTHERWISE partitions the
    input exactly: every row lands in precisely one output (null
    conditions route to OTHERWISE, Pig semantics)."""
    import piglet_spark as pg
    df = spark.createDataFrame([(i, v) for i, (_, v) in enumerate(rows)],
                               "id int, v int")
    df.createOrReplaceTempView("prop_split_in")
    eng = pg.PigEngine(spark)
    eng.run("""
A = SQL 'SELECT * FROM prop_split_in';
SPLIT A INTO P IF v > 0, Z IF v == 0, N OTHERWISE;
""")
    p = {r["id"] for r in eng.df("P").collect()}
    z = {r["id"] for r in eng.df("Z").collect()}
    n = {r["id"] for r in eng.df("N").collect()}
    allids = {i for i in range(len(rows))}
    assert p | z | n == allids
    assert not (p & z) and not (p & n) and not (z & n)
    vals = {i: v for i, (_, v) in enumerate(rows)}
    assert p == {i for i, v in vals.items() if v is not None and v > 0}
    assert z == {i for i, v in vals.items() if v == 0 and v is not None}
    assert n == {i for i, v in vals.items() if v is None or v < 0}


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=60))
@settings(max_examples=25, deadline=None)
def test_driver_union_find_matches_bfs(spark, edges):
    """Property: _driver_union_find labels every vertex with the
    minimum id of its connected component (BFS ground truth)."""
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    from piglet_spark.datapipe.dedup import _driver_union_find
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["v"]: r["l"] for r in _driver_union_find(spark, pairs).collect()}
    # BFS ground truth
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, truth = set(), {}
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        lab = min(comp)
        for v in comp:
            truth[v] = lab
    assert got == truth


@given(st.lists(st.sampled_from(
    WORDS + ["a@b.io", "192.168.0.1", "123-45-6789", "555-123-4567",
             "+4915112345678", "4111 1111 1111 1111"]),
    min_size=0, max_size=20).map(" ".join))
@settings(max_examples=30, deadline=None)
def test_pii_scrub_idempotent(spark, doc):
    """Property: scrubbing is idempotent — placeholders never match a
    PII pattern themselves (a scrub that re-triggers on its own output
    would corrupt text on repeated pipeline passes)."""
    df = spark.createDataFrame([(0, doc)], ["doc_id", "text"])
    once = text.pii_scrub(df).collect()[0]["text"]
    df2 = spark.createDataFrame([(0, once)], ["doc_id", "text"])
    twice = text.pii_scrub(df2).collect()[0]["text"]
    assert once == twice
    for frag in ("@", "123-45-6789", "4111"):
        assert frag not in once or frag == "@" and "<EMAIL>" not in doc


@given(docs_strategy,
       st.integers(min_value=2, max_value=6),
       st.integers(min_value=0, max_value=4))
@SETTINGS
def test_chunk_text_invariants(spark, texts, size, overlap):
    """chunk_text properties on random corpora: every token covered
    exactly once by stride-prefixes + last chunk; chunk count formula;
    no chunk exceeds `size` tokens; empty docs yield nothing."""
    if overlap >= size:
        return
    stride = size - overlap
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = {}
    for r in text.chunk_text(df, size=size, overlap=overlap).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"]))
    for i, t in enumerate(texts):
        toks = t.split()
        chunks = sorted(out.get(i, []))
        if not toks:
            assert chunks == []
            continue
        n_exp = max(1, -(-(len(toks) - overlap) // stride))
        assert [c[0] for c in chunks] == list(range(n_exp))
        assert all(c[1] <= size for c in chunks)
        rebuilt = [w for c in chunks[:-1] for w in c[2].split()[:stride]]
        rebuilt += chunks[-1][2].split()
        assert rebuilt == toks


@given(docs_strategy, st.integers(min_value=1, max_value=16))
@SETTINGS
def test_chunk_pack_prefix_sum_invariant(spark, texts, seq_len):
    """chunk_pack properties: start offsets are the prefix sum of
    token counts in id order; chunk spans are consistent with
    seq_len; empty docs span zero chunks."""
    from piglet_spark.datapipe import pack
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in
            pack.chunk_pack(df, seq_len=seq_len).collect()}
    off = 0
    for i, t in enumerate(texts):
        n = len(t.split())
        r = rows[i]
        assert r["n_tokens"] == n
        assert r["start_tok"] == off
        assert r["first_chunk"] == off // seq_len
        assert r["chunk_offset"] == off % seq_len
        if n:
            assert r["last_chunk"] == (off + n - 1) // seq_len
            assert r["last_chunk"] >= r["first_chunk"]
        else:
            assert r["last_chunk"] == r["first_chunk"]
        off += n


@given(st.lists(st.tuples(st.integers(0, 500),
                          st.one_of(st.none(),
                                    st.floats(-100, 100, width=32))),
                min_size=1, max_size=40, unique_by=lambda t: t[0]),
       st.floats(0.0, 1.0))
@SETTINGS
def test_take_top_frac_properties(spark, rows, frac):
    """Invariants for any input and fraction: exactly
    ceil(frac · n_rows) rows kept; every kept score (round-6,
    nulls worst) >= every dropped score; columns preserved."""
    import math as m
    from piglet_spark.datapipe import pack
    df = spark.createDataFrame(rows, "doc_id int, s float")
    out = pack.take_top_frac(df, "s", frac).collect()
    n = len(rows)
    assert len(out) == m.ceil(frac * n)
    kept = {r["doc_id"] for r in out}

    def key(t):
        did, s = t
        rs = round(float(s), 6) if s is not None else None
        # null worst, then score desc, then id asc
        return (rs is None, -(rs if rs is not None else 0), did)

    expect = {d for d, _ in sorted(rows, key=key)[:m.ceil(frac * n)]}
    assert kept == expect


@given(st.lists(st.integers(0, 10 ** 6), min_size=1, max_size=60,
                unique=True),
       st.integers(0, 99))
@SETTINGS
def test_global_shuffle_is_a_permutation(spark, ids, seed):
    """Any id set, any seed: positions are a dense 0-based
    permutation and equal the md5-rank reference."""
    import hashlib
    from piglet_spark.datapipe import pack
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r["shuffle_pos"]
           for r in pack.global_shuffle(df, seed=seed).collect()}
    ref = {d: i for i, d in enumerate(
        sorted(ids, key=lambda d: (hashlib.md5(
            f"{seed}:{d}".encode()).hexdigest(), d)))}
    assert got == ref


@given(st.lists(st.tuples(st.integers(0, 99),
                          st.sampled_from([0.5, 1.0, 2.0]),
                          st.sampled_from([[1.0, 0.0], [0.0, 1.0],
                                           [1.0, 1.0], [0.5, -0.5]])),
                min_size=2, max_size=25, unique_by=lambda t: t[0]),
       st.integers(1, 4))
@SETTINGS
def test_knn_join_exact_ties(spark, rows, k):
    """Tie-heavy corpora (scaled copies of a few directions → EXACTLY
    equal cosines) must resolve identically to the brute-force
    reference: round-6 score desc, then neighbor id asc."""
    import math as m
    from piglet_spark.datapipe import similarity
    data = [(i, [x * s for x in v]) for i, s, v in rows]
    df = spark.createDataFrame(data, "vec_id int, embedding array<double>")
    qs = df.limit(3)
    got = sorted((r["qid"], r["nbr_id"], r["cos"]) for r in
                 similarity.knn_join(df, qs, k=k,
                                     method="exact").collect())

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = m.sqrt(sum(x * x for x in a))
        nb = m.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    brute = []
    for qid, qv in [(r["vec_id"], r["embedding"])
                    for r in qs.collect()]:
        scored = sorted(
            ((-round(cos(v, qv), 6), i)
             for i, v in data if i != qid),
            )[:k]
        brute.extend((qid, i, -negc) for negc, i in scored)
    assert got == sorted(brute)


@given(st.sets(st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
     "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi"]),
    min_size=4, max_size=12),
       st.sets(st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
     "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi"]),
    min_size=4, max_size=12))
@SETTINGS
def test_minhash_estimator_tracks_jaccard(spark, s1, s2):
    """The minhash signature agreement must estimate the true shingle
    Jaccard within statistical bounds — the property the r07
    permutation-family fix restored (the degenerate (a·x+b) mod 2⁶¹-1
    family measured 9/32 agreement on a 0.8-Jaccard pair, 7σ off;
    this test fails on that family for high-overlap pairs)."""
    # build two docs whose 1-token "shingles" are exactly s1/s2
    t1, t2 = " ".join(sorted(s1)), " ".join(sorted(s2))
    df = spark.createDataFrame([(1, t1), (2, t2)], ["doc_id", "text"])
    sigs = {r["_id"]: r["_sig"] for r in
            dedup.minhash_signatures(df, shingle_k=1).collect()}
    agree = sum(1 for a, b in zip(sigs[1], sigs[2]) if a == b) / 32
    j = len(s1 & s2) / len(s1 | s2)
    # 32 hashes → σ = sqrt(J(1-J)/32) ≤ 0.089; allow 4σ + slack
    assert abs(agree - j) <= 0.40, (agree, j)


@given(st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.lists(st.sampled_from(WORDS), min_size=0,
                       max_size=30).map(" ".join)),
    min_size=1, max_size=12),
    st.integers(min_value=0, max_value=60))
@SETTINGS
def test_token_budget_sample_monotone_prefix(spark, rows, budget):
    """token_budget_sample invariants on random corpora: (1) raising
    the budget only ADDS documents (greedy-prefix monotonicity);
    (2) each group's selection is a PREFIX of its seeded hash order;
    (3) zero budget selects nothing."""
    from piglet_spark.datapipe import pack as dpp
    import hashlib
    df = spark.createDataFrame(
        [(i, g, t) for i, (g, t) in enumerate(rows)],
        ["doc_id", "source", "text"])
    small = {r.doc_id for r in
             dpp.token_budget_sample(df, budget, seed=3).collect()}
    big = {r.doc_id for r in
           dpp.token_budget_sample(df, budget + 17, seed=3).collect()}
    assert small <= big
    assert not {r.doc_id for r in
                dpp.token_budget_sample(df, 0, seed=3).collect()}
    order = {}
    for i, (g, _t) in enumerate(rows):
        order.setdefault(g, []).append(
            (hashlib.md5(f"3:{i}".encode()).hexdigest(), i))
    for g, lst in order.items():
        ids = [d for _, d in sorted(lst)]
        got = [d for d in ids if d in small]
        assert got == ids[:len(got)]  # a prefix, never a gap
