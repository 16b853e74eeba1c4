"""Deterministic scale-up of the driver's testdata for scale experiments.

Replicates /root/testdata/sf0.1 K-fold with consistent key offsets so
every join relationship survives (customer<-orders<-lineitem->part/
supplier; nation/region stay fixed dimensions, exactly like TPC-H where
they are constant-size at every SF).

Workload-character preservation (the point of the experiment is that a
sf0.1 -> sf1 run measures the ENGINE's scaling, not a change in
instance hardness):

- documents: verbatim replication would make every doc a 10-way exact
  duplicate (dup density ~90%, a different and much harder dedup
  instance). Instead, replica i>0 mutates each word w to w+'qz'+i when
  md5(w, i) % 3 != 2 (rate 2/3). The map is per-(word, replica), so
  two similar docs inside a replica stay exactly as similar (same
  words -> same mutations), while cross-replica shingle survival is
  (1/3)^n per n-gram: 3.7% at n=3 (Jaccard ~0.019), 0.4% at n=5 --
  below the loosest threshold the query suite uses (ngram Jaccard
  0.1, MinHash 0.2, SimHash hamming<=16: word overlap 1/3 puts the
  expected hamming near 27/64). An earlier rate of 1/3 was measured
  to LEAK cross-replica pairs at those thresholds (3-gram survival
  30% -> Jaccard ~0.17-0.3 > 0.1): 144k of 194k sf1 ngram pairs were
  cross-replica artifacts. Net effect now: near-dup pair count scales
  linearly with K, as it would in a real corpus K times larger.
- embeddings: replica i>0 applies one random-orthogonal rotation Q_i
  (QR of a seeded Gaussian) to every vector. Rotation preserves all
  within-replica cosines EXACTLY and makes cross-replica cosines
  essentially random (E~0 at dim 64), so ANN/near-dup structure also
  scales linearly.
- events: user_id/event_id offset per replica; timestamps kept, so the
  stream covers the same wall-clock window at K x the event rate
  (= more keys, same per-key sequences; CEP matches scale linearly).

Usage: python tools/scaleup.py [--factor 10] [--base /root/testdata/sf0.1]
                               [--out /root/repo/.scaledata/sf1]
"""

from __future__ import annotations

import argparse
import hashlib
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Strides are >100x each table's max base key at sf0.1 (doc/vec/user
# keys ≤5k vs 1M strides; event ids ≤100k vs 10M) so replica key
# ranges never collide even at factor 1000 (the sf100 decade).
STRIDE = {
    "c_custkey": 1_000_000,
    "s_suppkey": 100_000,
    "p_partkey": 1_000_000,
    "o_orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def _replicated_sql(table: str, base: str, factor: int) -> str:
    """UNION ALL of K key-offset replicas of one parquet table."""
    src = f"'{base}/{table}.parquet'"
    offs = {
        "customer": [("c_custkey", STRIDE["c_custkey"])],
        "supplier": [("s_suppkey", STRIDE["s_suppkey"])],
        "part": [("p_partkey", STRIDE["p_partkey"])],
        "orders": [("o_orderkey", STRIDE["o_orderkey"]),
                   ("o_custkey", STRIDE["c_custkey"])],
        "lineitem": [("l_orderkey", STRIDE["o_orderkey"]),
                     ("l_partkey", STRIDE["p_partkey"]),
                     ("l_suppkey", STRIDE["s_suppkey"])],
        "events": [("event_id", STRIDE["event_id"]),
                   ("user_id", STRIDE["user_id"])],
    }[table]
    parts = []
    for i in range(factor):
        sel = ", ".join(
            f"({c} + {i * s}) AS {c}" if i else c for c, s in offs
        )
        others = "* EXCLUDE (" + ", ".join(c for c, _ in offs) + ")"
        parts.append(f"SELECT {sel}, {others} FROM {src}")
    return " UNION ALL ".join(parts)


def _mutate_word(word: str, i: int) -> str:
    # Suffix must be ALPHANUMERIC and attached: the dedup family
    # normalizes text with [^a-z0-9 ] -> ' ' (datapipe/text.py
    # normalize_text), so a '~i' suffix would split into two tokens —
    # resurrecting the original word AND injecting a corpus-wide
    # shared token 'i', which inflates within-replica n-gram overlap
    # (measured: 10.9M sf1 jaccard pairs vs 2.6k expected).
    h = hashlib.md5(f"{word}\x00{i}".encode()).digest()
    return f"{word}qz{i}" if h[0] % 3 != 2 else word


def scale_documents(base: str, out: str, factor: int) -> int:
    tbl = pq.read_table(f"{base}/documents.parquet")
    cols = {c: tbl.column(c).to_pylist() for c in tbl.column_names}
    n = tbl.num_rows
    out_cols = {c: list(v) for c, v in cols.items()}
    for i in range(1, factor):
        cache: dict[str, str] = {}
        for j in range(n):
            words = cols["text"][j].split(" ")
            muted = [cache.setdefault(w, _mutate_word(w, i)) for w in words]
            text = " ".join(muted)
            out_cols["doc_id"].append(cols["doc_id"][j] + i * STRIDE["doc_id"])
            out_cols["text"].append(text)
            out_cols["lang"].append(cols["lang"][j])
            out_cols["source"].append(cols["source"][j])
            out_cols["n_chars"].append(len(text))
    res = pa.table(
        {c: pa.array(out_cols[c], type=tbl.schema.field(c).type)
         for c in tbl.column_names})
    # pyarrow's default row_group_size is 1M ROWS — ~300 MB groups for
    # this table, so Spark gets ≤5 non-empty splits at factor 1000 and
    # map stages serialize on 5 cores (r08 finding). 256k rows ≈
    # 75 MB groups, the conventional parquet layout.
    pq.write_table(res, f"{out}/documents.parquet",
                   row_group_size=1 << 18)
    return res.num_rows


def scale_embeddings(base: str, out: str, factor: int) -> int:
    tbl = pq.read_table(f"{base}/embeddings.parquet")
    vec = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    labels = np.asarray(tbl.column("label").to_pylist(), dtype=np.int32)
    dim = vec.shape[1]
    all_vec, all_ids, all_lab = [vec], [ids], [labels]
    for i in range(1, factor):
        rng = np.random.default_rng(1000 + i)
        q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
        all_vec.append((vec @ q.astype(np.float32).T))
        all_ids.append(ids + i * STRIDE["vec_id"])
        all_lab.append(labels)
    res = pa.table({
        "vec_id": pa.array(np.concatenate(all_ids)),
        "embedding": pa.array(
            [list(map(float, row)) for row in np.concatenate(all_vec)],
            type=tbl.schema.field("embedding").type),
        "label": pa.array(np.concatenate(all_lab),
                          type=tbl.schema.field("label").type),
    })
    # 128k rows × ~550 B/row ≈ 70 MB row groups (default 1M rows was
    # a ~550 MB group: 2 non-empty Spark splits at factor 1000)
    pq.write_table(res, f"{out}/embeddings.parquet",
                   row_group_size=1 << 17)
    return res.num_rows


ALL_TABLES = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scaledata/sf1")
    ap.add_argument("--tables", default=",".join(ALL_TABLES),
                    help="comma subset — e.g. a targeted "
                         "documents,embeddings,events decade without "
                         "regenerating the 60M-row relational tables")
    args = ap.parse_args()
    tables = [t for t in args.tables.split(",") if t]
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    # a factor-1000 replication is a 1000-branch UNION ALL; DuckDB's
    # default expression-depth cap is 1000
    con.execute("SET max_expression_depth TO 100000")
    for t in ("region", "nation"):
        if t not in tables:
            continue
        con.execute(
            f"COPY (SELECT * FROM '{args.base}/{t}.parquet') TO "
            f"'{args.out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied (fixed dimension)", flush=True)
    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "events"):
        if t not in tables:
            continue
        sql = _replicated_sql(t, args.base, args.factor)
        con.execute(
            f"COPY ({sql}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(t, n, flush=True)
    if "documents" in tables:
        print("documents",
              scale_documents(args.base, args.out, args.factor),
              flush=True)
    if "embeddings" in tables:
        print("embeddings",
              scale_embeddings(args.base, args.out, args.factor),
              flush=True)


if __name__ == "__main__":
    main()
