"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the baseline and the
  oracle-checkable path. Dot products via JVM higher-order functions
  (zip_with/aggregate); top-k is ORDER+LIMIT which Catalyst executes
  as TakeOrderedAndProject (per-partition heap + driver merge — no
  global sort shuffle, scales to any row count).
- ``ann_lsh_topk``: random-hyperplane LSH bucketing — the scale path:
  candidate set shrinks ~2^planes-fold; exact re-rank on candidates.
- ``ivf_topk``: IVF-style coarse quantization with deterministic
  centroid seeds: assign each vector to nearest of C seed rows
  (broadcast), probe the query's nearest cells only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import spread as _spread


def _lcg(seed: int):
    state = seed
    while True:
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        yield state


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim."""
    g = _lcg(seed)
    return [[(next(g) / float(1 << 63)) * 2.0 - 1.0 for _ in range(dim)]
            for _ in range(n_planes)]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_bucket(vec: Column, dim: int, n_planes: int,
                      seed: int = 7) -> Column:
    """Sign-pattern bucket id (0..2^n_planes-1) of a double vector."""
    planes = hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(x) for x in p]))
        bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("long")) \
                           .otherwise(F.lit(0).cast("long"))
    return bucket


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.
    Returns (id, cos) ordered by cos desc, id asc (deterministic ties)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col(vec_col))
    cos = F.round(cosine(v, q), 6)
    return (_spread(df).select(F.col(id_col), cos.alias("cos"))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k))


def ann_lsh_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 n_planes: int = 4, dim: int | None = None) -> DataFrame:
    """Approximate top-k: restrict to vectors whose hyperplane bucket
    is within hamming distance 1 of the query's bucket (multi-probe),
    then exact cosine re-rank. Bucketing is map-only; the filter
    prunes ~(1+n_planes)/2^n_planes of the data."""
    dim = dim if dim is not None else len(query_vec)
    planes = hyperplanes(dim, n_planes)
    qbits = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(p, query_vec)) > 0:
            qbits |= 1 << i
    probe = [qbits] + [qbits ^ (1 << i) for i in range(n_planes)]
    v = _as_double(F.col(vec_col))
    bucket = hyperplane_bucket(v, dim, n_planes)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = F.round(cosine(v, q), 6)
    return (_spread(df).select(F.col(id_col), bucket.alias("_b"), cos.alias("cos"))
            .filter(F.col("_b").isin(probe))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "cos"))


def ivf_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             n_cells: int = 16, n_probe: int = 4) -> DataFrame:
    """IVF-style ANN: centroids = the first n_cells rows by id
    (deterministic coarse quantizer, stands in for trained k-means —
    the Spark plumbing is identical). Assign rows to nearest centroid
    via a broadcast crossJoin + per-row argmin; probe the n_probe
    cells nearest the query."""
    cents = (df.orderBy(F.col(id_col).asc()).limit(n_cells)
             .select(F.col(id_col).alias("_cid"),
                     _as_double(F.col(vec_col)).alias("_cv")))
    rows = _spread(df).select(F.col(id_col),
                              _as_double(F.col(vec_col)).alias("_v"))
    scored = (rows.crossJoin(F.broadcast(cents))
              .withColumn("_d", cosine(F.col("_v"), F.col("_cv"))))
    from pyspark.sql.window import Window
    w = Window.partitionBy(id_col).orderBy(F.col("_d").desc(),
                                           F.col("_cid").asc())
    assigned = (scored.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") == 1)
                .select(id_col, "_v", "_cid"))
    # query's nearest cells (driver-side tiny computation)
    cent_rows = cents.collect()
    def cos_py(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb) if na and nb else 0.0
    best = sorted(cent_rows, key=lambda r: -cos_py(r["_cv"], query_vec))
    probe = [r["_cid"] for r in best[:n_probe]]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (assigned.filter(F.col("_cid").isin(probe))
            .select(F.col(id_col),
                    F.round(cosine(F.col("_v"), q), 6).alias("cos"))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k))
