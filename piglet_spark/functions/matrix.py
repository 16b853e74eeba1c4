"""Matrix data type — struct(rows, cols, idx, data) columns.

Reference: `[sd][di]matrix(rows, cols)` Breeze-backed type
(schema/ComplexTypes.scala:175-194, parser PigParser.scala:292-298,
Language.md "Matrix data types"). Dense spellings (`d?matrix`) store
the full column-major array with `idx = NULL`; sparse spellings
(`s?matrix`) store only nonzeros as parallel (idx, data) arrays —
COO with column-major linear indices, mirroring Breeze's
CSCMatrix-vs-DenseMatrix split, so a mostly-zero matrix costs
O(nnz) not O(rows*cols) per row at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def matrix_cons(elem_type: str, sparse: bool, rows, cols, *vals) -> Column:
    """`didmatrix(r, c, v...)` / `ddmatrix(r, c, {bag})` constructor.
    vals: either r*c scalars or a single array/bag column."""
    r = int(rows) if not isinstance(rows, Column) else rows
    c = int(cols) if not isinstance(cols, Column) else cols
    cast_t = "int" if elem_type == "int" else "double"
    if len(vals) == 1 and isinstance(vals[0], Column) \
            and not (isinstance(r, int) and isinstance(c, int)
                     and r * c == 1):
        # array column (bag constructors are unwrapped by the
        # compiler). A 1×1 matrix from a single SCALAR field is the
        # exception — F.transform over a non-array column raises, so
        # route it to the scalar branch (r05)
        data = F.transform(vals[0], lambda x: x.cast(cast_t))
    else:
        data = F.array(*[(v if isinstance(v, Column) else F.lit(v))
                         .cast(cast_t) for v in vals])
    if sparse:
        # keep nonzeros AND nulls (dropping nulls would silently read
        # as 0 where the dense spelling preserves NULL) — 0-based
        # column-major linear indices. sequence(1, 0) would descend,
        # so guard the empty-data case explicitly.
        pos = F.when(F.size(data) > 0, F.filter(
            F.sequence(F.lit(1), F.size(data)),
            lambda k: F.coalesce(F.element_at(data, k) != 0, F.lit(True)),
        )).otherwise(F.array().cast("array<int>"))
        idx = F.transform(pos, lambda k: (k - 1).cast("int"))
        nz = F.transform(pos, lambda k: F.element_at(data, k))
        return F.struct(
            F.lit(r).cast("int").alias("rows"),
            F.lit(c).cast("int").alias("cols"),
            idx.alias("idx"),
            nz.alias("data"),
        )
    return F.struct(
        F.lit(r).cast("int").alias("rows"),
        F.lit(c).cast("int").alias("cols"),
        F.lit(None).cast("array<int>").alias("idx"),
        data.alias("data"),
    )


def _sparse_get(m: Column, linear: Column) -> Column:
    pos = F.array_position(m["idx"], linear.cast("int"))
    return F.when(pos > 0, F.element_at(m["data"], pos.cast("int"))) \
            .otherwise(F.lit(0))  # absent from idx → zero (type-coerced)


def matrix_get(m: Column, i, j) -> Column:
    """0-based element access. Storage is COLUMN-major — Breeze
    DenseMatrix semantics, which the reference's constructor follows
    (verified against truth/simple-matrix-res.data)."""
    i = F.lit(int(i)) if not isinstance(i, Column) else i
    j = F.lit(int(j)) if not isinstance(j, Column) else j
    linear = j * m["rows"] + i
    return F.when(
        m["idx"].isNull(),
        F.element_at(m["data"], (linear + 1).cast("int"))
    ).otherwise(_sparse_get(m, linear))


def matrix_transpose(m: Column) -> Column:
    r, c = m["rows"], m["cols"]
    n = r * c
    idx = F.sequence(F.lit(0), (n - 1).cast("int"))
    # T is c×r col-major; T(i'=k%c, j'=k div c) = M(j', i')
    # → old col-major index j' + i'·r
    dense = F.transform(
        idx,
        lambda k: F.element_at(
            m["data"],
            (F.floor(k / c).cast("int") + (k % c) * r + 1).cast("int")),
    )
    # sparse: remap each nonzero k=(i + j·r) → i·c + j, then re-sort
    # the (idx, data) pairs by the new linear index
    pairs = F.array_sort(F.zip_with(
        m["idx"], m["data"],
        lambda k, v: F.struct(((k % r) * c + F.floor(k / r)).cast("int")
                              .alias("k"), v.alias("v"))))
    return F.when(
        m["idx"].isNull(),
        F.struct(c.alias("rows"), r.alias("cols"),
                 F.lit(None).cast("array<int>").alias("idx"),
                 dense.alias("data")),
    ).otherwise(
        F.struct(c.alias("rows"), r.alias("cols"),
                 F.transform(pairs, lambda p: p["k"]).alias("idx"),
                 F.transform(pairs, lambda p: p["v"]).alias("data")))


def _dense_data(m: Column) -> Column:
    """Column-major dense array view of either representation —
    sparse rows expand to rows*cols with absent entries as 0 (typed
    by the stored data, so int matrices stay int)."""
    n = (m["rows"] * m["cols"]).cast("int")
    expand = F.transform(F.sequence(F.lit(0), n - 1),
                         lambda k: _sparse_get(m, k))
    return F.when(m["idx"].isNull(), m["data"]).otherwise(expand)


def _dense_struct(rows: Column, cols: Column, data: Column) -> Column:
    return F.struct(rows.cast("int").alias("rows"),
                    cols.cast("int").alias("cols"),
                    F.lit(None).cast("array<int>").alias("idx"),
                    data.alias("data"))


def matrix_add(a: Column, b: Column) -> Column:
    """Element-wise sum (Breeze `+` on the reference's matrix values;
    the reference only reaches matrix arithmetic through RSCRIPT —
    exposing it engine-side closes that gap without an R runtime).
    Dimension mismatch → NULL (Pig null-on-error). Dense result."""
    data = F.zip_with(_dense_data(a), _dense_data(b),
                      lambda x, y: x + y)
    ok = (a["rows"] == b["rows"]) & (a["cols"] == b["cols"])
    return F.when(ok, _dense_struct(a["rows"], a["cols"], data))


def matrix_sub(a: Column, b: Column) -> Column:
    """Element-wise difference; NULL on dimension mismatch."""
    data = F.zip_with(_dense_data(a), _dense_data(b),
                      lambda x, y: x - y)
    ok = (a["rows"] == b["rows"]) & (a["cols"] == b["cols"])
    return F.when(ok, _dense_struct(a["rows"], a["cols"], data))


def matrix_scale(m: Column, s) -> Column:
    """Scalar multiple. Sparse stays sparse (zeros stay zero), dense
    stays dense — same O(nnz) row cost as the storage."""
    s = s if isinstance(s, Column) else F.lit(s)
    scaled = F.transform(m["data"], lambda x: x * s)
    return F.struct(m["rows"].alias("rows"), m["cols"].alias("cols"),
                    m["idx"].alias("idx"), scaled.alias("data"))


def matrix_mul(a: Column, b: Column) -> Column:
    """Matrix product (r×n · n×c → r×c, col-major dense). Inner-dim
    mismatch → NULL. Everything is one HOF expression per row —
    JVM-side, no UDF — sized for the small per-row matrices the
    matrix type exists for (feature blocks, confusion tallies)."""
    da, db = _dense_data(a), _dense_data(b)
    r, n, c = a["rows"], a["cols"], b["cols"]
    # type-seeded accumulator zero; coalesce so an all-zero SPARSE
    # input (empty data array → NULL element) still sums to 0, not
    # NULL (int 0 promotes under double operands, so types hold)
    zero = (F.coalesce(F.element_at(da, 1), F.lit(0))
            * F.coalesce(F.element_at(db, 1), F.lit(0)) * 0)
    out = F.transform(
        F.sequence(F.lit(0), (r * c - 1).cast("int")),
        lambda k: F.aggregate(
            F.sequence(F.lit(0), (n - 1).cast("int")),
            zero,
            lambda acc, t: acc
            + F.element_at(da, (t * r + (k % r) + 1).cast("int"))
            * F.element_at(db, (F.floor(k / r).cast("int") * n + t
                                + 1).cast("int"))))
    return F.when(a["cols"] == b["rows"], _dense_struct(r, c, out))


def register(scalars: dict) -> None:
    for prefix, et in (("di", "int"), ("dd", "double"),
                       ("si", "int"), ("sd", "double")):
        sparse = prefix.startswith("s")
        scalars[f"{prefix}matrix"] = (
            lambda r, c, *v, _et=et, _sp=sparse: matrix_cons(_et, _sp, r, c, *v))
    scalars["matrix_get"] = matrix_get
    scalars["matrix_transpose"] = matrix_transpose
    scalars["matrix_add"] = matrix_add
    scalars["matrix_sub"] = matrix_sub
    scalars["matrix_scale"] = matrix_scale
    scalars["matrix_mul"] = matrix_mul
