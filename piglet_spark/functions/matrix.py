"""Matrix data type — struct(rows, cols, data) columns.

Reference: `[sd][di]matrix(rows, cols)` Breeze-backed type
(schema/ComplexTypes.scala:175-194, parser PigParser.scala:292-298,
Language.md "Matrix data types"). The rebuild keeps a dense
row-major representation for all four spellings (sparse maps to
dense; adequate for the constructor + access surface the reference's
corpus exercises).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _flatten_args(args) -> list[Column]:
    cols = []
    for a in args:
        cols.append(a if isinstance(a, Column) else F.lit(a))
    return cols


def matrix_cons(elem_type: str, rows, cols, *vals) -> Column:
    """`didmatrix(r, c, v...)` / `ddmatrix(r, c, {bag})` constructor.
    vals: either r*c scalars or a single array/bag column."""
    r = int(rows) if not isinstance(rows, Column) else rows
    c = int(cols) if not isinstance(cols, Column) else cols
    cast_t = "int" if elem_type == "int" else "double"
    if len(vals) == 1 and isinstance(vals[0], Column):
        # array column (bag constructors are unwrapped by the compiler)
        data = F.transform(vals[0], lambda x: x.cast(cast_t))
    else:
        data = F.array(*[(v if isinstance(v, Column) else F.lit(v))
                         .cast(cast_t) for v in vals])
    return F.struct(
        F.lit(r).cast("int").alias("rows"),
        F.lit(c).cast("int").alias("cols"),
        data.alias("data"),
    )


def matrix_get(m: Column, i, j) -> Column:
    """0-based element access. Storage is COLUMN-major — Breeze
    DenseMatrix semantics, which the reference's constructor follows
    (verified against truth/simple-matrix-res.data)."""
    i = F.lit(int(i)) if not isinstance(i, Column) else i
    j = F.lit(int(j)) if not isinstance(j, Column) else j
    return F.element_at(m["data"], (j * m["rows"] + i + 1).cast("int"))


def matrix_transpose(m: Column) -> Column:
    r, c = m["rows"], m["cols"]
    n = r * c
    idx = F.sequence(F.lit(0), (n - 1).cast("int"))
    # T is c×r col-major; T(i'=k%c, j'=k div c) = M(j', i')
    # → old col-major index j' + i'·r
    data = F.transform(
        idx,
        lambda k: F.element_at(
            m["data"],
            (F.floor(k / c).cast("int") + (k % c) * r + 1).cast("int")),
    )
    return F.struct(c.alias("rows"), r.alias("cols"), data.alias("data"))


def register(scalars: dict) -> None:
    for prefix, et in (("di", "int"), ("dd", "double"),
                       ("si", "int"), ("sd", "double")):
        scalars[f"{prefix}matrix"] = (
            lambda r, c, *v, _et=et: matrix_cons(_et, r, c, *v))
    scalars["matrix_get"] = matrix_get
    scalars["matrix_transpose"] = matrix_transpose
