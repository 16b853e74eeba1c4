"""Pluggable LOAD/STORE storage functions.

Parity: sparklib/src/main/scala/dbis/piglet/backends/spark/Storage.scala
(PigStorage :38-68, TextLoader :85-100, RDFFileStorage :126-143,
BinStorage :147-162, JsonStorage :207-247, JdbcStorage :251-275).

All loaders return a DataFrame whose scan benefits from Catalyst
pushdown (schemas passed to the reader, not applied post-hoc).
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans import ast as A
from ..plans import schema as S


class StorageError(Exception):
    pass


# ---------------------------------------------------------------- load

def load(spark: SparkSession, path: str, func: Optional[str],
         args: list[Any], decl: Optional[A.TupleDecl]) -> DataFrame:
    name = (func or "PigStorage").split(".")[-1].lower()
    fn = _LOADERS.get(name)
    if fn is None:
        raise StorageError(f"unknown load function {func!r}")
    return fn(spark, path, args, decl)


def _schema_or_none(decl: Optional[A.TupleDecl]) -> Optional[T.StructType]:
    return S.tuple_decl_to_struct(decl) if decl is not None else None


def _load_pigstorage(spark, path, args, decl):
    # PigStorage('delim', skipFirstRow, skipEmpty, comments)
    # default delimiter is TAB (Storage.scala:40); trailing empty fields kept
    delim = str(args[0]) if args else "\t"
    # Pig convention quotes UDF args, so 'false' must read as False
    skip_first = str(args[1]).lower() in ("true", "1", "yes") \
        if len(args) > 1 else False
    comments = str(args[3]) if len(args) > 3 else None
    reader = (spark.read.format("csv")
              .option("sep", delim)
              .option("header", "false")
              .option("mode", "PERMISSIVE")
              # plain split semantics — no CSV quote/escape handling
              # (Storage.scala:54 split(delim, -1))
              .option("quote", "")
              .option("emptyValue", ""))
    if comments:
        reader = reader.option("comment", comments[0])
    schema = _schema_or_none(decl)
    if schema is not None:
        reader = reader.schema(schema)
    if skip_first:
        # header=true drops the first PHYSICAL line of each file —
        # with an explicit schema the header is never consumed as
        # names; schemaless, Spark derives (and auto-dedups) names
        # from it, so rename back to positional _c0.._cN below.
        # (r05: the old schemaless path filtered rows EQUAL to the
        # sampled first row, silently deleting legitimate data rows
        # that coincide with the header values)
        reader = reader.option("header", "true")
    df = reader.load(path)
    if skip_first and schema is None:
        df = df.toDF(*[f"_c{i}" for i in range(len(df.columns))])
    return df


def _load_textloader(spark, path, args, decl):
    df = spark.read.text(path)
    name = "line"
    if decl is not None and decl.fields:
        name = decl.fields[0].name or "line"
    return df.select(F.col("value").alias(name))


def _load_rdf(spark, path, args, decl):
    # N-triples tokenization parity (Storage.scala:127 pattern
    # `([^"]\S*|".+?")\s*`, first 3 tokens): a token is a quoted
    # string (shortest) or a bare word — typed-literal suffixes
    # (^^<...>) and the trailing dot fall off as tokens 4+
    tok = r'("[^"]*"|\S+)'
    pat = rf'^\s*{tok}\s+{tok}\s+{tok}'
    names = ["subject", "predicate", "object"]
    if decl is not None and len(decl.fields) == 3:
        names = [f.name or names[i] for i, f in enumerate(decl.fields)]
    df = spark.read.text(path)
    return df.select(
        F.regexp_extract("value", pat, 1).alias(names[0]),
        F.regexp_extract("value", pat, 2).alias(names[1]),
        F.regexp_extract("value", pat, 3).alias(names[2]),
    ).filter(F.col(names[0]) != "")


def _load_json(spark, path, args, decl):
    reader = spark.read
    schema = _schema_or_none(decl)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Cheap driver-side footer probe: names of TIMESTAMP(NANOS)
    columns. Spark can't read them without the legacy nanosAsLong
    conf (and setting it after a failed job spams executor ERROR
    logs) — and with the conf they load as plain longs, which would
    silently break time semantics downstream (GETHOUR, CEP ordering,
    windows), so the loader must cast them back."""
    try:
        import glob
        import os

        import pyarrow.parquet as pq
        candidates = [path] if os.path.isfile(path) else sorted(
            glob.glob(os.path.join(path, "*.parquet")))[:1]
        for f in candidates:
            schema = pq.read_schema(f)
            return [n for n, t in zip(schema.names, schema.types)
                    if "timestamp[ns" in str(t)]
    except Exception:
        pass
    return []


def _load_parquet(spark, path, args, decl):
    nanos_cols = _nanos_timestamp_cols(path)
    if nanos_cols:
        # Deliberately left set for the session (not restored): the
        # scan is LAZY — the parquet reader consults the conf again
        # at execution time, so restoring it here would break the
        # very read it enables. Side effect: other reads of
        # TIMESTAMP(NANOS) parquet in this session get longs instead
        # of Spark's default PARQUET_TYPE_ILLEGAL error.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # cached_parquet: memoized lazy HANDLE per (session, path, file
    # fingerprint) — skips ~60-90 ms of py4j + footer schema work per
    # re-read of the same path; never caches data (r10)
    from ..datapipe.util import cached_parquet
    try:
        df = cached_parquet(spark, path)
        df.schema  # force schema resolution
    except Exception as e:  # fallback if the probe missed it
        if "PARQUET_TYPE_ILLEGAL" not in str(e):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # probe failed → column names unknown; load as-is (longs)
        # rather than guessing which longs were timestamps
    # resolution-agnostic loads: nanos-as-long → real timestamps
    # (micro truncation), so queries behave identically whether the
    # data was written with us or ns resolution
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    for c in nanos_cols:
        field = dict(zip(df.columns, df.schema.fields)).get(c)
        if field is not None and isinstance(field.dataType, T.LongType):
            # integer `div`, NOT `/`: long/long is DOUBLE division in
            # Spark and ns-epoch values (~1.6e18, double ulp 256ns)
            # lose precision BEFORE dividing — ~half of all values
            # come out 1µs off (caught by r02 code review)
            df = df.withColumn(
                c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    if decl is not None:
        names = [f.name for f in decl.fields]
        df = df.toDF(*[n or c for n, c in zip(names, df.columns)])
    return df


def _load_jdbc(spark, path, args, decl):
    """JdbcStorage('driver', 'url?user=x&password=y'); path = table
    name (ref dbis/piglet/op/Load.scala + Storage.scala JdbcStorage:
    the AS schema renames the projected columns, like ParquetStorage).
    Predicate/column pushdown comes free: spark.read.jdbc exposes the
    table as a scannable relation, so FILTER/FOREACH over it compile
    to WHERE/SELECT in the generated SQL."""
    if len(args) < 2:
        raise StorageError("JdbcStorage needs (driver, url)")
    driver, url = str(args[0]), str(args[1])
    df = (spark.read.format("jdbc")
          .option("driver", driver)
          .option("url", url)
          .option("dbtable", path)
          .load())
    if decl is not None:
        names = [f.name for f in decl.fields]
        df = df.toDF(*[n or c for n, c in zip(names, df.columns)])
    return df


def _load_orc(spark, path, args, decl):
    return spark.read.orc(path)


def _load_avro(spark, path, args, decl):
    """Avro is an external datasource module since Spark 2.4; this
    container's Spark ships only the core avro jars, not the
    spark-avro connector — fail with guidance instead of Spark's
    cryptic 'Failed to find data source'."""
    try:
        df = spark.read.format("avro").load(path)
        df.schema  # force datasource resolution
        return df
    except Exception as e:
        if "Failed to find data source" in str(e):
            raise StorageError(
                "AvroStorage needs the spark-avro connector "
                "(org.apache.spark:spark-avro on --packages); it is "
                "not deployed in this environment") from e
        raise


_LOADERS = {
    "pigstorage": _load_pigstorage,
    "pigstream": _load_pigstorage,  # stream func, batch-compatible parse
    "textloader": _load_textloader,
    "rdffilestorage": _load_rdf,
    "jsonstorage": _load_json,
    "jsonstorage2": _load_json,
    "binstorage": _load_parquet,  # our binary format is parquet
    "parquetstorage": _load_parquet,
    "jdbcstorage": _load_jdbc,
    "orcstorage": _load_orc,
    "avrostorage": _load_avro,
}


# --------------------------------------------------------------- store

def store(df: DataFrame, path: str, func: Optional[str],
          args: list[Any]) -> None:
    name = (func or "PigStorage").split(".")[-1].lower()
    if name == "pigstorage":
        # asymmetric defaults are REFERENCE parity, not an accident:
        # LOAD defaults to tab (Storage.scala:40) but STORE defaults
        # to ',' — the reference truth files (truth/top.data etc.,
        # written by no-USING STOREs) are comma-delimited. A default
        # STORE→LOAD round-trip therefore needs explicit delimiters.
        delim = str(args[0]) if args else ","
        formatted = pig_format_rows(df, delim)
        formatted.write.mode("overwrite").text(path)
        return
    if name in ("binstorage", "parquetstorage"):
        # optional hive-style partitioned output — the 100 TB layout:
        # `STORE X INTO 'p' USING ParquetStorage('col1,col2')` writes
        # path/col1=v/col2=v/part-*.parquet, so downstream reads prune
        # partitions on those columns for free
        w = df.write.mode("overwrite")
        if args:
            cols = [c.strip() for c in str(args[0]).split(",")
                    if c.strip()]
            missing = [c for c in cols if c not in df.columns]
            if missing:
                raise StorageError(
                    f"ParquetStorage partition column(s) {missing} not "
                    f"in schema {df.columns}")
            w = w.partitionBy(*cols)
        w.parquet(path)
        return
    if name in ("jsonstorage", "jsonstorage2"):
        df.write.mode("overwrite").json(path)
        return
    if name == "orcstorage":
        df.write.mode("overwrite").orc(path)
        return
    if name == "jdbcstorage":
        (df.write.format("jdbc").option("driver", str(args[0]))
         .option("url", str(args[1])).option("dbtable", path).save())
        return
    raise StorageError(f"unknown store function {func!r}")


# ----------------------------------------------- Pig output formatting

def _fmt(col, dt: T.DataType):
    """Pig rendering (ScalaEmitter.scala:466-472): bags `{t1,t2}`,
    maps `[k#v]`, tuples `(a,b)`; null → empty string (complex types
    included — a NULL bag/tuple/map column must render '' so
    concat_ws keeps its delimiter and downstream field positions,
    r05 review)."""
    if isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
        return F.when(col.isNull(), F.lit("")) \
                .otherwise(_fmt_complex(col, dt))
    return F.coalesce(col.cast("string"), F.lit(""))


def _fmt_complex(col, dt: T.DataType):
    if isinstance(dt, T.StructType):
        names = [f.name for f in dt.fields]
        if names == ["gtype", "xs", "ys"]:
            # geometry → the reference's STObject rendering
            # (STARK toString, see truth/spatialfilter.data):
            # STObject(POINT (50.1 10.2),None)
            coords = F.array_join(
                F.zip_with(col["xs"], col["ys"],
                           lambda x, y: F.concat_ws(" ", x.cast("string"),
                                                    y.cast("string"))),
                ", ")
            wkt = F.when(
                col["gtype"] == "POINT",
                F.concat(F.lit("POINT ("), coords, F.lit(")"))
            ).otherwise(
                F.concat(col["gtype"], F.lit(" (("), coords, F.lit("))")))
            return F.concat(F.lit("STObject("), wkt, F.lit(",None)"))
        if names == ["rows", "cols", "idx", "data"]:
            r, c = col["rows"], col["cols"]
            # dense (idx null) → Breeze DenseMatrix.toString parity
            # (truth/simple-matrix-res.data): rows of `v  v  v  `
            # joined by newlines; storage is column-major
            row_idx = F.sequence(F.lit(0), (r - 1).cast("int"))
            col_idx = F.sequence(F.lit(0), (c - 1).cast("int"))
            lines = F.transform(
                row_idx,
                lambda i: F.concat(F.array_join(
                    F.transform(
                        col_idx,
                        lambda j: F.concat(
                            F.element_at(col["data"],
                                         (j * r + i + 1).cast("int"))
                            .cast("string"), F.lit("  "))),
                    ""), F.lit("")),
            )
            dense = F.array_join(lines, "\n")
            # sparse → Breeze CSCMatrix-style: header + `(i,j) v` lines
            header = F.concat(r.cast("string"), F.lit(" x "),
                              c.cast("string"), F.lit(" CSCMatrix"))
            entries = F.zip_with(
                col["idx"], col["data"],
                lambda k, v: F.concat(
                    F.lit("("), (k % r).cast("string"), F.lit(","),
                    F.floor(k / r).cast("int").cast("string"), F.lit(") "),
                    v.cast("string")))
            sparse = F.array_join(
                F.concat(F.array(header), entries), "\n")
            return F.when(col["idx"].isNull(), dense).otherwise(sparse)
        parts = []
        for f in dt.fields:
            parts.append(_fmt(col[f.name], f.dataType))
        return F.concat(F.lit("("), F.concat_ws(",", *parts), F.lit(")"))
    if isinstance(dt, T.ArrayType):
        elem = dt.elementType
        inner = F.transform(col, lambda x: _fmt(x, elem))
        return F.concat(F.lit("{"), F.array_join(inner, ","), F.lit("}"))
    if isinstance(dt, T.MapType):
        entries = F.transform(
            F.map_entries(col),
            lambda e: F.concat(e["key"].cast("string"), F.lit("#"),
                               F.coalesce(e["value"].cast("string"), F.lit(""))),
        )
        return F.concat(F.lit("["), F.array_join(entries, ","), F.lit("]"))
    return F.coalesce(col.cast("string"), F.lit(""))


def pig_format_rows(df: DataFrame, delim: str = ",") -> DataFrame:
    cols = [_fmt(df[c], df.schema[c].dataType) for c in df.columns]
    return df.select(F.concat_ws(delim, *cols).alias("value"))


def pig_format_tuple(df: DataFrame) -> DataFrame:
    """DUMP format: `(f1,f2,...)` per row."""
    cols = [_fmt(df[c], df.schema[c].dataType) for c in df.columns]
    return df.select(
        F.concat(F.lit("("), F.concat_ws(",", *cols), F.lit(")")).alias("value")
    )
