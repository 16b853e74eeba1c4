"""Built-in Pig function library → native Spark Column builders.

Parity target: /root/reference/src/main/scala/dbis/piglet/udf/UDF.scala:28-75
and common/src/main/scala/dbis/piglet/CommonPigFuncs.scala:24-85.

Every function here stays JVM-side (pyspark.sql.functions) — no Python
UDFs in the hot path. Aggregates have two builders:

- ``fused``: operates on pre-group columns inside ``groupBy().agg()``
  (the scale path — partial aggregation, no bag materialization);
- ``bag``: operates on a materialized ``array<struct>`` bag column via
  higher-order functions (only when the script truly keeps the bag).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F


# ------------------------------------------------------------ aggregates

class AggSpec:
    def __init__(self, fused: Callable[..., Column],
                 bag: Callable[..., Column]):
        self.fused = fused
        self.bag = bag


def _round_scale(s) -> int:
    """ROUND's scale must be a literal int — silently rounding to 0
    decimals for a column-valued scale was a wrong-result trap (r05)."""
    if isinstance(s, int):
        return s
    raise ValueError(
        "ROUND scale must be an integer literal, got a "
        f"{type(s).__name__} (column-valued scales are unsupported)")


def _nonnull_vals(bag: Column, c: str) -> Column:
    """Non-null field values of a bag — the null-skipping base every
    value-aggregate shares (Pig/SQL semantics: NULL elements don't
    poison a fold and don't count in denominators)."""
    return F.filter(F.transform(bag, lambda x: x[c]),
                    lambda v: v.isNotNull())


def _bag_median(bag: Column, c: str) -> Column:
    """Upper median, null-skipping (r05: nulls sorted last and a
    null-inclusive size skewed the index — bag [(1),(NULL),(2),(3)]
    returned 3 where the fused path returns 2)."""
    vals = F.array_sort(_nonnull_vals(bag, c))
    return F.element_at(vals,
                        (F.floor(F.size(vals) / 2) + 1).cast("int"))


def _bag_var(bag: Column, c: str) -> Column:
    """Population variance, null-skipping with a non-null denominator
    (r05: one NULL element poisoned the whole fold to NULL where the
    fused var_pop skips nulls)."""
    vals = F.transform(_nonnull_vals(bag, c),
                       lambda v: v.cast("double"))
    n = F.size(vals).cast("double")
    s = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x)
    s2 = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x * x)
    return F.when(n > 0, s2 / n - (s / n) ** 2).otherwise(F.lit(None))


def _bag_avg(bag: Column, c: str) -> Column:
    """AVG over a bag column, NULL-skipping like F.avg: sum of
    non-null values / count of non-null values; NULL when none."""
    vals = F.filter(F.transform(bag, lambda x: x[c].cast("double")),
                    lambda v: v.isNotNull())
    n = F.size(vals)
    return F.when(n > 0, F.aggregate(
        vals, F.lit(0.0), lambda acc, v: acc + v) / n)


AGGREGATES: dict[str, AggSpec] = {
    # COUNT counts all rows of the bag incl. nulls (CommonPigFuncs.scala:36)
    "count": AggSpec(
        fused=lambda *cols: F.count(F.lit(1)),
        bag=lambda bag, *proj: F.size(bag),
    ),
    # SUM/AVG skip NULL values (Pig + SQL aggregate semantics; keeps
    # the bag path consistent with the fused F.sum/F.avg path — a
    # NULL element must not poison the fold, and AVG's denominator
    # counts non-null values only). SUM of an all-NULL group is 0,
    # not NULL: reference parity (CommonPigFuncs.scala:38 sums an
    # empty Iterable to 0) and consistency with the bag path and the
    # COGROUP-fused empty-side normalization.
    "sum": AggSpec(
        fused=lambda c: F.coalesce(F.sum(c), F.lit(0)),
        bag=lambda bag, c: F.aggregate(
            bag, F.lit(0.0),
            lambda acc, x: acc + F.coalesce(x[c].cast("double"), F.lit(0.0))
        ),
    ),
    "min": AggSpec(
        fused=lambda c: F.min(c),
        bag=lambda bag, c: F.array_min(F.transform(bag, lambda x: x[c])),
    ),
    "max": AggSpec(
        fused=lambda c: F.max(c),
        bag=lambda bag, c: F.array_max(F.transform(bag, lambda x: x[c])),
    ),
    "avg": AggSpec(
        fused=lambda c: F.avg(c),
        bag=lambda bag, c: _bag_avg(bag, c),
    ),
    # upper median of the sorted sequence (CommonPigFuncs.scala:30-34);
    # both paths skip nulls (collect_list drops them; _bag_median
    # filters, r05)
    "median": AggSpec(
        fused=lambda c: F.element_at(
            F.array_sort(F.collect_list(c)),
            (F.floor(F.count(c) / 2) + 1).cast("int"),
        ),
        bag=lambda bag, c: _bag_median(bag, c),
    ),
    "isempty": AggSpec(
        fused=lambda *c: F.count(F.lit(1)) == 0,
        bag=lambda bag, *c: F.size(bag) == 0,
    ),
    "nonempty": AggSpec(
        fused=lambda *c: F.count(F.lit(1)) > 0,
        bag=lambda bag, *c: F.size(bag) > 0,
    ),
    # beyond-reference but standard Pig builtins, cheap to support
    "count_star": AggSpec(
        fused=lambda *c: F.count(F.lit(1)),
        bag=lambda bag, *c: F.size(bag),
    ),
    "var": AggSpec(
        fused=lambda c: F.var_pop(c),
        bag=lambda bag, c: _bag_var(bag, c),
    ),
    "stddev": AggSpec(
        fused=lambda c: F.stddev_pop(c),
        bag=lambda bag, c: F.sqrt(AGGREGATES["var"].bag(bag, c)),
    ),
    # HyperLogLog++ cardinality (beyond-reference; the aggregate a
    # 100 TB pipeline actually uses where COUNT(DISTINCT x) would
    # shuffle every distinct value — HLL state is a few KB per group,
    # map-side combined). Bag form falls back to exact distinct
    # (already-materialized arrays are small by construction).
    "approx_distinct": AggSpec(
        fused=lambda c: F.approx_count_distinct(c),
        # filter nulls so both forms agree: approx_count_distinct
        # ignores nulls (HLL semantics), array_distinct would keep one
        bag=lambda bag, c: F.size(F.filter(
            F.array_distinct(F.transform(bag, lambda x: x[c])),
            lambda v: v.isNotNull())).cast("long"),
    ),
}


def is_aggregate(name: str) -> bool:
    return name.lower() in AGGREGATES


# -------------------------------------------------------------- scalars

def _substring(c: Column, start, stop=None) -> Column:
    # Pig SUBSTRING(s, start[, stop]) — half-open, 0-based; the 2-arg
    # form runs to the end of the string (CommonPigFuncs.scala:66-67).
    # Out-of-range clamps to "" (Spark substring semantics) rather
    # than throwing like the reference's raw String.substring — the
    # null-on-error direction Pig itself takes.
    start = F.lit(start) if not isinstance(start, Column) else start
    if stop is None:
        return F.substring(c, start.cast("int") + F.lit(1),
                           F.lit(2147483647))
    stop = F.lit(stop) if not isinstance(stop, Column) else stop
    return F.substring(
        c, start.cast("int") + F.lit(1), (stop - start).cast("int")
    )


def _tokenize(c: Column) -> Column:
    # split on [, "] (CommonPigFuncs.scala:50); drop empty tokens the way
    # Scala's split drops trailing empties. Pig parity: bag of 1-field
    # tuples, so DUMP/STORE renders {(Mary),(had)}.
    arr = F.split(c, '[, "]')
    arr = F.filter(arr, lambda x: x != "")
    return F.transform(arr, lambda x: F.struct(x.alias("token")))


SCALARS: dict[str, Callable[..., Column]] = {
    "tokenize": _tokenize,
    # limit honored (r05: it was accepted and silently ignored) —
    # Java String.split semantics, same as Pig's STRSPLIT
    "strsplit": lambda c, pat=None, limit=None: F.split(
        c, pat if pat is not None else "\\s+",
        int(limit) if limit is not None else -1
    ),
    "startswith": lambda c, p: c.startswith(p),
    "endswith": lambda c, p: c.endswith(p),
    "strlen": lambda c: F.length(c),
    "size": lambda c: F.size(c),
    "lower": lambda c: F.lower(c),
    "upper": lambda c: F.upper(c),
    "concat": lambda *cs: F.concat(*cs),
    "strcontains": lambda c, s: c.contains(s),
    "trim": lambda c: F.trim(c),
    "substring": _substring,
    "indexof": lambda c, s: F.instr(c, s) - 1,
    "replace": lambda c, a, b: F.regexp_replace(c, a, b),
    "regex_extract": lambda c, pat, idx: F.regexp_extract(c, pat, idx),
    "todouble": lambda c: c.cast("double"),
    "toint": lambda c: c.cast("int"),
    "tolong": lambda c: c.cast("long"),
    "tofloat": lambda c: c.cast("float"),
    "tostring": lambda c: c.cast("string"),
    "tomap": lambda *cs: F.create_map(*cs),
    "totuple": lambda *cs: F.struct(*cs),
    "tobag": lambda *cs: F.array(*[F.struct(c) for c in cs]),
    "sqrt": lambda c: F.sqrt(c.cast("double")),
    "pow": lambda a, b: F.pow(
        a.cast("double") if isinstance(a, Column) else F.lit(float(a)),
        b.cast("double") if isinstance(b, Column) else F.lit(float(b))),
    "abs": lambda c: F.abs(c),
    "ceil": lambda c: F.ceil(c),
    "floor": lambda c: F.floor(c),
    "round": lambda c, s=0: F.round(c, _round_scale(s)),
    "log": lambda c: F.log(c.cast("double")),
    "log10": lambda c: F.log10(c.cast("double")),
    "exp": lambda c: F.exp(c.cast("double")),
    "random": lambda: F.rand(),
    # euclidean distance between two (x, y) points, flattened args
    # (UDF.scala:74 S_DISTANCE — STARK euclid; we take 4 coords)
    "s_distance": lambda x1, y1, x2, y2: F.sqrt(
        (x1.cast("double") - x2.cast("double")) ** 2
        + (y1.cast("double") - y2.cast("double")) ** 2
    ),
    # datetime helpers (streaming timestamps)
    "getsecond": lambda c: F.second(c),
    "getminute": lambda c: F.minute(c),
    "gethour": lambda c: F.hour(c),
    "getday": lambda c: F.dayofmonth(c),
    "getmonth": lambda c: F.month(c),
    "getyear": lambda c: F.year(c),
    # semi-structured extraction (beyond-reference; event `props`
    # columns): JSON_GET(col, 'k') / JSON_GET(col, '$.a.b') → string
    # (null on missing path / invalid JSON, Pig null-on-error style)
    "json_get": lambda c, path: F.get_json_object(
        c, path if str(path).startswith("$") else f"$.{path}"),
}


def _register_datapipe() -> None:
    """Expose the training-data-pipeline operators as Pig scalar
    functions (beyond-reference surface, SURVEY.md §7 step 10)."""
    from ..datapipe import text as dt

    SCALARS.update({
        "langid": dt.lang_id,
        "quality_score": dt.quality_score,
        "token_count": dt.ws_token_count,
        "bpe_token_count": dt.bpe_token_count,
        "fingerprint": dt.fingerprint,
        "normalize_text": dt.normalize_text,
        "ngrams": lambda c, n=3: dt.text_ngrams(
            dt.normalize_text(c), int(n)),
        "cosine_sim": _cosine_sim,
    })


def _cosine_sim(a: Column, b: Column) -> Column:
    from ..datapipe import similarity as sim
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return sim.cosine(ad, bd)


def _register_spatial_matrix() -> None:
    from . import matrix as mx
    from . import spatial as sp

    SCALARS.update({
        "geometry": sp.geometry,
        "st_contains": sp.contains,
        "st_containedby": sp.containedby,
        "st_intersects": sp.intersects,
        "st_distance": sp.distance,
        "contains": sp.contains,
        "containedby": sp.containedby,
        "intersects": sp.intersects,
    })
    mx.register(SCALARS)


_register_datapipe()
_register_spatial_matrix()


def lookup_scalar(name: str) -> Optional[Callable[..., Column]]:
    return SCALARS.get(name.lower())
