"""Pig type system ↔ Spark SQL types + lineage-aware field resolution.

Reference semantics: schema/Types.scala (primitives, escalation),
schema/ComplexTypes.scala (tuple/bag/map, lineage separator `::`),
schema/Schema.scala:94-121 (NamedField resolution with ambiguity check).
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import types as T

from . import ast as A

LINEAGE_SEP = "::"


class AmbiguousFieldError(Exception):
    """A plain field name matches several lineage-qualified columns
    (e.g. after a self-join) — qualify with `alias::field`."""


class UnknownFieldError(Exception):
    """A field reference resolves to no column of the relation."""

_PRIM = {
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "chararray": T.StringType(),
    # bytearray is Pig's "unknown" type; the reference's codegen maps it
    # to String (ScalaEmitter.scala:20) — we follow suit.
    "bytearray": T.StringType(),
    "datetime": T.TimestampType(),
    "biginteger": T.LongType(),
    "bigdecimal": T.DecimalType(38, 18),
}

# numeric escalation priority (Types.scala:112-141)
_NUM_PRIORITY = ["bytearray", "int", "long", "float", "double"]


def pig_to_spark(ptype: Any) -> T.DataType:
    if isinstance(ptype, str):
        return _PRIM.get(ptype.lower(), T.StringType())
    if isinstance(ptype, A.TupleDecl):
        return tuple_decl_to_struct(ptype)
    if isinstance(ptype, A.BagDecl):
        return T.ArrayType(tuple_decl_to_struct(ptype.tuple_decl))
    if isinstance(ptype, A.MapDecl):
        return T.MapType(T.StringType(), pig_to_spark(ptype.value_type))
    return T.StringType()


def tuple_decl_to_struct(decl: A.TupleDecl) -> T.StructType:
    fields = []
    for i, f in enumerate(decl.fields):
        name = f.name or f"f{i}"
        fields.append(T.StructField(name, pig_to_spark(f.pig_type), True))
    return T.StructType(fields)



def resolve_column(columns: list[str], ref: str,
                   lineage: tuple[str, ...] = ()) -> str:
    """Resolve a (possibly lineage-qualified) field name against actual
    DataFrame columns. Matches ref Schema.scala:94-121: a plain name
    resolves when unique across lineage-qualified columns; a qualified
    name `A::x` matches exactly; ambiguity raises."""
    want = LINEAGE_SEP.join((*lineage, ref)) if lineage else ref
    if want in columns:
        return want
    # suffix match: column "A::x" matches ref "x"; "A::B::x" matches "B::x"
    suffix = LINEAGE_SEP + want
    hits = [c for c in columns if c.endswith(suffix)]
    if len(hits) == 1:
        return hits[0]
    if len(hits) > 1:
        raise AmbiguousFieldError(
            f"field {want!r} is ambiguous among {hits}; qualify with lineage"
        )
    raise UnknownFieldError(f"unknown field {want!r}; columns = {columns}")


def positional(columns: list[str], pos: int) -> str:
    if pos < 0 or pos >= len(columns):
        raise UnknownFieldError(f"positional ${pos} out of range ({len(columns)} cols)")
    return columns[pos]


def base_name(column: str) -> str:
    """Strip lineage prefix: 'A::x' → 'x'."""
    return column.rsplit(LINEAGE_SEP, 1)[-1]


