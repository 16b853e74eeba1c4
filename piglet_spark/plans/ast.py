"""AST for the Pig Latin dialect supported by the engine.

Node inventory mirrors the reference language surface
(/root/reference/src/main/scala/dbis/piglet/expr/Ref.scala:21-55,
 expr/ArithmeticExpr.scala, expr/Predicate.scala, op/*.scala) but is a
fresh design: plain dataclasses consumed by a DataFrame-building
executor, not a codegen IR.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


# ---------------------------------------------------------------- refs

class Expr:
    pass


@dataclass
class NamedField(Expr):
    """`x` or `A::x` (lineage-qualified, ref Schema.scala:94-121)."""

    name: str
    lineage: tuple[str, ...] = ()

    @property
    def full(self) -> str:
        return "::".join((*self.lineage, self.name))


@dataclass
class PositionalField(Expr):
    """`$0`, `$1`, ... (ref Ref.scala:34)."""

    pos: int


@dataclass
class Literal(Expr):
    value: Any  # int | float | str | bool | None
    pig_type: str = ""  # e.g. "int", "long", "double", "chararray"


@dataclass
class DerefTuple(Expr):
    """`a.b` — tuple-field access or bag-column projection (Ref.scala:43)."""

    base: Expr
    field: Expr  # NamedField or PositionalField


@dataclass
class DerefMap(Expr):
    """`m#'key'` (Ref.scala:49)."""

    base: Expr
    key: Any


@dataclass
class Star(Expr):
    """`*` — all fields."""


# ----------------------------------------------------------- expressions

@dataclass
class BinOp(Expr):
    op: str  # + - * / %
    left: Expr
    right: Expr


@dataclass
class Neg(Expr):
    expr: Expr


@dataclass
class CastExpr(Expr):
    """`(int)x` (ref ArithmeticExpr.scala:149)."""

    pig_type: Any  # str primitive name or complex PigType
    expr: Expr


@dataclass
class FuncCall(Expr):
    name: str
    args: list[Expr] = field(default_factory=list)


@dataclass
class TupleCons(Expr):
    """`(e1, e2, ...)` constructor (ArithmeticExpr.scala:246)."""

    exprs: list[Expr] = field(default_factory=list)


@dataclass
class BagCons(Expr):
    """`{e1, e2, ...}` constructor."""

    exprs: list[Expr] = field(default_factory=list)


@dataclass
class MapCons(Expr):
    """`[k1, v1, k2, v2, ...]` constructor."""

    exprs: list[Expr] = field(default_factory=list)


# ----------------------------------------------------------- predicates

@dataclass
class Cmp(Expr):
    op: str  # == != < <= > >= matches
    left: Expr
    right: Expr


@dataclass
class And(Expr):
    left: Expr
    right: Expr


@dataclass
class Or(Expr):
    left: Expr
    right: Expr


@dataclass
class Not(Expr):
    expr: Expr


@dataclass
class IsNull(Expr):
    expr: Expr
    negated: bool = False


@dataclass
class BinCond(Expr):
    """Classic Pig Latin bincond ``(pred ? then : else)``.

    Not in the reference grammar (PigParser.scala has no ternary), but
    part of Apache Pig's expression language; added for CASE-style
    conditional aggregation (e.g. TPC-H Q8/Q12 shapes)."""
    cond: Expr
    then: Expr
    els: Expr


# ----------------------------------------------------------- schema decl

@dataclass
class FieldDecl:
    name: Optional[str]
    pig_type: Any = "bytearray"  # str | TupleDecl | BagDecl | MapDecl


@dataclass
class TupleDecl:
    fields: list[FieldDecl] = field(default_factory=list)


@dataclass
class BagDecl:
    tuple_decl: TupleDecl = field(default_factory=TupleDecl)


@dataclass
class MapDecl:
    value_type: Any = "bytearray"


# ----------------------------------------------------------- generators

@dataclass
class GenExpr:
    expr: Expr
    alias: Optional[str] = None
    pig_type: Any = None
    flatten: bool = False


# ----------------------------------------------------------- operators

class Op:
    """Base statement. `out` is the output alias (pipe name), `inputs`
    the consumed alias names (defaulted via __getattr__ so subclasses'
    dataclass fields keep required-arg semantics)."""

    def __getattr__(self, name):
        if name == "out":
            return None
        if name == "inputs":
            return []
        raise AttributeError(name)


@dataclass
class Load(Op):
    out: str
    path: str
    func: Optional[str] = None  # PigStorage, TextLoader, JsonStorage, ParquetStorage...
    func_args: list[Any] = field(default_factory=list)
    schema: Optional[TupleDecl] = None
    timestamp_field: Optional[Expr] = None
    inputs: list[str] = field(default_factory=list)


@dataclass
class Store(Op):
    rel: str
    path: str
    func: Optional[str] = None
    func_args: list[Any] = field(default_factory=list)

    def __post_init__(self):
        self.inputs = [self.rel]
        self.out = None


@dataclass
class Dump(Op):
    rel: str

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Display(Op):
    rel: str

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Describe(Op):
    rel: str

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Explain(Op):
    """`EXPLAIN A;` — classic Pig plan inspection; prints the Catalyst
    physical plan (the rebuild's equivalent of Pig's MR-plan dump)."""

    rel: str
    mode: str = "formatted"

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Foreach(Op):
    out: str
    rel: str
    gens: list[GenExpr] = field(default_factory=list)
    nested_ops: list["Op"] = field(default_factory=list)  # nested FOREACH body

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Filter(Op):
    out: str
    rel: str
    pred: Expr = None

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Group(Op):
    out: str
    rel: str
    keys: list[Expr] = field(default_factory=list)  # empty = GROUP ALL

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class CoGroup(Op):
    out: str
    rels: list[str] = field(default_factory=list)
    keys: list[list[Expr]] = field(default_factory=list)

    def __post_init__(self):
        self.inputs = list(self.rels)


@dataclass
class Join(Op):
    out: str
    rels: list[str] = field(default_factory=list)
    keys: list[list[Expr]] = field(default_factory=list)
    window: Optional[tuple[int, str]] = None  # streaming window join
    # USING 'replicated' | 'merge' | 'skewed' | 'salted(n)' (classic
    # Pig specialized-join clause; salted is a beyond-reference
    # extension for deterministic skew spreading)
    strategy: Optional[str] = None

    def __post_init__(self):
        self.inputs = list(self.rels)


@dataclass
class Cross(Op):
    out: str
    rels: list[str] = field(default_factory=list)

    def __post_init__(self):
        self.inputs = list(self.rels)


@dataclass
class Distinct(Op):
    out: str
    rel: str

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Limit(Op):
    out: str
    rel: str
    n: Expr = None

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class OrderSpec:
    field: Expr
    asc: bool = True


@dataclass
class OrderBy(Op):
    out: str
    rel: str
    specs: list[OrderSpec] = field(default_factory=list)  # empty = BY * (all)
    star_asc: bool = True

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Cube(Op):
    """`B = CUBE A BY CUBE(f1, f2);` / `BY ROLLUP(f1, f2)` (classic
    Pig; not in the reference grammar). Output (group, cube:{bag});
    rolled-up dimensions are NULL in group."""

    out: str
    rel: str
    keys: list[Expr] = field(default_factory=list)
    rollup: bool = False

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Rank(Op):
    """`B = RANK A [BY f [ASC|DESC], … [DENSE]];` (classic Pig; not in
    the reference grammar). Prepends `rank_<rel>`: SQL RANK over the
    BY order (DENSE → dense_rank), or 1-based row number in input
    order without BY."""

    out: str
    rel: str
    specs: list[OrderSpec] = field(default_factory=list)
    dense: bool = False

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Sample(Op):
    out: str
    rel: str
    fraction: Expr = None
    # SEED n → deterministic hash-threshold sampling (oracle-able);
    # without it, Spark's nondeterministic Bernoulli sample
    seed: Optional[Expr] = None

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class SplitBranch:
    out: str
    pred: Optional[Expr]  # None = OTHERWISE (matches no other branch)


@dataclass
class SplitInto(Op):
    rel: str
    branches: list[SplitBranch] = field(default_factory=list)

    def __post_init__(self):
        self.inputs = [self.rel]
        self.out = None


@dataclass
class Assert(Op):
    rel: str = ""
    pred: Optional[Expr] = None
    message: Optional[str] = None

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Union(Op):
    out: str
    rels: list[str] = field(default_factory=list)
    onschema: bool = False  # classic Pig: by-name union, null-fill

    def __post_init__(self):
        self.inputs = list(self.rels)


@dataclass
class Intersection(Op):
    out: str
    rels: list[str] = field(default_factory=list)

    def __post_init__(self):
        self.inputs = list(self.rels)


@dataclass
class Difference(Op):
    out: str
    rels: list[str] = field(default_factory=list)
    keys: list[list[Expr]] = field(default_factory=list)  # keyed variant = anti-join

    def __post_init__(self):
        self.inputs = list(self.rels)


@dataclass
class Accumulate(Op):
    out: str
    rel: str
    gens: list[GenExpr] = field(default_factory=list)

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Zip(Op):
    out: str
    rels: list[str] = field(default_factory=list)
    with_index: bool = False

    def __post_init__(self):
        self.inputs = list(self.rels)


@dataclass
class StreamOp(Op):
    out: str
    rel: str
    op_name: str = ""
    params: list[Any] = field(default_factory=list)
    schema: Optional[TupleDecl] = None

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Cache(Op):
    out: str
    rel: str
    level: str = "MEMORY_AND_DISK"

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Materialize(Op):
    rel: str

    def __post_init__(self):
        self.inputs = [self.rel]
        self.out = None


@dataclass
class Tuplify(Op):
    out: str
    rel: str
    on: Expr = None

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class RDFLoad(Op):
    out: str
    path: str
    grouped: Optional[str] = None  # subject | predicate | object
    inputs: list[str] = field(default_factory=list)


@dataclass
class TriplePattern:
    subj: Expr
    pred: Expr
    obj: Expr


@dataclass
class BGPFilter(Op):
    out: str
    rel: str
    patterns: list[TriplePattern] = field(default_factory=list)

    def __post_init__(self):
        self.inputs = [self.rel]


# nested-foreach-only ops

@dataclass
class NestedAssign(Op):
    """`X = <expr-or-op>` inside a nested FOREACH body."""

    out: str
    expr: Any = None  # Expr (e.g. DerefTuple for bag projection) or Op


@dataclass
class Generate(Op):
    gens: list[GenExpr] = field(default_factory=list)
    out: Optional[str] = None


# spatial / infrastructure operators

@dataclass
class SpatialFilter(Op):
    out: str
    rel: str
    pred: Expr = None
    index: Optional[tuple[str, list]] = None

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class SpatialJoin(Op):
    out: str
    rels: list[str] = field(default_factory=list)
    pred: Expr = None  # FuncCall(name, [left_ref, right_ref])
    partitioners: list = field(default_factory=list)
    index: Optional[tuple[str, list]] = None

    def __post_init__(self):
        self.inputs = list(self.rels)


@dataclass
class Partition(Op):
    out: str
    rel: str
    on: Expr = None
    scheme: str = ""
    args: list = field(default_factory=list)

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class IndexOp(Op):
    out: str
    rel: str
    on: Expr = None
    method: str = "rtree"
    args: list = field(default_factory=list)

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Delay(Op):
    """DELAY rel BY (wtime, sample) — ref PigParser.scala:1041-1058:
    the FIRST argument is the wait time (int = milliseconds, string =
    ISO-8601 duration body, e.g. '2.5S' → PT2.5S), the SECOND the
    sample factor (<0: keep ~1/|f| rows; ≥0: duplicate each row f
    times, so 0 empties and 1 is identity — op
    codegen/spark/DelayEmitter.scala:10-27)."""
    out: str
    rel: str
    wtime: Expr = None
    sample: Expr = None

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class Visualize(Op):
    rel: str
    field_ref: Expr = None
    path: str = ""
    width: int = 800
    height: int = 600

    def __post_init__(self):
        self.inputs = [self.rel]
        self.out = None


@dataclass
class RScript(Op):
    out: str
    rel: str
    code: str = ""

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class HdfsCmd(Op):
    cmd: str = ""
    args: list[str] = field(default_factory=list)
    out: Optional[str] = None


@dataclass
class SqlStmt(Op):
    """`B = SQL 'select ... from A ...';` — Spark SQL over the alias
    environment (aliases are registered as temp views). Beyond-
    reference: native escape hatch to the full Spark SQL surface."""

    out: str
    query: str = ""
    inputs: list[str] = field(default_factory=list)


# beyond-reference statements (training-data pipeline)

@dataclass
class Dedup(Op):
    """`B = DEDUP A [ON k1, k2];` — exact dedup; with ON keeps the
    lexicographically-first row per key (deterministic)."""

    out: str
    rel: str
    keys: list[Expr] = field(default_factory=list)

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class NearDup(Op):
    """`B = NEARDUP A ON text [BY id] [THRESHOLD t] [USING 'method']
    [CLUSTER];` — near-duplicate pairs; with CLUSTER, connected
    components over the pair graph → (id, cluster_id, is_canonical).
    Methods (r03): minhash (default; t = Jaccard), simhash (t =
    max hamming distance, int), ngram (exact Jaccard), embedding
    (ON names an array column; t = cosine)."""

    out: str
    rel: str
    on: Expr = None
    id_field: Optional[Expr] = None
    threshold: float = 0.5
    cluster: bool = False
    method: str = "minhash"

    def __post_init__(self):
        self.inputs = [self.rel]


# commands

@dataclass
class Register(Op):
    path: str
    out: Optional[str] = None


@dataclass
class SetCmd(Op):
    key: str = ""
    value: Any = None
    out: Optional[str] = None


@dataclass
class DefineAlias(Op):
    alias: str = ""
    func: str = ""
    args: list[Any] = field(default_factory=list)
    out: Optional[str] = None


@dataclass
class DefineMacro(Op):
    name: str = ""
    params: list[str] = field(default_factory=list)
    returns: Optional[str] = None
    body: list[Op] = field(default_factory=list)
    out: Optional[str] = None


@dataclass
class MacroCall(Op):
    out: str
    name: str = ""
    args: list[Expr] = field(default_factory=list)


@dataclass
class EmbedCmd(Op):
    """`<% python code %>` — definitions exec'd into the UDF namespace."""

    code: str = ""
    out: Optional[str] = None


# streaming

@dataclass
class SocketRead(Op):
    out: str
    host: str = ""
    port: int = 0
    mode: str = ""
    func: Optional[str] = None
    func_args: list[Any] = field(default_factory=list)
    schema: Optional[TupleDecl] = None
    timestamp_field: Optional[Expr] = None
    inputs: list[str] = field(default_factory=list)


@dataclass
class SocketWrite(Op):
    rel: str
    host: str = ""
    port: int = 0
    mode: str = ""

    def __post_init__(self):
        self.inputs = [self.rel]
        self.out = None


@dataclass
class Window(Op):
    out: str
    rel: str
    size: tuple[int, str] = (0, "SECONDS")  # (n, unit) or (n, "ROWS")
    slide: Optional[tuple[int, str]] = None
    # ROWS windows only: PARTITION BY <col> → independent per-key
    # count windows (Flink keyed countWindow), distributed by key
    partition: Optional[str] = None

    def __post_init__(self):
        self.inputs = [self.rel]


@dataclass
class MatchEvent(Op):
    """CEP MATCH_EVENT (ref op/Matcher.scala:83)."""

    out: str
    rel: str
    pattern: Any = None
    definitions: dict[str, Expr] = field(default_factory=dict)
    mode: str = "skip_till_next_match"
    within: Optional[tuple[int, str]] = None

    def __post_init__(self):
        self.inputs = [self.rel]
