"""Parser golden-AST tests (model: reference PigParserSpec.scala)."""

import pytest

from piglet_spark.plans import ast as A
from piglet_spark.plans import parser as P


def parse1(src):
    ops = P.parse(src)
    assert len(ops) == 1
    return ops[0]


def test_load_schema():
    op = parse1("A = LOAD 'f.csv' USING PigStorage(',') AS (x:int, y:chararray);")
    assert isinstance(op, A.Load)
    assert op.out == "A" and op.path == "f.csv"
    assert op.func == "PigStorage" and op.func_args == [","]
    assert [f.name for f in op.schema.fields] == ["x", "y"]
    assert [f.pig_type for f in op.schema.fields] == ["int", "chararray"]


def test_load_untyped():
    op = parse1("a = load 'f';")
    assert op.func is None and op.schema is None


def test_filter_pred():
    op = parse1("B = FILTER A BY x > 1 AND (y == 'z' OR NOT w != 2);")
    assert isinstance(op, A.Filter)
    assert isinstance(op.pred, A.And)


def test_foreach_exprs():
    op = parse1("B = FOREACH A GENERATE $0, x + 2 AS s:int, (double)y AS d;")
    assert isinstance(op, A.Foreach)
    assert isinstance(op.gens[0].expr, A.PositionalField)
    assert op.gens[1].alias == "s" and op.gens[1].pig_type == "int"
    assert isinstance(op.gens[2].expr, A.CastExpr)


def test_foreach_flatten():
    op = parse1("B = FOREACH A GENERATE FLATTEN(TOKENIZE(line)) AS w;")
    assert op.gens[0].flatten and isinstance(op.gens[0].expr, A.FuncCall)


def test_nested_foreach():
    op = parse1(
        "B = FOREACH G { s = A.sym; u = DISTINCT s; GENERATE group, COUNT(u); };"
    )
    assert len(op.nested_ops) == 2
    assert isinstance(op.nested_ops[1], A.NestedAssign)
    assert op.nested_ops[1].expr[0] == "distinct"
    assert len(op.gens) == 2


def test_group_join():
    g = parse1("G = GROUP A BY (x, y);")
    assert isinstance(g, A.Group) and len(g.keys) == 2
    j = parse1("J = JOIN A BY f1, B BY f2;")
    assert isinstance(j, A.Join) and j.rels == ["A", "B"]
    ga = parse1("G = GROUP A ALL;")
    assert ga.keys == []


def test_split():
    op = parse1("SPLIT A INTO X IF f1 < 3, Y IF f1 >= 3;")
    assert isinstance(op, A.SplitInto)
    assert [b.out for b in op.branches] == ["X", "Y"]


def test_order_multi_dir():
    op = parse1("B = ORDER A BY f1 ASC, f2 DESC;")
    assert op.specs[0].asc and not op.specs[1].asc


def test_deref_map_tuple():
    op = parse1("B = FOREACH A GENERATE t.city, m#'k';")
    assert isinstance(op.gens[0].expr, A.DerefTuple)
    assert isinstance(op.gens[1].expr, A.DerefMap)


def test_lineage_ref():
    op = parse1("B = FOREACH J GENERATE A::x;")
    e = op.gens[0].expr
    assert e.name == "x" and e.lineage == ("A",)


def test_constructors():
    op = parse1("B = FOREACH A GENERATE (f1, f2), {f1, f2}, [name, f1];")
    assert isinstance(op.gens[0].expr, A.TupleCons)
    assert isinstance(op.gens[1].expr, A.BagCons)
    assert isinstance(op.gens[2].expr, A.MapCons)


def test_macro_def_and_call():
    ops = P.parse(
        "DEFINE my_macro($a, $b) RETURNS c { $c = FILTER $a BY f1 > $b; };\n"
        "X = my_macro(A, 42);"
    )
    assert isinstance(ops[0], A.DefineMacro)
    assert isinstance(ops[1], A.MacroCall)


def test_params_substitution():
    ops = P.parse("A = LOAD '$input' ;", params={"input": "f.csv"})
    assert ops[0].path == "f.csv"


def test_declare():
    ops = P.parse("%declare infile 'x.csv';\nA = LOAD '$infile';")
    assert ops[0].path == "x.csv"


def test_comments_case():
    ops = P.parse("-- comment\na = LoAd 'f'; /* multi\nline */ DUMP a;")
    assert len(ops) == 2


def test_streaming_stmts():
    ops = P.parse(
        "A = SOCKET_READ 'localhost:9999' AS (x:int);\n"
        "W = WINDOW A RANGE 10 SECONDS SLIDE RANGE 5 SECONDS;\n"
        "SOCKET_WRITE W TO 'localhost:9998';"
    )
    assert isinstance(ops[0], A.SocketRead) and ops[0].port == 9999
    assert isinstance(ops[1], A.Window) and ops[1].size == (10, "SECONDS")
    assert isinstance(ops[2], A.SocketWrite)


def test_accumulate_zip():
    a = parse1("B = ACCUMULATE A GENERATE COUNT(f1), MIN(f2);")
    assert isinstance(a, A.Accumulate)
    z = parse1("B = ZIP A WITH INDEX;")
    assert z.with_index


def test_bgp_filter():
    op = parse1('B = BGP_FILTER A BY { ?s <knows> ?o . ?o <age> ?a };')
    assert isinstance(op, A.BGPFilter) and len(op.patterns) == 2
    assert op.patterns[0].subj.name == "?s"


def test_matcher():
    op = parse1(
        "B = MATCH_EVENT A PATTERN SEQ(X, Y) WITH (X: v > 1, Y: v < 0) "
        "WITHIN 30 SECONDS;"
    )
    assert isinstance(op, A.MatchEvent)
    assert op.pattern[0] == "seq" and op.within == (30, "SECONDS")


def test_bincond():
    op = parse1("B = FOREACH A GENERATE (x > 1 ? 'hi' : 'lo') AS lvl;")
    e = op.gens[0].expr
    assert isinstance(e, A.BinCond)
    assert isinstance(e.cond, A.Cmp) and e.cond.op == ">"
    assert e.then.value == "hi" and e.els.value == "lo"
    # right-associative nesting
    op2 = parse1("B = FOREACH A GENERATE (x > 2 ? 1 : x > 1 ? 2 : 3) AS v;")
    inner = op2.gens[0].expr.els
    assert isinstance(inner, A.BinCond) and inner.then.value == 2


def test_unterminated_constructs_raise_not_hang():
    """r05: advance() past EOF raises ParseError — 'fs' missing its
    ';' and an unclosed IRI used to loop forever."""
    for bad in ["fs -rm '/x'", "b = bgp_filter a by { <http://x",
                "A = LOAD 'f' AS (x:int"]:
        with pytest.raises(P.ParseError):
            P.parse(bad, {})


def test_numeric_operand_errors_are_parse_errors():
    """r05: malformed numeric operands raise ParseError with a line
    number, not a raw ValueError."""
    for bad in ["socket_write a to 'localhost';",
                "w = WINDOW a ROWS x;",
                "v = VISUALIZE a BY loc SIZE w, 10 INTO 'p';"]:
        with pytest.raises(P.ParseError):
            P.parse(bad, {})


def test_negative_threshold_parses():
    """r05: the lexer splits '-0.5' into two tokens; float_tok
    reassembles the sign."""
    ops = P.parse(
        "N = NEARDUP A ON e BY id THRESHOLD -0.5 USING 'embedding';", {})
    assert ops[0].threshold == -0.5
