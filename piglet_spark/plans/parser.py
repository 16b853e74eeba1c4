"""Pig Latin parser: tokenizer + recursive descent → list[Op].

Grammar parity with the reference parser
(/root/reference/src/main/scala/dbis/piglet/parser/PigParser.scala):
case-insensitive keywords, `--` and `/* */` comments, `$param`
placeholders substituted textually before parsing
(ref codegen/PigletCompiler.scala:201-213).

Implementation is a fresh hand-written parser (the reference uses Scala
parser combinators).
"""

from __future__ import annotations

import re
from typing import Any, Optional

from . import ast as A

# ---------------------------------------------------------------- lexer

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*|/\*.*?\*/)
  | (?P<embed><%.*?%>)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<num>\d+\.\d+([eE][-+]?\d+)?[fF]?|\d+[lLfF]?|\.\d+)
  | (?P<pos>\$\d+)
  | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<id>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<=|>=|::|\#|[-+*/%()\[\]{},;.<>=!?:])
""",
    re.VERBOSE | re.DOTALL,
)

class Token:
    __slots__ = ("kind", "text", "pos", "line")

    def __init__(self, kind: str, text: str, pos: int, line: int):
        self.kind = kind
        self.text = text
        self.pos = pos
        self.line = line

    def __repr__(self):
        return f"Token({self.kind},{self.text!r})"


class ParseError(Exception):
    pass


def tokenize(src: str) -> list[Token]:
    toks: list[Token] = []
    i, line = 0, 1
    n = len(src)
    while i < n:
        m = TOKEN_RE.match(src, i)
        if not m:
            raise ParseError(f"line {line}: unexpected character {src[i]!r}")
        kind = m.lastgroup
        text = m.group()
        line += text.count("\n")
        i = m.end()
        if kind in ("ws", "comment"):
            continue
        toks.append(Token(kind, text, m.start(), line))
    toks.append(Token("eof", "", n, line))
    return toks


def unquote(s: str) -> str:
    body = s[1:-1]  # strips matching ' or " quotes
    return re.sub(
        r"\\(.)",
        lambda m: {"n": "\n", "t": "\t", "r": "\r", "\\": "\\",
                   "'": "'", '"': '"'}.get(m.group(1), m.group(1)),
        body,
    )


PRIMITIVE_TYPES = {
    "int", "long", "float", "double", "boolean", "chararray", "bytearray",
    "datetime", "biginteger", "bigdecimal",
}


class Parser:
    def __init__(self, src: str, params: Optional[dict[str, str]] = None):
        src = substitute_params(src, params or {})
        self.toks = tokenize(src)
        self.i = 0

    # ------------------------------------------------------- utilities

    @property
    def cur(self) -> Token:
        return self.toks[self.i]

    def peek(self, k: int = 1) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def advance(self) -> Token:
        t = self.toks[self.i]
        if t.kind != "eof":
            self.i += 1
        else:
            # consuming past EOF means a construct is unterminated —
            # raising here turns what used to be an INFINITE LOOP
            # (every `while not self.at(X): ... advance()` scan, e.g.
            # `fs` missing its ';' or an unclosed IRI '<http://x')
            # into a clear error (r05 review; hang reproduced)
            raise ParseError(
                f"line {t.line}: unexpected end of input "
                f"(unterminated statement or bracket)")
        return t

    def int_tok(self) -> int:
        """Integer operand with a proper ParseError (r05: raw int()
        leaked ValueError with no line number)."""
        t = self.advance()
        try:
            return int(t.text)
        except ValueError:
            raise ParseError(
                f"line {t.line}: expected an integer, "
                f"got {t.text!r}") from None

    def float_tok(self) -> float:
        """Numeric operand; also accepts a leading '-' (the lexer
        splits '-0.5' into two tokens, so negative thresholds were
        unparseable, r05)."""
        t = self.advance()
        neg = False
        if t.kind != "str" and t.text == "-":
            neg, t = True, self.advance()
        try:
            v = float(t.text)
        except ValueError:
            raise ParseError(
                f"line {t.line}: expected a number, "
                f"got {t.text!r}") from None
        return -v if neg else v

    def at_kw(self, *kws: str) -> bool:
        t = self.cur
        return t.kind == "id" and t.text.lower() in kws

    def eat_kw(self, *kws: str) -> str:
        if not self.at_kw(*kws):
            raise ParseError(
                f"line {self.cur.line}: expected {'/'.join(kws).upper()}, got {self.cur.text!r}"
            )
        return self.advance().text.lower()

    def try_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.advance()
            return True
        return False

    def at(self, text: str) -> bool:
        return self.cur.text == text and self.cur.kind == "op"

    def eat(self, text: str) -> Token:
        if not self.at(text):
            raise ParseError(
                f"line {self.cur.line}: expected {text!r}, got {self.cur.text!r}"
            )
        return self.advance()

    def try_eat(self, text: str) -> bool:
        if self.at(text):
            self.advance()
            return True
        return False

    def ident(self) -> str:
        t = self.cur
        # `$name` params stand in for aliases inside macro bodies;
        # resolved at expansion time (rewrite.expand_macros)
        if t.kind not in ("id", "param"):
            raise ParseError(f"line {t.line}: expected identifier, got {t.text!r}")
        return self.advance().text

    def string(self) -> str:
        t = self.cur
        if t.kind != "str":
            raise ParseError(f"line {t.line}: expected string literal, got {t.text!r}")
        return unquote(self.advance().text)

    # --------------------------------------------------------- script

    def parse_script(self) -> list[A.Op]:
        ops: list[A.Op] = []
        while self.cur.kind != "eof":
            if self.try_eat(";"):  # tolerate stray semicolons
                continue
            if self.cur.kind == "embed":
                code = self.cur.text[2:-2]
                self.advance()
                ops.append(A.EmbedCmd(code=code))
                self.try_eat(";")
                continue
            op = self.parse_statement()
            if op is not None:
                ops.append(op)
        return ops

    def parse_statement(self) -> Optional[A.Op]:
        t = self.cur
        if t.kind == "param":
            # `$r = <op>` inside a macro body
            alias = self.advance().text
            self.eat("=")
            op = self.parse_operator(alias)
            self.eat(";")
            return op
        if t.kind != "id":
            raise ParseError(f"line {t.line}: expected statement, got {t.text!r}")
        kw = t.text.lower()
        if kw == "dump":
            self.advance()
            rel = self.ident()
            self.eat(";")
            return A.Dump(rel=rel)
        if kw == "display":
            self.advance()
            rel = self.ident()
            self.eat(";")
            return A.Display(rel=rel)
        if kw == "describe":
            self.advance()
            rel = self.ident()
            self.eat(";")
            return A.Describe(rel=rel)
        if kw == "explain":
            self.advance()
            rel = self.ident()
            mode = "formatted"
            if self.cur.kind == "str":
                mode = self.string()
            self.eat(";")
            return A.Explain(rel=rel, mode=mode)
        if kw == "store":
            self.advance()
            rel = self.ident()
            self.eat_kw("into")
            path = self.string()
            func, fargs = None, []
            if self.try_kw("using"):
                func, fargs = self.parse_storage_func()
            self.eat(";")
            return A.Store(rel=rel, path=path, func=func, func_args=fargs)
        if kw == "assert":
            # classic-Pig ASSERT (beyond the reference grammar):
            # ASSERT A BY cond [, 'message'];
            self.advance()
            rel = self.ident()
            self.eat_kw("by")
            pred = self.parse_predicate()
            msg = None
            if self.try_eat(","):
                msg = self.string()
            self.eat(";")
            return A.Assert(rel=rel, pred=pred, message=msg)
        if kw == "split":
            self.advance()
            rel = self.ident()
            self.eat_kw("into")
            branches = []
            while True:
                out = self.ident()
                # classic-Pig OTHERWISE (beyond the reference grammar):
                # rows that match NO other branch (null conds included,
                # per Pig semantics)
                if self.try_kw("otherwise"):
                    branches.append(A.SplitBranch(out=out, pred=None))
                else:
                    self.eat_kw("if")
                    pred = self.parse_predicate()
                    branches.append(A.SplitBranch(out=out, pred=pred))
                if not self.try_eat(","):
                    break
            self.eat(";")
            return A.SplitInto(rel=rel, branches=branches)
        if kw == "register":
            self.advance()
            path = self.string()
            self.eat(";")
            return A.Register(path=path)
        if kw == "set":
            self.advance()
            key = self.ident()
            while self.try_eat("."):
                key += "." + self.ident()
            if self.cur.kind == "str":
                val: Any = self.string()
            elif self.cur.kind == "num":
                val = parse_number(self.advance().text).value
            else:
                val = self.ident()
            self.eat(";")
            return A.SetCmd(key=key, value=val)
        if kw == "define":
            return self.parse_define()
        if kw == "materialize":
            self.advance()
            rel = self.ident()
            self.eat(";")
            return A.Materialize(rel=rel)
        if kw == "visualize":
            self.advance()
            rel = self.ident()
            self.eat_kw("by")
            ref = self.parse_ref()
            self.eat_kw("into")
            path = self.string()
            w, h = 800, 600
            if self.try_kw("as"):
                self.eat("(")
                w = self.int_tok()
                self.eat(",")
                h = self.int_tok()
                self.eat(")")
            self.eat(";")
            return A.Visualize(rel=rel, field_ref=ref, path=path,
                               width=w, height=h)
        if kw == "fs":
            # fs -cmd 'arg' 'arg';  (quoted args; HdfsCmd.scala:28)
            self.advance()
            self.eat("-")
            cmd = self.ident()
            args = []
            while not self.at(";"):
                if self.cur.kind != "str" and self.cur.text == "-":
                    # flag like `-r` in `fs -rm -r '/x'` — keep it as
                    # one token so the hadoop passthrough (and local
                    # handlers) see '-r', not '-', 'r'
                    self.advance()
                    args.append("-" + self.advance().text)
                else:
                    args.append(self.string() if self.cur.kind == "str"
                                else self.advance().text)
            self.eat(";")
            return A.HdfsCmd(cmd=cmd, args=args)
        if kw == "socket_write":
            self.advance()
            rel = self.ident()
            self.eat_kw("to")
            addr = self.string()
            mode = ""
            if self.try_kw("mode"):
                mode = self.ident().lower()
            self.eat(";")
            host, _, port = addr.rpartition(":")
            if not port.isdigit():
                raise ParseError(
                    f"SOCKET_WRITE address must be 'host:port', got {addr!r}")
            return A.SocketWrite(rel=rel, host=host, port=int(port), mode=mode)
        if kw == "import":
            # IMPORT is textually resolved before parsing
            # (resolve_imports, own-line statements only); reaching the
            # parser means it was not inlined — fail loudly instead of
            # silently dropping the include
            self.advance()
            path = self.string()
            self.eat(";")
            raise ParseError(
                f"IMPORT {path!r} was not resolved — IMPORT must be a "
                f"statement on its own line")
        # otherwise: alias = <operator>
        alias = self.ident()
        self.eat("=")
        op = self.parse_operator(alias)
        self.eat(";")
        return op

    def parse_define(self) -> A.Op:
        self.eat_kw("define")
        name = self.ident()
        if self.at("("):
            # macro: DEFINE m(a, b) RETURNS r { ... };
            self.eat("(")
            params = []
            if not self.at(")"):
                while True:
                    p = self.advance().text
                    params.append(p.lstrip("$"))
                    if not self.try_eat(","):
                        break
            self.eat(")")
            self.eat_kw("returns")
            ret = self.advance().text.lstrip("$")
            self.eat("{")
            body: list[A.Op] = []
            while not self.at("}"):
                st = self.parse_statement()
                if st:
                    body.append(st)
            self.eat("}")
            self.eat(";")
            return A.DefineMacro(name=name, params=params, returns=ret, body=body)
        # alias: DEFINE alias pkg.Func(args);
        func = self.ident()
        while self.try_eat("."):
            func += "." + self.ident()
        args: list[Any] = []
        if self.try_eat("("):
            while not self.at(")"):
                args.append(self.parse_literal_arg())
                if not self.try_eat(","):
                    break
            self.eat(")")
        self.eat(";")
        return A.DefineAlias(alias=name, func=func, args=args)

    # ------------------------------------------------------ operators

    def parse_operator(self, alias: str) -> A.Op:
        kw = self.cur.text.lower() if self.cur.kind == "id" else ""
        meth = getattr(self, f"op_{kw}", None)
        if meth is not None:
            return meth(alias)
        # macro call or bare alias copy:  X = m(args);  /  X = Y;
        name = self.ident()
        if self.try_eat("("):
            args = []
            while not self.at(")"):
                args.append(self.parse_expr())
                if not self.try_eat(","):
                    break
            self.eat(")")
            return A.MacroCall(out=alias, name=name, args=args)
        # alias copy → FOREACH name GENERATE *
        return A.Foreach(out=alias, rel=name, gens=[A.GenExpr(expr=A.Star())])

    def parse_storage_func(self) -> tuple[str, list[Any]]:
        func = self.ident()
        while self.try_eat("."):
            func += "." + self.ident()
        args: list[Any] = []
        if self.try_eat("("):
            while not self.at(")"):
                args.append(self.parse_literal_arg())
                if not self.try_eat(","):
                    break
            self.eat(")")
        return func, args

    def parse_literal_arg(self) -> Any:
        t = self.cur
        if t.kind == "str":
            return self.string()
        if t.kind == "num":
            return parse_number(self.advance().text).value
        if t.kind == "id" and t.text.lower() in ("true", "false"):
            return self.advance().text.lower() == "true"
        tok = self.advance().text
        if self.try_eat("="):  # k=v option args, e.g. rtree(order=2)
            return f"{tok}={self.parse_literal_arg()}"
        return tok

    def op_load(self, alias: str) -> A.Op:
        self.eat_kw("load")
        path = self.string()
        func, fargs, schema, ts = None, [], None, None
        if self.try_kw("using"):
            func, fargs = self.parse_storage_func()
        if self.try_kw("as"):
            schema = self.parse_tuple_decl()
        if self.try_kw("timestamp"):
            self.eat("(")
            ts = self.parse_ref()
            self.eat(")")
        return A.Load(out=alias, path=path, func=func, func_args=fargs,
                      schema=schema, timestamp_field=ts)

    def op_rdfload(self, alias: str) -> A.Op:
        self.eat_kw("rdfload")
        self.eat("(")
        path = self.string()
        self.eat(")")
        grouped = None
        if self.try_kw("grouped"):
            self.eat_kw("on")
            grouped = self.ident().lower()
        return A.RDFLoad(out=alias, path=path, grouped=grouped)

    def op_filter(self, alias: str) -> A.Op:
        self.eat_kw("filter")
        rel = self.ident()
        self.eat_kw("by")
        pred = self.parse_predicate()
        return A.Filter(out=alias, rel=rel, pred=pred)

    def op_foreach(self, alias: str) -> A.Op:
        self.eat_kw("foreach")
        rel = self.ident()
        if self.try_eat("{"):
            body: list[A.Op] = []
            while not self.at("}"):
                body.append(self.parse_nested_statement())
            self.eat("}")
            gens = []
            for op in body:
                if isinstance(op, A.Generate):
                    gens = op.gens
            nested = [op for op in body if not isinstance(op, A.Generate)]
            return A.Foreach(out=alias, rel=rel, gens=gens, nested_ops=nested)
        self.eat_kw("generate")
        gens = self.parse_generate_list()
        return A.Foreach(out=alias, rel=rel, gens=gens)

    def parse_nested_statement(self) -> A.Op:
        if self.at_kw("generate"):
            self.eat_kw("generate")
            gens = self.parse_generate_list()
            self.eat(";")
            return A.Generate(gens=gens)
        out = self.ident()
        self.eat("=")
        kw = self.cur.text.lower() if self.cur.kind == "id" else ""
        if kw == "distinct":
            self.advance()
            src = self.parse_expr()
            self.eat(";")
            return A.NestedAssign(out=out, expr=("distinct", src))
        if kw == "filter":
            self.advance()
            src = self.parse_expr()
            self.eat_kw("by")
            pred = self.parse_predicate()
            self.eat(";")
            return A.NestedAssign(out=out, expr=("filter", src, pred))
        if kw == "limit":
            self.advance()
            src = self.parse_expr()
            n = self.parse_expr()
            self.eat(";")
            return A.NestedAssign(out=out, expr=("limit", src, n))
        if kw == "order":
            self.advance()
            src = self.parse_expr()
            self.eat_kw("by")
            specs = []
            while True:
                f = self.parse_ref()
                asc = True
                if self.at_kw("asc", "desc"):
                    asc = self.advance().text.lower() == "asc"
                specs.append(A.OrderSpec(field=f, asc=asc))
                if not self.try_eat(","):
                    break
            self.eat(";")
            return A.NestedAssign(out=out, expr=("order", src, specs))
        # X = A.col / X = A  (bag projection, ref PigParser.scala:457-459)
        expr = self.parse_expr()
        self.eat(";")
        return A.NestedAssign(out=out, expr=expr)

    def parse_generate_list(self) -> list[A.GenExpr]:
        gens = []
        while True:
            gens.append(self.parse_gen_expr())
            if not self.try_eat(","):
                break
        return gens

    def parse_gen_expr(self) -> A.GenExpr:
        flatten = False
        if self.at_kw("flatten"):
            self.advance()
            self.eat("(")
            expr = self.parse_expr()
            self.eat(")")
            flatten = True
        else:
            expr = self.parse_expr()
        alias, ptype = None, None
        if self.try_kw("as"):
            if self.at("("):
                decl = self.parse_tuple_decl()
                if len(decl.fields) == 1:
                    alias, ptype = decl.fields[0].name, decl.fields[0].pig_type
                else:
                    ptype = decl
            else:
                alias = self.ident()
                if self.try_eat(":"):
                    ptype = self.parse_type()
        return A.GenExpr(expr=expr, alias=alias, pig_type=ptype, flatten=flatten)

    def op_group(self, alias: str) -> A.Op:
        self.eat_kw("group")
        rel = self.ident()
        if self.try_kw("all"):
            return A.Group(out=alias, rel=rel, keys=[])
        self.eat_kw("by")
        keys = self.parse_key_list()
        return A.Group(out=alias, rel=rel, keys=keys)

    def op_cogroup(self, alias: str) -> A.Op:
        self.eat_kw("cogroup")
        rels, keys = self.parse_rel_key_pairs()
        return A.CoGroup(out=alias, rels=rels, keys=keys)

    def parse_key_list(self) -> list[A.Expr]:
        if self.try_eat("("):
            keys = []
            while True:
                keys.append(self.parse_expr())
                if not self.try_eat(","):
                    break
            self.eat(")")
            return keys
        return [self.parse_expr()]

    def parse_rel_key_pairs(self) -> tuple[list[str], list[list[A.Expr]]]:
        rels, keys = [], []
        while True:
            rels.append(self.ident())
            self.eat_kw("by")
            keys.append(self.parse_key_list())
            if not self.try_eat(","):
                break
        return rels, keys

    def op_join(self, alias: str) -> A.Op:
        self.eat_kw("join")
        rels, keys = self.parse_rel_key_pairs()
        window, strategy = None, None
        for _ in range(2):  # USING and WINDOW in either order
            if self.try_kw("using"):
                strategy = self.string()
            if self.try_kw("window"):
                n = self.int_tok()
                unit = self.ident().upper()
                window = (n, unit)
        return A.Join(out=alias, rels=rels, keys=keys, window=window,
                      strategy=strategy)

    def op_cross(self, alias: str) -> A.Op:
        self.eat_kw("cross")
        rels = [self.ident()]
        while self.try_eat(","):
            rels.append(self.ident())
        return A.Cross(out=alias, rels=rels)

    def op_distinct(self, alias: str) -> A.Op:
        self.eat_kw("distinct")
        rel = self.ident()
        return A.Distinct(out=alias, rel=rel)

    def op_limit(self, alias: str) -> A.Op:
        self.eat_kw("limit")
        rel = self.ident()
        n = self.parse_expr()
        return A.Limit(out=alias, rel=rel, n=n)

    def op_order(self, alias: str) -> A.Op:
        self.eat_kw("order")
        rel = self.ident()
        self.eat_kw("by")
        if self.try_eat("*"):
            asc = True
            if self.at_kw("asc", "desc"):
                asc = self.advance().text.lower() == "asc"
            return A.OrderBy(out=alias, rel=rel, specs=[], star_asc=asc)
        specs = []
        while True:
            f = self.parse_ref()
            asc = True
            if self.at_kw("asc", "desc"):
                asc = self.advance().text.lower() == "asc"
            specs.append(A.OrderSpec(field=f, asc=asc))
            if not self.try_eat(","):
                break
        return A.OrderBy(out=alias, rel=rel, specs=specs)

    def op_cube(self, alias: str) -> A.Op:
        # CUBE A BY CUBE(f1, f2);  /  CUBE A BY ROLLUP(f1, f2);
        self.eat_kw("cube")
        rel = self.ident()
        self.eat_kw("by")
        kind = self.ident().lower()
        if kind not in ("cube", "rollup"):
            raise ParseError(
                f"line {self.cur.line}: CUBE ... BY expects CUBE(...) or "
                f"ROLLUP(...), got {kind!r}")
        self.eat("(")
        keys = [self.parse_ref()]
        while self.try_eat(","):
            keys.append(self.parse_ref())
        self.eat(")")
        if self.try_eat(","):
            raise ParseError(
                f"line {self.cur.line}: mixed CUBE/ROLLUP clauses are not "
                f"supported — use the SQL statement (GROUP BY GROUPING "
                f"SETS) for combined sets")
        return A.Cube(out=alias, rel=rel, keys=keys,
                      rollup=(kind == "rollup"))

    def op_rank(self, alias: str) -> A.Op:
        # RANK A [BY f [ASC|DESC], ... [DENSE]];  (classic Pig)
        self.eat_kw("rank")
        rel = self.ident()
        specs: list[A.OrderSpec] = []
        dense = False
        if self.try_kw("by"):
            while True:
                f = self.parse_ref()
                asc = True
                if self.at_kw("asc", "desc"):
                    asc = self.advance().text.lower() == "asc"
                specs.append(A.OrderSpec(field=f, asc=asc))
                if not self.try_eat(","):
                    break
            dense = self.try_kw("dense")
        return A.Rank(out=alias, rel=rel, specs=specs, dense=dense)

    def op_sample(self, alias: str) -> A.Op:
        self.eat_kw("sample")
        rel = self.ident()
        frac = self.parse_expr()
        # `SAMPLE A f SEED n` (classic-Pig-adjacent extension):
        # deterministic hash-threshold sampling, reproducible across
        # runs and engines — without SEED it is Spark's Bernoulli
        seed = self.parse_expr() if self.try_kw("seed") else None
        return A.Sample(out=alias, rel=rel, fraction=frac, seed=seed)

    def op_union(self, alias: str) -> A.Op:
        self.eat_kw("union")
        # classic-Pig ONSCHEMA (beyond the reference grammar): merge
        # by column NAME, null-filling columns missing on a side
        onschema = self.try_kw("onschema")
        rels = [self.ident()]
        while self.try_eat(","):
            rels.append(self.ident())
        return A.Union(out=alias, rels=rels, onschema=onschema)

    def op_intersection(self, alias: str) -> A.Op:
        self.eat_kw("intersection")
        rels = [self.ident()]
        while self.try_eat(","):
            rels.append(self.ident())
        return A.Intersection(out=alias, rels=rels)

    def op_difference(self, alias: str) -> A.Op:
        self.eat_kw("difference")
        first = self.ident()
        if self.try_kw("by"):
            k1 = self.parse_key_list()
            self.eat(",")
            second = self.ident()
            self.eat_kw("by")
            k2 = self.parse_key_list()
            return A.Difference(out=alias, rels=[first, second], keys=[k1, k2])
        self.eat(",")
        second = self.ident()
        return A.Difference(out=alias, rels=[first, second])

    def op_accumulate(self, alias: str) -> A.Op:
        self.eat_kw("accumulate")
        rel = self.ident()
        self.eat_kw("generate")
        gens = self.parse_generate_list()
        return A.Accumulate(out=alias, rel=rel, gens=gens)

    def op_zip(self, alias: str) -> A.Op:
        self.eat_kw("zip")
        first = self.ident()
        self.eat_kw("with")
        if self.try_kw("index"):
            return A.Zip(out=alias, rels=[first], with_index=True)
        rels = [first, self.ident()]
        while self.try_eat(","):
            rels.append(self.ident())
        return A.Zip(out=alias, rels=rels)

    def op_stream(self, alias: str) -> A.Op:
        self.eat_kw("stream")
        rel = self.ident()
        self.eat_kw("through")
        name = self.ident()
        params: list[Any] = []
        if self.try_eat("("):
            while not self.at(")"):
                params.append(self.parse_literal_arg())
                if not self.try_eat(","):
                    break
            self.eat(")")
        schema = None
        if self.try_kw("as"):
            schema = self.parse_tuple_decl()
        return A.StreamOp(out=alias, rel=rel, op_name=name, params=params, schema=schema)

    def op_cache(self, alias: str) -> A.Op:
        self.eat_kw("cache")
        rel = self.ident()
        level = "MEMORY_AND_DISK"
        if self.cur.kind == "id" and not self.at(";"):
            level = self.ident().upper()
        return A.Cache(out=alias, rel=rel, level=level)

    def op_spatial_filter(self, alias: str) -> A.Op:
        self.eat_kw("spatial_filter")
        rel = self.ident()
        self.eat_kw("by")
        pred = self.parse_predicate()
        index = None
        if self.try_kw("using"):
            self.eat_kw("index")
            name, args = self.parse_storage_func()
            index = (name.lower(), args)
        return A.SpatialFilter(out=alias, rel=rel, pred=pred, index=index)

    def op_spatial_join(self, alias: str) -> A.Op:
        self.eat_kw("spatial_join")
        rels, parts = [], []
        while True:
            rels.append(self.ident())
            part = None
            if self.try_kw("partition"):
                self.eat_kw("by")
                part = self.parse_storage_func()
            parts.append(part)
            if not self.try_eat(","):
                break
        self.eat_kw("on")
        pred = self.parse_predicate()
        index = None
        if self.try_kw("using"):
            self.eat_kw("index")
            name, args = self.parse_storage_func()
            index = (name.lower(), args)
        return A.SpatialJoin(out=alias, rels=rels, pred=pred,
                             partitioners=parts, index=index)

    def op_partition(self, alias: str) -> A.Op:
        self.eat_kw("partition")
        rel = self.ident()
        self.eat_kw("on")
        on = self.parse_ref()
        scheme, args = "", []
        if self.try_kw("using"):
            scheme, args = self.parse_storage_func()
        return A.Partition(out=alias, rel=rel, on=on,
                           scheme=scheme.lower(), args=args)

    def op_index(self, alias: str) -> A.Op:
        self.eat_kw("index")
        rel = self.ident()
        self.eat_kw("on")
        on = self.parse_ref()
        method, args = "rtree", []
        if self.try_kw("using"):
            method, args = self.parse_storage_func()
        return A.IndexOp(out=alias, rel=rel, on=on,
                         method=method.lower(), args=args)

    def op_delay(self, alias: str) -> A.Op:
        self.eat_kw("delay")
        rel = self.ident()
        self.eat_kw("by")
        self.eat("(")
        # reference argument order (PigParser.scala:1041): wait time
        # FIRST (ms int or ISO-8601 duration string), sample factor
        # second
        wtime = self.parse_expr()
        self.eat(",")
        sample = self.parse_expr()
        self.eat(")")
        return A.Delay(out=alias, rel=rel, wtime=wtime, sample=sample)

    def op_rscript(self, alias: str) -> A.Op:
        self.eat_kw("rscript")
        rel = self.ident()
        self.eat_kw("using")
        code = self.string()
        return A.RScript(out=alias, rel=rel, code=code)

    def op_sql(self, alias: str) -> A.Op:
        self.eat_kw("sql")
        query = self.string()
        return A.SqlStmt(out=alias, query=query)

    def op_dedup(self, alias: str) -> A.Op:
        self.eat_kw("dedup")
        rel = self.ident()
        keys: list[A.Expr] = []
        if self.try_kw("on"):
            while True:
                keys.append(self.parse_ref())
                if not self.try_eat(","):
                    break
        return A.Dedup(out=alias, rel=rel, keys=keys)

    def op_neardup(self, alias: str) -> A.Op:
        self.eat_kw("neardup")
        rel = self.ident()
        self.eat_kw("on")
        on = self.parse_ref()
        id_field = None
        if self.try_kw("by"):
            id_field = self.parse_ref()
        threshold = 0.5
        if self.try_kw("threshold"):
            threshold = self.float_tok()
        method = "minhash"
        if self.try_kw("using"):
            method = self.string().lower()
        cluster = self.try_kw("cluster")
        return A.NearDup(out=alias, rel=rel, on=on, id_field=id_field,
                         threshold=threshold, cluster=cluster,
                         method=method)

    def op_tuplify(self, alias: str) -> A.Op:
        self.eat_kw("tuplify")
        rel = self.ident()
        self.eat_kw("on")
        on = self.parse_ref()
        return A.Tuplify(out=alias, rel=rel, on=on)

    def op_bgp_filter(self, alias: str) -> A.Op:
        self.eat_kw("bgp_filter")
        rel = self.ident()
        self.eat_kw("by")
        self.eat("{")
        patterns = []
        while not self.at("}"):
            s = self.parse_bgp_term()
            p = self.parse_bgp_term()
            o = self.parse_bgp_term()
            patterns.append(A.TriplePattern(subj=s, pred=p, obj=o))
            if not self.try_eat("."):
                break
        self.eat("}")
        return A.BGPFilter(out=alias, rel=rel, patterns=patterns)

    def parse_bgp_term(self) -> A.Expr:
        if self.try_eat("?"):
            return A.NamedField(name="?" + self.ident())
        if self.cur.kind == "str":
            return A.Literal(value=self.string(), pig_type="chararray")
        if self.at("<"):  # IRI <...>
            self.eat("<")
            parts = []
            while not self.at(">"):
                parts.append(self.advance().text)
            self.eat(">")
            return A.Literal(value="<" + "".join(parts) + ">", pig_type="chararray")
        return A.Literal(value=self.advance().text, pig_type="chararray")

    def op_socket_read(self, alias: str) -> A.Op:
        self.eat_kw("socket_read")
        addr = self.string()
        mode = ""
        if self.try_kw("mode"):
            mode = self.ident().lower()
        func, fargs, schema, ts = None, [], None, None
        if self.try_kw("using"):
            func, fargs = self.parse_storage_func()
        if self.try_kw("as"):
            schema = self.parse_tuple_decl()
        if self.try_kw("timestamp"):
            self.eat("(")
            ts = self.parse_ref()
            self.eat(")")
        host, _, port = addr.rpartition(":")
        if not port.isdigit():
            raise ParseError(
                f"SOCKET_READ address must be 'host:port', got {addr!r}")
        return A.SocketRead(out=alias, host=host, port=int(port), mode=mode,
                            func=func, func_args=fargs, schema=schema,
                            timestamp_field=ts)

    def op_window(self, alias: str) -> A.Op:
        self.eat_kw("window")
        rel = self.ident()
        size = self.parse_window_spec()
        slide = None
        if self.try_kw("slide"):
            slide = self.parse_window_spec()
        # `WINDOW A ROWS n [SLIDE ROWS m] PARTITION BY k` — keyed
        # count windows (Flink keyed countWindow): per-key arrival
        # order, windows fire independently per key, distributed
        partition = None
        if self.try_kw("partition"):
            self.eat_kw("by")
            partition = self.ident()
        return A.Window(out=alias, rel=rel, size=size, slide=slide,
                        partition=partition)

    def parse_window_spec(self) -> tuple[int, str]:
        if self.try_kw("range"):
            n = self.int_tok()
            unit = self.ident().upper()
            return (n, unit)
        self.eat_kw("rows")
        n = self.int_tok()
        return (n, "ROWS")

    def op_match_event(self, alias: str) -> A.Op:
        self.eat_kw("match_event")
        rel = self.ident()
        self.eat_kw("pattern")
        pattern = self.parse_cep_pattern()
        definitions: dict[str, A.Expr] = {}
        if self.try_kw("with"):
            self.eat("(")
            while True:
                name = self.ident()
                self.eat(":")
                definitions[name] = self.parse_predicate()
                if not self.try_eat(","):
                    break
            self.eat(")")
        # MODE and WITHIN accepted in either order (r05)
        mode = "skip_till_next_match"
        within = None
        while True:
            if self.try_kw("mode"):
                mode = self.ident().lower()
            elif self.try_kw("within"):
                n = self.int_tok()
                unit = self.ident().upper()
                within = (n, unit)
            else:
                break
        return A.MatchEvent(out=alias, rel=rel, pattern=pattern,
                            definitions=definitions, mode=mode, within=within)

    def parse_cep_pattern(self) -> Any:
        name = self.ident()
        lname = name.lower()
        if lname in ("seq", "and", "or", "neg") and self.at("("):
            self.eat("(")
            children = [self.parse_cep_pattern()]
            while self.try_eat(","):
                children.append(self.parse_cep_pattern())
            self.eat(")")
            return (lname, children)
        return ("event", name)

    # -------------------------------------------------------- schemas

    def parse_tuple_decl(self) -> A.TupleDecl:
        self.eat("(")
        fields = []
        while not self.at(")"):
            fields.append(self.parse_field_decl())
            if not self.try_eat(","):
                break
        self.eat(")")
        return A.TupleDecl(fields=fields)

    def parse_field_decl(self) -> A.FieldDecl:
        name = self.ident()
        ptype: Any = "bytearray"
        if self.try_eat(":"):
            ptype = self.parse_type()
        return A.FieldDecl(name=name, pig_type=ptype)

    def parse_type(self) -> Any:
        t = self.cur
        if t.kind == "id":
            low = t.text.lower()
            if low in PRIMITIVE_TYPES:
                self.advance()
                return low
            if low == "tuple":
                self.advance()
                return A.TupleDecl() if not self.at("(") else self.parse_tuple_decl()
            if low == "bag":
                self.advance()
                if self.try_eat("{"):
                    # bag{tuple(...)} | bag{(...)} | bag{name: tuple(...)}
                    inner = A.TupleDecl()
                    if self.at_kw("tuple"):
                        self.advance()
                        inner = self.parse_tuple_decl()
                    elif self.at("("):
                        inner = self.parse_tuple_decl()
                    elif self.cur.kind == "id":
                        self.ident()
                        self.try_eat(":")
                        if self.at_kw("tuple"):
                            self.advance()
                        inner = self.parse_tuple_decl()
                    self.eat("}")
                    return A.BagDecl(tuple_decl=inner)
                return A.BagDecl()
            if low == "map":
                self.advance()
                vt: Any = "bytearray"
                if self.try_eat("["):
                    if not self.at("]"):
                        vt = self.parse_type()
                    self.eat("]")
                return A.MapDecl(value_type=vt)
        if self.at("("):
            return self.parse_tuple_decl()
        if self.at("{"):
            self.eat("{")
            inner = A.TupleDecl()
            if self.at("("):
                inner = self.parse_tuple_decl()
            elif self.at_kw("tuple"):
                self.advance()
                inner = self.parse_tuple_decl()
            self.eat("}")
            return A.BagDecl(tuple_decl=inner)
        if self.at("["):
            self.eat("[")
            vt = "bytearray" if self.at("]") else self.parse_type()
            self.eat("]")
            return A.MapDecl(value_type=vt)
        raise ParseError(f"line {t.line}: expected type, got {t.text!r}")

    # ---------------------------------------------------- expressions

    def parse_predicate(self) -> A.Expr:
        return self.parse_or()

    def parse_or(self) -> A.Expr:
        left = self.parse_and()
        while self.at_kw("or"):
            self.advance()
            left = A.Or(left=left, right=self.parse_and())
        return left

    def parse_and(self) -> A.Expr:
        left = self.parse_not()
        while self.at_kw("and"):
            self.advance()
            left = A.And(left=left, right=self.parse_not())
        return left

    def parse_not(self) -> A.Expr:
        if self.at_kw("not"):
            self.advance()
            return A.Not(expr=self.parse_not())
        return self.parse_cmp()

    def parse_cmp(self) -> A.Expr:
        left = self.parse_add()
        t = self.cur
        if t.kind == "op" and t.text in ("==", "!=", "<", "<=", ">", ">="):
            op = self.advance().text
            right = self.parse_add()
            return A.Cmp(op=op, left=left, right=right)
        if self.at_kw("matches"):
            self.advance()
            right = self.parse_add()
            return A.Cmp(op="matches", left=left, right=right)
        if self.at_kw("is"):
            self.advance()
            negated = self.try_kw("not")
            self.eat_kw("null")
            return A.IsNull(expr=left, negated=negated)
        return left

    # expression entry (allows comparisons so bare predicates work too)
    def parse_expr(self) -> A.Expr:
        e = self.parse_or()
        # classic Pig bincond: pred ? then : else (right-associative)
        if self.at("?"):
            self.advance()
            then = self.parse_expr()
            self.eat(":")
            els = self.parse_expr()
            return A.BinCond(cond=e, then=then, els=els)
        return e

    def parse_add(self) -> A.Expr:
        left = self.parse_mul()
        while self.cur.kind == "op" and self.cur.text in ("+", "-"):
            op = self.advance().text
            left = A.BinOp(op=op, left=left, right=self.parse_mul())
        return left

    def parse_mul(self) -> A.Expr:
        left = self.parse_unary()
        while self.cur.kind == "op" and self.cur.text in ("*", "/", "%"):
            op = self.advance().text
            left = A.BinOp(op=op, left=left, right=self.parse_unary())
        return left

    def parse_unary(self) -> A.Expr:
        if self.at("-"):
            self.advance()
            return A.Neg(expr=self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self) -> A.Expr:
        e = self.parse_primary()
        while True:
            if self.at("."):
                # deref only when followed by a field ref (not a number —
                # numbers already lexed as floats)
                nxt = self.peek()
                if nxt.kind in ("id", "pos") or (nxt.kind == "op" and nxt.text == "$"):
                    self.advance()
                    if self.cur.kind == "pos":
                        f: A.Expr = A.PositionalField(pos=int(self.advance().text[1:]))
                    else:
                        f = A.NamedField(name=self.ident())
                    e = A.DerefTuple(base=e, field=f)
                    continue
                break
            if self.at("#"):
                self.advance()
                key = self.string()
                e = A.DerefMap(base=e, key=key)
                continue
            break
        return e

    def parse_primary(self) -> A.Expr:
        t = self.cur
        if t.kind == "num":
            self.advance()
            return parse_number(t.text)
        if t.kind == "str":
            self.advance()
            return A.Literal(value=unquote(t.text), pig_type="chararray")
        if t.kind == "pos":
            self.advance()
            return A.PositionalField(pos=int(t.text[1:]))
        if t.kind == "param":
            # unresolved $param (inside a macro body) — substituted at
            # macro expansion time (rewrite.py)
            self.advance()
            return A.NamedField(name=t.text)
        if self.at("*"):
            self.advance()
            return A.Star()
        if self.at("("):
            # cast, tuple constructor, or grouping
            if self.is_cast():
                self.eat("(")
                ptype = self.parse_type()
                self.eat(")")
                return A.CastExpr(pig_type=ptype, expr=self.parse_unary())
            self.eat("(")
            first = self.parse_expr()
            if self.try_eat(","):
                exprs = [first]
                while True:
                    exprs.append(self.parse_expr())
                    if not self.try_eat(","):
                        break
                self.eat(")")
                return A.TupleCons(exprs=exprs)
            self.eat(")")
            return first
        if self.at("{"):
            self.eat("{")
            exprs = []
            while not self.at("}"):
                exprs.append(self.parse_expr())
                if not self.try_eat(","):
                    break
            self.eat("}")
            return A.BagCons(exprs=exprs)
        if self.at("["):
            self.eat("[")
            exprs = []
            while not self.at("]"):
                exprs.append(self.parse_expr())
                if not self.try_eat(","):
                    break
            self.eat("]")
            return A.MapCons(exprs=exprs)
        if t.kind == "id":
            low = t.text.lower()
            if low == "true":
                self.advance()
                return A.Literal(value=True, pig_type="boolean")
            if low == "false":
                self.advance()
                return A.Literal(value=False, pig_type="boolean")
            if low == "null":
                self.advance()
                return A.Literal(value=None, pig_type="bytearray")
            if low == "flatten":
                # flatten inside expressions handled by caller; treat as func
                pass
            name = self.ident()
            # lineage-qualified name a::b::c
            lineage: list[str] = []
            while self.at("::"):
                self.advance()
                lineage.append(name)
                name = self.ident()
            if self.at("(") and not lineage:
                self.eat("(")
                args = []
                if self.try_eat("*"):
                    args.append(A.Star())
                else:
                    while not self.at(")"):
                        args.append(self.parse_expr())
                        if not self.try_eat(","):
                            break
                self.eat(")")
                return A.FuncCall(name=name, args=args)
            return A.NamedField(name=name, lineage=tuple(lineage))
        raise ParseError(f"line {t.line}: unexpected token {t.text!r} in expression")

    def is_cast(self) -> bool:
        """Lookahead: `(type)` followed by an operand → cast."""
        if not self.at("("):
            return False
        nxt = self.peek()
        if nxt.kind != "id" or nxt.text.lower() not in PRIMITIVE_TYPES | {"tuple", "bag", "map"}:
            return False
        after = self.peek(2)
        return after.kind == "op" and after.text == ")"

    # ------------------------------------------------------------ refs

    def parse_ref(self) -> A.Expr:
        e = self.parse_postfix()
        return e


def parse_number(text: str) -> A.Literal:
    low = text.lower()
    if low.endswith("l"):
        return A.Literal(value=int(text[:-1]), pig_type="long")
    if low.endswith("f"):
        return A.Literal(value=float(text[:-1]), pig_type="float")
    if "." in text or "e" in low:
        return A.Literal(value=float(text), pig_type="double")
    return A.Literal(value=int(text), pig_type="int")


IMPORT_RE = re.compile(
    r"^\s*import\s+(?:'([^']+)'|\"([^\"]+)\")\s*;\s*$",
    re.IGNORECASE | re.MULTILINE)


def resolve_imports(src: str, base_dir: str = ".",
                    _depth: int = 0) -> str:
    """Textually inline IMPORT'd scripts (ref PigletCompiler resolves
    imports before parsing); paths resolve against base_dir, falling
    back to the path as given."""
    import os
    if _depth > 10:
        raise ParseError("IMPORT nesting too deep (cycle?)")

    def repl(m: re.Match) -> str:
        path = m.group(1) or m.group(2)
        for candidate in (os.path.join(base_dir, path), path):
            if os.path.exists(candidate):
                inner = open(candidate).read()
                return resolve_imports(inner,
                                       os.path.dirname(candidate) or ".",
                                       _depth + 1)
        raise ParseError(f"IMPORT: cannot find {path!r}")

    return IMPORT_RE.sub(repl, src)


PARAM_RE = re.compile(r"\$([A-Za-z_][A-Za-z0-9_]*)")
DECLARE_RE = re.compile(
    r"%declare\s+\$?([A-Za-z_][A-Za-z0-9_]*)\s+('[^']*'|[^;\s]+)\s*;?",
    re.IGNORECASE)


def substitute_params(src: str, params: dict[str, str]) -> str:
    """Textual $param substitution + %DECLARE handling
    (ref PigletCompiler.scala:201-213)."""
    merged = dict(params)

    def collect(m: re.Match) -> str:
        name, val = m.group(1), m.group(2)
        if name not in merged:
            merged[name] = val.strip("'\"")
        return ""

    src = DECLARE_RE.sub(collect, src)
    if not merged:
        return src

    def repl(m: re.Match) -> str:
        return str(merged.get(m.group(1), m.group(0)))

    return PARAM_RE.sub(repl, src)


def parse(src: str, params: Optional[dict[str, str]] = None) -> list[A.Op]:
    return Parser(src, params).parse_script()
