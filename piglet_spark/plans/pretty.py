"""Dataflow-plan pretty printer for the REPL's prettyprint/rewrite
commands (ref PigletREPL.scala:227-255 — handleRewrite prints each
sink's lineage before and after rewriting; handlePrettyPrint prints
the rewritten plan's operator tree, DataflowPlan.printPlan).

The rebuild's plan is the parsed op list itself (no separate logical
tree), so "pretty" here is the operator lineage rendered as an
indented tree from each sink, one node per line:

    STORE(P)
      P = Foreach(M)
        M = MatchEvent(F)
          F = Foreach(E)
            E = Load('events.parquet')
"""

from __future__ import annotations

from . import ast as A

# ops that only consume (terminal) — the tree roots, like the
# reference's plan.sinkNodes
_SINK_TYPES = (A.Store, A.Dump, A.Display, A.Describe, A.Explain,
               A.Visualize, A.SocketWrite)


def _label(op: A.Op) -> str:
    name = type(op).__name__
    detail = ""
    if isinstance(op, A.Load):
        detail = f"('{op.path}'" + (f", {op.func}" if op.func else "") + ")"
    elif isinstance(op, A.Store):
        detail = f"('{op.path}')"
    elif op.inputs:
        detail = "(" + ", ".join(op.inputs) + ")"
    head = f"{op.out} = " if op.out else ""
    mark = " [sort bypassed by rewrite]" \
        if getattr(op, "skip_sort", False) else ""
    return f"{head}{name}{detail}{mark}"


def pretty_plan(ops: list[A.Op]) -> str:
    """Indented operator-lineage tree from every sink (ops whose
    output feeds nothing, plus explicit sink statements). Shared
    subplans print once per consumer with a `^` back-reference after
    the first expansion — cycles are impossible in Pig (aliases are
    defined before use) but redefinition makes 'latest wins' the
    right lookup, same as execution order."""
    # latest definition wins, mirroring executor alias rebinding
    by_out: dict[str, A.Op] = {}
    for op in ops:
        if op.out:
            by_out[op.out] = op
    consumed = {rel for op in ops for rel in op.inputs}
    sinks = [op for op in ops
             if isinstance(op, _SINK_TYPES)
             or (op.out and op.out not in consumed)]
    if not sinks:
        sinks = ops[-1:]  # degenerate script: show the last statement
    lines: list[str] = []
    expanded: set[str] = set()

    def walk(op: A.Op, depth: int) -> None:
        lines.append("  " * depth + _label(op))
        for rel in op.inputs:
            src = by_out.get(rel)
            if src is None:
                lines.append("  " * (depth + 1) + f"{rel} = ?(undefined)")
            elif rel in expanded:  # diamond/self-join: expand once
                lines.append("  " * (depth + 1) + f"{rel} ^ (shared)")
            else:
                expanded.add(rel)
                walk(src, depth + 1)

    for s in sinks:
        if s.out:
            expanded.add(s.out)
        walk(s, 0)
    return "\n".join(lines)
