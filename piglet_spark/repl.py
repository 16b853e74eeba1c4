"""Interactive REPL — statement-at-a-time execution.

Mirror of the reference REPL (PigletREPL.scala:436-475: commands dump,
describe, prettyprint, rewrite, fs; statement buffer re-run on DUMP).
DataFrame laziness makes re-execution free: the alias environment
persists and only actions run, so no buffer-recompile is needed.
"""

from __future__ import annotations

import sys


HELP = """\
commands:
  dump <alias>        print alias contents (Pig tuple format)
  describe <alias>    print alias schema
  display <alias>     show alias as a table
  explain <alias>     physical plan
  prettyprint         print the session's dataflow plan (rewritten)
  rewrite             print each sink's plan before AND after rewriting
  aliases             list defined aliases
  help                this help
  quit                exit
anything else is parsed as Pig Latin (may span lines until ';')."""


def repl(engine, input_fn=input, out=sys.stdout) -> int:
    print("piglet-spark REPL — 'help' for commands", file=out)
    buffer = ""
    # accumulated text of every successfully-run statement — the
    # session's dataflow plan for prettyprint/rewrite (the reference
    # REPL keeps the parsed-operator buffer, PigletREPL.scala:38;
    # re-parsing the text is equivalent and keeps run() the only
    # execution path)
    session_script = ""
    while True:
        try:
            prompt = "piglet> " if not buffer else "      | "
            line = input_fn(prompt)
        except (EOFError, KeyboardInterrupt):
            print("", file=out)
            return 0
        stripped = line.strip()
        if buffer and stripped.lower() in ("dump", "describe", "display",
                                           "aliases", "help", "quit",
                                           "prettyprint", "rewrite",
                                           "cancel") or \
                (buffer and stripped.lower().split(" ")[0] in
                 ("dump", "describe", "display", "explain")):
            if stripped.lower() == "cancel":
                buffer = ""
                print("(discarded buffered statement)", file=out)
                continue
            print("(still buffering a statement — end it with ';' or type "
                  "'cancel' to discard)", file=out)
            continue
        if not buffer:
            # commands work with or without a trailing ';' (r05 —
            # `explain foo;` fell through to the Pig parser, which
            # has no EXPLAIN-as-command form, and errored)
            cmdtext = stripped.rstrip(";").strip()
            low = cmdtext.lower()
            if low in ("quit", "exit"):
                return 0
            if low == "help":
                print(HELP, file=out)
                continue
            if low == "aliases":
                print(", ".join(sorted(engine.executor.env)) or "(none)",
                      file=out)
                continue
            if low == "prettyprint":
                # ref handlePrettyPrint: rewrite the accumulated
                # plan, then print its operator tree
                from .plans.pretty import pretty_plan
                try:
                    ops = engine.parse(session_script)
                    print(pretty_plan(ops) if ops else "(empty plan)",
                          file=out)
                except Exception as e:
                    print(f"error: {type(e).__name__}: {e}", file=out)
                continue
            if low == "rewrite":
                # ref handleRewrite: per sink, pretty BEFORE and
                # AFTER the rewrite pass
                from .plans.pretty import pretty_plan
                try:
                    raw = engine.parse_raw(session_script)
                    done = engine.parse(session_script)
                    if not raw:
                        print("(empty plan)", file=out)
                        continue
                    print("-- before rewrite --", file=out)
                    print(pretty_plan(raw), file=out)
                    print("-- after rewrite --", file=out)
                    print(pretty_plan(done), file=out)
                except Exception as e:
                    print(f"error: {type(e).__name__}: {e}", file=out)
                continue
            first = low.split(" ")[0] if low else ""
            if first in ("dump", "describe", "display", "explain") and \
                    len(cmdtext.split()) == 2:
                alias = cmdtext.split()[1]
                try:
                    if first == "explain":
                        engine.df(alias).explain("formatted")
                    else:
                        engine.run(f"{first.upper()} {alias};")
                except Exception as e:
                    print(f"error: {type(e).__name__}: {e}", file=out)
                continue
            if not stripped:
                continue
        buffer += line + "\n"
        if stripped.endswith(";") or stripped.endswith("%>"):
            try:
                engine.run(buffer)
                session_script += buffer  # only successful statements
            except Exception as e:
                print(f"error: {type(e).__name__}: {e}", file=out)
            buffer = ""
    return 0
