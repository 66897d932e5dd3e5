"""Compile a crawl-program AST into the engine's node table.

The reference compiles surface macros into a tree of closures interpreted
depth-first (/root/reference/boris/interpreter.rkt:54-59). The Spark engine
instead compiles the same tree into a flat table of declarative
:class:`NodeSpec` records keyed by node id (the row-level program counter
``pc``), which the round job dispatches on — the driver loop is the analogue
of the interpreter recursion, and rows at different program points coexist
in one frontier (SURVEY.md §2a op 4 "jump").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from ..oracle import program as P


@dataclass
class NodeSpec:
    kind: str  # go|click|submit|extract|extract_list|let|for|label|recur|show|download
    child_ids: list[int] = field(default_factory=list)
    urls: P.Expr | None = None          # go/click
    forms_expr: P.Expr | None = None    # submit
    value: P.Expr | None = None         # extract / extract_list / show / download
    bindings: list[tuple[str, P.Expr]] | None = None  # let/for
    name: str | None = None             # label / recur


def compile_program(root: P.Node) -> dict[int, NodeSpec]:
    P.assign_ids(root)
    table: dict[int, NodeSpec] = {}

    def walk(n: P.Node) -> None:
        child_ids = [c.node_id for c in n.children]
        if isinstance(n, P.Click):
            spec = NodeSpec("click", child_ids, urls=n.urls)
        elif isinstance(n, P.Go):
            spec = NodeSpec("go", child_ids, urls=n.urls)
        elif isinstance(n, P.Submit):
            spec = NodeSpec("submit", child_ids, forms_expr=n.forms_expr)
        elif isinstance(n, P.Extract):
            spec = NodeSpec("extract", child_ids, value=n.value)
        elif isinstance(n, P.ExtractList):
            spec = NodeSpec("extract_list", child_ids, value=n.values)
        elif isinstance(n, P.LetWeb):
            spec = NodeSpec("let", child_ids, bindings=n.bindings)
        elif isinstance(n, P.ForWeb):
            spec = NodeSpec("for", child_ids, bindings=n.bindings)
        elif isinstance(n, P.Label):
            spec = NodeSpec("label", child_ids, name=n.name)
        elif isinstance(n, P.Recur):
            spec = NodeSpec("recur", child_ids, name=n.name)
        elif isinstance(n, P.Show):
            spec = NodeSpec("show", child_ids, value=n.msg)
        elif isinstance(n, P.Download):
            spec = NodeSpec("download", child_ids, value=n.name_expr)
        else:  # pragma: no cover
            raise TypeError(f"unknown node {type(n)}")
        table[n.node_id] = spec
        for c in n.children:
            walk(c)

    walk(root)
    return table
