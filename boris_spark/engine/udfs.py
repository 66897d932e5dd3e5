"""Arrow-batched executor-side program evaluation.

One ``mapInPandas`` function evaluates every non-fetch program node over a
batch of frontier rows (the reference's per-branch closure application,
/root/reference/boris/semantics.rkt:52-92, vectorized per Arrow batch).
Output is a single union schema split by ``kind`` on the JVM side:

- ``request``  → a navigate fan-out (semantics.rkt:52-57): resolved +
  canonicalized + hashed target, path extended with the fan-out index;
- ``apply``    → a next-state × child-web row (interpreter.rkt:57-58);
- ``result``   → an extraction fly (semantics.rkt:61-66), #f/void suppressed
  (browser-services.rkt:50-53);
- ``download`` → a body sink row (syntax/io.rkt:27-36).

All string work (xpath/links/forms/canonicalize/hash) is the shared pure
kernel — identical bytes to the oracle by construction.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd

from ..kernel import host_of, resolve2, url_hash
from ..oracle import program as P
from .compiler import NodeSpec

CASCADE_SCHEMA = (
    "kind string, pc long, cur_url string, cur_full string, bindings string, path_key string, "
    "url_canon string, url_full string, url_hash long, host string, "
    "referer string, method string, payload string, value string, vkind string, body string"
)

_COLS = [
    "kind", "pc", "cur_url", "cur_full", "bindings", "path_key", "url_canon",
    "url_full", "url_hash", "host", "referer", "method", "payload", "value",
    "vkind", "body",
]


def _hx(i: int) -> str:
    return f"{i:08x}"


def _out_row(kind: str, **kw) -> dict:
    row = dict.fromkeys(_COLS)
    row["kind"] = kind
    row.update(kw)
    return row


def encode_value(v: Any) -> str:
    """Canonical json encoding of fly values (shared with parity tests)."""
    return json.dumps(v, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def _eval_node(
    spec: NodeSpec,
    node_table: dict[int, NodeSpec],
    pc: int,
    cur_url: str | None,
    cur_full: str | None,
    body: str,
    bindings_json: str | None,
    path: str,
    out: list[dict],
) -> None:
    bindings = P.bindings_from_json(bindings_json)
    base = cur_full or cur_url
    ctx = P.EvalCtx(body or "", base, bindings)
    kind = spec.kind

    if kind in ("go", "click"):
        urls = P.ensure_list(spec.urls.eval(ctx))
        for i, u in enumerate(urls):
            canon, full = resolve2(base, str(u))
            out.append(_out_row(
                "request", pc=pc, bindings=bindings_json,
                path_key=path + _hx(i), url_canon=canon, url_full=full,
                url_hash=url_hash(canon), host=host_of(canon),
                referer=cur_url if kind == "click" else None, method="GET",
            ))
    elif kind == "submit":
        forms = P.ensure_list(spec.forms_expr.eval(ctx))
        for i, (action, _method, fields) in enumerate(forms):
            canon, full = resolve2(base, str(action))
            out.append(_out_row(
                "request", pc=pc, bindings=bindings_json,
                path_key=path + _hx(i), url_canon=canon, url_full=full,
                url_hash=url_hash(canon), host=host_of(canon),
                referer=cur_url, method="POST",
                payload=encode_value([list(f) for f in fields]),
            ))
    elif kind in ("extract", "extract_list"):
        v = spec.value.eval(ctx)
        values = [v] if kind == "extract" else P.ensure_list(v)
        for k, val in enumerate(values):
            if val is None or val is False:  # browser-services.rkt:50-53
                continue
            out.append(_out_row(
                "result", pc=pc, path_key=path + _hx(k),
                value=encode_value(val), vkind=type(val).__name__,
            ))
    elif kind in ("let", "for"):
        if kind == "let":
            sets = [{k: e.eval(ctx) for k, e in spec.bindings}]
        else:
            lists = [(k, P.ensure_list(e.eval(ctx))) for k, e in spec.bindings]
            n = min((len(v) for _, v in lists), default=0)
            sets = [{k: v[i] for k, v in lists} for i in range(n)]
        for i, bset in enumerate(sets):
            nb = P.bindings_to_json({**bindings, **bset})
            for j, child in enumerate(spec.child_ids):
                out.append(_out_row(
                    "apply", pc=child, cur_url=cur_url, cur_full=cur_full, bindings=nb,
                    path_key=path + _hx(i) + _hx(j), body=body,
                ))
    elif kind == "label":
        nb = P.bindings_to_json({**bindings, P.LABEL_PREFIX + spec.name: pc})
        for j, child in enumerate(spec.child_ids):
            out.append(_out_row(
                "apply", pc=child, cur_url=cur_url, cur_full=cur_full, bindings=nb,
                path_key=path + _hx(0) + _hx(j), body=body,
            ))
    elif kind == "recur":
        target = node_table[int(bindings[P.LABEL_PREFIX + spec.name])]
        for j, child in enumerate(target.child_ids):
            out.append(_out_row(
                "apply", pc=child, cur_url=cur_url, cur_full=cur_full, bindings=bindings_json,
                path_key=path + _hx(0) + _hx(j), body=body,
            ))
    elif kind == "show":
        if spec.value is not None:
            spec.value.eval(ctx)  # effect parity only
        for j, child in enumerate(spec.child_ids):
            out.append(_out_row(
                "apply", pc=child, cur_url=cur_url, cur_full=cur_full, bindings=bindings_json,
                path_key=path + _hx(0) + _hx(j), body=body,
            ))
    elif kind == "download":
        out.append(_out_row(
            "download", pc=pc, cur_url=cur_url, path_key=path,
            value=body or "",
        ))
    else:  # pragma: no cover
        raise ValueError(f"unknown node kind {kind}")


def make_cascade_fn(node_table: dict[int, NodeSpec]):
    """mapInPandas fn over rows (pc, cur_url, body, bindings, path_key)."""

    def cascade(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for pc, cur_url, cur_full, body, bindings_json, path in zip(
                pdf["pc"], pdf["cur_url"], pdf["cur_full"], pdf["body"],
                pdf["bindings"], pdf["path_key"]
            ):
                pc = int(pc)
                _eval_node(
                    node_table[pc], node_table, pc,
                    cur_url if isinstance(cur_url, str) else None,
                    cur_full if isinstance(cur_full, str) else None,
                    body if isinstance(body, str) else "",
                    bindings_json if isinstance(bindings_json, str) else None,
                    path or "", out,
                )
            yield pd.DataFrame(out, columns=_COLS) if out else pd.DataFrame(
                {c: [] for c in _COLS}
            )

    return cascade
