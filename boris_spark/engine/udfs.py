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
    "referer string, method string, payload string, value string, vkind string, body string, status int, head string, "
    "cookies string, "
    # memo columns (kind='memo' rows — the eval-output cache that lets later
    # rounds replay a cached url as a pure JVM join, see make_fused_fn):
    # mk = the output row's real kind ('request'/'result', or 'mark' for the
    # state-evaluated marker), mk_* = the INPUT-state key the outputs were
    # computed under (parent pc, full url, bindings, method, pre-fold jar)
    "mk string, mk_pc long, mk_full string, mk_method string, "
    "mk_bindings string, mk_cookies string"
)

_COLS = [
    "kind", "pc", "cur_url", "cur_full", "bindings", "path_key", "url_canon",
    "url_full", "url_hash", "host", "referer", "method", "payload", "value",
    "vkind", "body", "status", "head", "cookies",
    "mk", "mk_pc", "mk_full", "mk_method", "mk_bindings", "mk_cookies",
]

# programs built only from these node kinds have outputs that are a pure
# function of (pc, url, url_full, bindings, method, cookies) with
# path_key = input_path + constant_suffix and NO body-carrying or
# multi-generation outputs — exactly the class whose cache-hit replays can
# run as a JVM join against the memo sink instead of re-evaluating bodies
# in Python (let/for/label/recur/show produce 'apply' generations and
# download emits the body itself, so they take the cogroup Python path)
MEMO_JOINABLE_KINDS = frozenset(
    {"go", "click", "submit", "extract", "extract_list"}
)


def _hx(i: int) -> str:
    return f"{i:08x}"


# -- env-gated executor-side timing (BORIS_UDF_TIMING=1): per-worker totals
# printed at interpreter exit; local-mode stderr shows them at spark.stop()
_TIMING: dict[str, float] = {}


def _timing_enabled() -> bool:
    import os

    return bool(os.environ.get("BORIS_UDF_TIMING"))


_T_FLUSH = [0.0]


def _t_add(name: str, dt: float) -> None:
    import os
    import time

    _TIMING[name] = _TIMING.get(name, 0.0) + dt
    now = time.time()
    if now - _T_FLUSH[0] > 2.0:  # workers get SIGKILLed; flush to disk
        _T_FLUSH[0] = now
        d = "/tmp/boris_udf_timing"
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, str(os.getpid())), "w") as f:
            f.write(
                " ".join(f"{k}={v:.2f}" for k, v in sorted(_TIMING.items()))
            )


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
    head: tuple | None = None,
    method: str = "GET",
    cookies_json: str | None = None,
) -> None:
    bindings = P.bindings_from_json(bindings_json)
    base = cur_full or cur_url
    ctx = P.EvalCtx(body or "", base, bindings, head=head, method=method)
    kind = spec.kind
    head_json = json.dumps(list(head)) if head is not None else None

    if kind in ("go", "click"):
        urls = P.ensure_list(spec.urls.eval(ctx))
        for i, u in enumerate(urls):
            canon, full = resolve2(base, str(u))
            out.append(_out_row(
                "request", pc=pc, bindings=bindings_json,
                path_key=path + _hx(i), url_canon=canon, url_full=full,
                url_hash=url_hash(canon), host=host_of(canon),
                referer=cur_url if kind == "click" else None, method="GET",
                cookies=cookies_json,
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
                cookies=cookies_json,
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
                    head=head_json, method=method, cookies=cookies_json,
                ))
    elif kind == "label":
        nb = P.bindings_to_json({**bindings, P.LABEL_PREFIX + spec.name: pc})
        for j, child in enumerate(spec.child_ids):
            out.append(_out_row(
                "apply", pc=child, cur_url=cur_url, cur_full=cur_full, bindings=nb,
                path_key=path + _hx(0) + _hx(j), body=body,
                head=head_json, method=method, cookies=cookies_json,
            ))
    elif kind == "recur":
        target = node_table[int(bindings[P.LABEL_PREFIX + spec.name])]
        for j, child in enumerate(target.child_ids):
            out.append(_out_row(
                "apply", pc=child, cur_url=cur_url, cur_full=cur_full, bindings=bindings_json,
                path_key=path + _hx(0) + _hx(j), body=body,
                head=head_json, method=method, cookies=cookies_json,
            ))
    elif kind == "show":
        if spec.value is not None:
            spec.value.eval(ctx)  # effect parity only
        for j, child in enumerate(spec.child_ids):
            out.append(_out_row(
                "apply", pc=child, cur_url=cur_url, cur_full=cur_full, bindings=bindings_json,
                path_key=path + _hx(0) + _hx(j), body=body,
                head=head_json, method=method, cookies=cookies_json,
            ))
    elif kind == "download":
        out.append(_out_row(
            "download", pc=pc, cur_url=cur_url, path_key=path,
            value=body or "",
        ))
    else:  # pragma: no cover
        raise ValueError(f"unknown node kind {kind}")



def _write_store_batch(store_dir: str, rows: list[tuple], batch_idx: int) -> None:
    """Worker-side store write: one parquet file per (partition, batch),
    STORE_SCHEMA columns, snappy. tmp-name + ``os.replace`` makes task
    retries atomic; names are deterministic in (partitionId, batch index)
    — a re-run attempt overwrites with byte-identical content, so
    last-writer-wins is consistent. The engine adopts the directory as the
    round's store delta without rewriting a byte (Iceberg add_files)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark import TaskContext

    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else 0
    os.makedirs(store_dir, exist_ok=True)
    name = f"part-{pid:05d}-{batch_idx:04d}.parquet"
    tmp = os.path.join(store_dir, f".{name}.tmp-{os.getpid()}")
    tbl = pa.table({
        "url_canon": pa.array([r[0] for r in rows], pa.string()),
        "body": pa.array([r[1] for r in rows], pa.string()),
        "status": pa.array([r[2] for r in rows], pa.int32()),
        "head": pa.array([r[3] for r in rows], pa.string()),
    })
    pq.write_table(tbl, tmp, compression="snappy")
    os.replace(tmp, os.path.join(store_dir, name))


_INT_COLS = ("pc", "url_hash", "status", "mk_pc")


def _frame(out: list[dict]) -> pd.DataFrame:
    """Build the output batch WITHOUT float64 inference: a mixed
    int/None column (e.g. url_hash on request rows vs result rows) would
    otherwise be inferred as float64, silently truncating 64-bit hashes to
    the 53-bit double mantissa — which breaks the (url_hash, url_canon)
    seen anti-join and refetches already-seen URLs."""
    if not out:
        return pd.DataFrame({c: [] for c in _COLS})
    return pd.DataFrame({
        c: (
            pd.array([r[c] for r in out], dtype="Int64")
            if c in _INT_COLS
            else [r[c] for r in out]
        )
        for c in _COLS
    })


def _eval_memo(
    memo: dict,
    key: tuple,
    spec: NodeSpec,
    node_table: dict[int, NodeSpec],
    pc: int,
    cur_url,
    cur_full,
    body: str,
    bindings_json,
    path: str,
    out: list[dict],
    head: tuple | None = None,
    method: str = "GET",
    cookies_json: str | None = None,
) -> None:
    """Evaluate a node once per (pc, url, cur_full, bindings) and replay the
    cached output rows for every further path that reaches the same state —
    exact because node evaluation is a pure function of that key (+ the
    body, itself a function of the url within a round) and every emitted
    path is ``input_path + constant_suffix``. Callers keep rows of one url
    consecutive (sortWithinPartitions) and clear the memo on url change, so
    memory stays O(paths-per-url). The reference evaluates per crawl branch
    (interpreter.rkt:54-59); values are identical by purity, this just
    skips recomputing them."""
    ent = memo.get(key)
    if ent is None:
        ent = []
        _eval_node(
            spec, node_table, pc, cur_url, cur_full, body, bindings_json,
            "", ent, head=head, method=method, cookies_json=cookies_json,
        )
        memo[key] = ent
    for r in ent:
        r2 = dict(r)
        r2["path_key"] = path + r["path_key"]
        out.append(r2)


def make_fused_fn(
    node_table: dict[int, NodeSpec],
    fetch_fn,
    emit_memo: bool = False,
    store_dir: str | None = None,
):
    """Fused fetch+extract: ONE mapInPandas stage per crawl round.

    Input rows are the round's FRESH request rows only (REQUEST cols) —
    cache hits and robots-blocked replays take the store-sink replay path in
    the crawler instead (they never reach fetch_fn, so a live fetcher is
    called exactly once per url per crawl and the per-host politeness budget
    is never bypassed — the memoized replay of browser-services.rkt:36-40).
    ``fetch_fn(urls: list[str]) -> list[(body, status)]`` is the pluggable
    fetcher (the reference's swappable request service,
    /root/reference/boris/interpreter/services.rkt:14-15) — a deterministic
    closed-form page function in the bench, a live HTTP batch fetcher at
    deploy. Page bodies are materialized INSIDE the Python worker and
    evaluated there (fan-out to the navigate node's children); each body
    crosses the Arrow boundary exactly once, on the ``kind='fetched'`` row
    that the crawler persists to the store sink (the crash-resumable page
    cache that also feeds cache-hit replays), and bodies never enter a
    shuffle or the block cache.

    Emits one ``kind='fetched'`` row per distinct url per batch (body +
    status + head, min batch path in ``path_key``); the JVM aggregates
    batches into the round's seen delta + store delta.

    With *store_dir* set (the default engine path), page bodies NEVER
    cross the Arrow boundary at all: each worker writes its own store
    parquet files (url_canon, body, status, head) straight into
    *store_dir* via pyarrow — tmp-name + ``os.replace`` so task retries
    are atomic and deterministic — and the ``fetched`` rows it emits are
    SLIM (status + keys, no body). The crawler adopts the directory as the
    round's store delta (``TableFormat.adopt_delta`` — Iceberg add_files:
    data files written by tasks, committed by reference). This is the
    10^10-scale shape: ~60 KB × millions of bodies per round would
    otherwise pay Arrow encode + JVM decode + JVM parquet re-encode on a
    memory-bandwidth-bound path that profiling showed does not scale with
    cores on one box."""

    import inspect

    # Cookie support is declared EXPLICITLY: either an attribute flag
    # (``fetch_fn.wants_cookies = True``) or a parameter literally named
    # ``cookie_headers``. Arity-sniffing would silently feed the header list
    # into an unrelated optional second parameter (e.g. batch_size=100).
    try:
        _params = inspect.signature(fetch_fn).parameters
    except (TypeError, ValueError):
        _params = {}
    fetch_wants_cookies = bool(
        getattr(fetch_fn, "wants_cookies", False) or "cookie_headers" in _params
    )

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.cookies import (
            cookies_ref, cookies_to_header, jar_fold_head, jar_from_json,
            jar_to_json,
        )

        memo: dict = {}
        memo_states: set = set()
        memo_url = None
        # cross-batch fetch memo: the partition is url-sorted, so only the
        # LAST url of a batch can straddle into the next one — carrying that
        # single response keeps "fetch_fn called exactly once per url per
        # crawl" true across Arrow batch boundaries in O(1) memory (a url
        # spanning 3+ batches chains through, it is last in each).
        carry: dict[str, tuple] = {}
        import time as _time

        timing = _timing_enabled()
        for batch_idx, pdf in enumerate(batches):
            _t0 = _time.time()
            out: list[dict] = []
            store_rows: list[tuple] = []
            cookies_col = (
                pdf["cookies"] if "cookies" in pdf.columns else [None] * len(pdf)
            )
            # the fetch uses the DFS-min request's jar per url (the branch
            # the reference would fetch with first); later branches replay
            # the memoized response with their own jars
            fetch_row: dict[str, tuple] = {}
            for url, full, path, cj in zip(
                pdf["url_canon"], pdf["url_full"], pdf["path_key"], cookies_col
            ):
                cur = fetch_row.get(url)
                if cur is None or (path or "") < cur[0]:
                    fetch_row[url] = (path or "", full, cj)
            need = sorted(u for u in fetch_row if u not in carry)
            if fetch_wants_cookies:
                headers = [
                    cookies_to_header(
                        cookies_ref(jar_from_json(fetch_row[u][2]), fetch_row[u][1] or u)
                    )
                    for u in need
                ]
                resps = fetch_fn(need, headers) if need else []
            else:
                # fetch_fn returns (body, status) — file-style empty head —
                # or (body, status, head), head = (status line, header alist)
                resps = fetch_fn(need) if need else []
            fetched = dict(zip(need, resps))
            fetched.update(carry)
            if timing:
                _t_add("fused.fetch", _time.time() - _t0)
                _t0 = _time.time()
            emitted: dict[str, int] = {}
            for pc, url, url_full, url_hash, host, bindings_json, path, method, cj in zip(
                pdf["pc"], pdf["url_canon"], pdf["url_full"], pdf["url_hash"],
                pdf["host"], pdf["bindings"], pdf["path_key"], pdf["method"],
                cookies_col,
            ):
                resp = fetched.get(url, ("", 404))
                body, status = resp[0], resp[1]
                head = resp[2] if len(resp) > 2 else None
                if body is None:
                    body = ""
                path = path or ""
                i = emitted.get(url)
                if i is None and url not in carry:
                    # exactly ONE fetched row per url per crawl — a url
                    # straddling into later batches is in `carry` and was
                    # already emitted, so the store sink is duplicate-free
                    # by construction (its path_key is informational; the
                    # seen delta's path_first is computed JVM-side from the
                    # round's request frame)
                    emitted[url] = len(out)
                    head_json = (
                        json.dumps(list(head)) if head is not None else None
                    )
                    if store_dir is not None:
                        # body goes straight to the worker-written store
                        # file; the emitted row stays SLIM (keys + status)
                        store_rows.append((url, body, int(status), head_json))
                        row_body = None
                    else:
                        row_body = body
                    out.append(_out_row(
                        "fetched", url_canon=url, url_hash=url_hash,
                        host=host, path_key=path, status=int(status),
                        body=row_body,
                        head=head_json,
                    ))
                elif i is not None and path < out[i]["path_key"]:
                    out[i]["path_key"] = path
                bindings_json = (
                    bindings_json if isinstance(bindings_json, str) else None
                )
                url_full = url_full if isinstance(url_full, str) else None
                method = method if isinstance(method, str) else "GET"
                cj = cj if isinstance(cj, str) else None
                cj_in = cj  # the memo key jar: pre-fold, what replays carry
                # per-branch cookie fold: the response's Set-Cookie enters
                # THIS branch's jar before its children run
                # (hypertext-browser/base.rkt:78-94)
                if head is not None:
                    cj = jar_to_json(
                        jar_fold_head(jar_from_json(cj), head, url_full or url)
                    )
                if url != memo_url:
                    memo.clear()
                    memo_states.clear()
                    memo_url = url
                row_start = len(out)
                for j, child in enumerate(node_table[int(pc)].child_ids):
                    _eval_memo(
                        memo, (child, url_full, bindings_json, method, cj),
                        node_table[child], node_table, child,
                        url, url_full, body, bindings_json, path + _hx(j), out,
                        head=head, method=method, cookies_json=cj,
                    )
                if emit_memo:
                    # eval-output cache: once per distinct input state per
                    # url, duplicate this row's outputs with suffix-only
                    # paths + the state key — the memo sink later rounds
                    # JOIN against (JVM concat of path prefixes) instead of
                    # re-running the page through Python per replay branch.
                    # The 'mark' row records states with ZERO outputs, so a
                    # join miss means "state never evaluated", not "state
                    # evaluated to nothing".
                    skey = (int(pc), url_full, bindings_json, method, cj_in)
                    if skey not in memo_states:
                        memo_states.add(skey)
                        n_out = len(out)
                        mk_kw = dict(
                            cur_url=url, mk_pc=int(pc), mk_full=url_full,
                            mk_method=method, mk_bindings=bindings_json,
                            mk_cookies=cj_in,
                        )
                        out.append(_out_row("memo", mk="mark", **mk_kw))
                        for r in out[row_start:n_out]:
                            m = dict(r)
                            m["kind"] = "memo"
                            m["mk"] = r["kind"]
                            m["path_key"] = r["path_key"][len(path):]
                            m.update(mk_kw)
                            out.append(m)
            if len(pdf):
                last_url = pdf["url_canon"].iloc[-1]
                carry = (
                    {last_url: fetched[last_url]} if last_url in fetched else {}
                )
            if timing:
                _t_add("fused.eval", _time.time() - _t0)
                _t0 = _time.time()
            if store_dir is not None and store_rows:
                _write_store_batch(store_dir, store_rows, batch_idx)
                if timing:
                    _t_add("fused.store_write", _time.time() - _t0)
                    _t0 = _time.time()
            f = _frame(out)
            if timing:
                _t_add("fused.frame", _time.time() - _t0)
            yield f

    return fused


def make_replay_fn(node_table: dict[int, NodeSpec], emit_memo: bool = False):
    """Cogrouped store replay — the cache-hit half of a crawl round.

    ``replay_slim.groupby(url).cogroup(store.groupby(url)).applyInPandas``:
    each group is ONE url — left = its slim replay request rows (no
    bodies), right = its single store row (body + head + status). The page
    body therefore crosses exactly one shuffle (the cogroup exchange of the
    store's one-row-per-url side) and is evaluated in place against every
    replaying branch — zero body amplification. The previous shape
    (dropDuplicates over the body-carrying store, a body join against every
    replay row, then a sortWithinPartitions of body×paths rows) moved each
    body through three body-heavy operators and multiplied it per path;
    at 63 KB mean pages that sort alone spilled gigabytes per round.

    Semantics identical to the fan-out cascade over store-joined bodies
    (the memoized replay of browser-services.rkt:36-40): robots-blocked
    branches (left._blk) see an empty body and no head; the store head's
    Set-Cookie folds into each branch's jar before its children run.

    With ``emit_memo`` (memo-joinable programs), every state this replay
    evaluates ALSO emits eval-output-cache rows, exactly like the fused
    stage does at fetch time: a state that structurally missed the memo
    (url fetched at node A, replayed at node B — the misses are round-
    recurring for hub pages that are re-linked every round at the same
    depth) is evaluated in Python ONCE; every later round joins it
    JVM-side instead of re-reading the body. Robots-blocked branches never
    emit memo rows (their empty-body outputs would poison the unblocked
    join, whose key does not carry the blocked bit)."""

    def replay(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import time as _time

        from ..kernel.cookies import jar_fold_head, jar_from_json, jar_to_json

        timing = _timing_enabled()
        _t0 = _time.time()
        out: list[dict] = []
        if not len(left):
            return _frame(out)
        body = ""
        head_json = None
        if len(right):
            b = right["body"].iloc[0]
            body = b if isinstance(b, str) else ""
            if "head" in right.columns:
                h = right["head"].iloc[0]
                head_json = h if isinstance(h, str) else None
        memo: dict = {}
        memo_states: set = set()
        cookies_col = (
            left["cookies"] if "cookies" in left.columns else [None] * len(left)
        )
        blk_col = left["_blk"] if "_blk" in left.columns else [False] * len(left)
        for pc, url, url_full, bindings_json, path, method, cj, blk in zip(
            left["pc"], left["url_canon"], left["url_full"], left["bindings"],
            left["path_key"], left["method"], cookies_col, blk_col,
        ):
            pc = int(pc)
            url_full = url_full if isinstance(url_full, str) else None
            bindings_json = (
                bindings_json if isinstance(bindings_json, str) else None
            )
            method = method if isinstance(method, str) else "GET"
            cj = cj if isinstance(cj, str) else None
            path = path or ""
            blk = bool(blk)
            b = "" if blk else body
            hj = None if blk else head_json
            head = tuple(json.loads(hj)) if hj else None
            cj_in = cj  # pre-fold jar: the memo key replay rows carry
            if head is not None:
                cj = jar_to_json(
                    jar_fold_head(jar_from_json(cj), head, url_full or url)
                )
            row_start = len(out)
            for j, child in enumerate(node_table[pc].child_ids):
                _eval_memo(
                    memo, (child, url_full, bindings_json, method, cj, blk),
                    node_table[child], node_table, child,
                    url, url_full, b, bindings_json, path + _hx(j), out,
                    head=head, method=method, cookies_json=cj,
                )
            if emit_memo and not blk:
                skey = (pc, url_full, bindings_json, method, cj_in)
                if skey not in memo_states:
                    memo_states.add(skey)
                    n_out = len(out)
                    mk_kw = dict(
                        cur_url=url, mk_pc=pc, mk_full=url_full,
                        mk_method=method, mk_bindings=bindings_json,
                        mk_cookies=cj_in,
                    )
                    out.append(_out_row("memo", mk="mark", **mk_kw))
                    for r in out[row_start:n_out]:
                        m = dict(r)
                        m["kind"] = "memo"
                        m["mk"] = r["kind"]
                        m["path_key"] = r["path_key"][len(path):]
                        m.update(mk_kw)
                        out.append(m)
        if timing:
            _t_add("replay.eval", _time.time() - _t0)
            _t_add("replay.groups", 1e-9)
            _t0 = _time.time()
        f = _frame(out)
        if timing:
            _t_add("replay.frame", _time.time() - _t0)
        return f

    return replay


def make_cascade_fn(node_table: dict[int, NodeSpec], fanout: bool = False):
    """mapInPandas fn over rows (pc, cur_url, body, bindings, path_key).

    With ``fanout=False`` each row's own node ``pc`` is evaluated. With
    ``fanout=True`` the rows are *completed fetches* whose ``pc`` is the
    navigate node that requested them: the row fans to each child of ``pc``
    (path extended with the child index) and evaluates the child in place —
    the interpreter's next-state × child-subweb recursion
    (/root/reference/boris/interpreter.rkt:57-58) done inside the Arrow
    batch, so the page body crosses the JVM↔Python boundary exactly once
    per fetched page instead of once per (page, child) join row."""

    def cascade(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.cookies import jar_fold_head, jar_from_json, jar_to_json

        memo: dict = {}
        memo_url = None
        for pdf in batches:
            out: list[dict] = []
            heads = pdf["head"] if "head" in pdf.columns else [None] * len(pdf)
            methods = pdf["method"] if "method" in pdf.columns else ["GET"] * len(pdf)
            cookies_col = (
                pdf["cookies"] if "cookies" in pdf.columns else [None] * len(pdf)
            )
            for pc, cur_url, cur_full, body, bindings_json, path, head_json, method, cj in zip(
                pdf["pc"], pdf["cur_url"], pdf["cur_full"], pdf["body"],
                pdf["bindings"], pdf["path_key"], heads, methods, cookies_col,
            ):
                pc = int(pc)
                cur_url = cur_url if isinstance(cur_url, str) else None
                cur_full = cur_full if isinstance(cur_full, str) else None
                body = body if isinstance(body, str) else ""
                bindings_json = (
                    bindings_json if isinstance(bindings_json, str) else None
                )
                head = (
                    tuple(json.loads(head_json))
                    if isinstance(head_json, str) else None
                )
                method = method if isinstance(method, str) else "GET"
                cj = cj if isinstance(cj, str) else None
                path = path or ""
                if fanout and head is not None:
                    # completed fetch (or store replay): fold the response's
                    # Set-Cookie into this branch's jar before its children
                    cj = jar_to_json(
                        jar_fold_head(jar_from_json(cj), head, cur_full or cur_url)
                    )
                if cur_url != memo_url:
                    memo.clear()
                    memo_url = cur_url
                if fanout:
                    for j, child in enumerate(node_table[pc].child_ids):
                        _eval_memo(
                            memo, (child, cur_full, bindings_json, method, cj),
                            node_table[child], node_table, child,
                            cur_url, cur_full, body, bindings_json,
                            path + _hx(j), out, head=head, method=method,
                            cookies_json=cj,
                        )
                else:
                    _eval_memo(
                        memo, (pc, cur_full, bindings_json, method, cj),
                        node_table[pc], node_table, pc,
                        cur_url, cur_full, body, bindings_json, path, out,
                        head=head, method=method, cookies_json=cj,
                    )
            yield _frame(out)

    return cascade
