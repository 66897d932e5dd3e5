"""Pure-Python oracle: the reference's DFS crawl semantics, exactly.

Reproduces /root/reference/boris/interpreter.rkt:54-59 (DFS pre-order over
the web tree; empty web prunes), the fetch-memoization service
(/root/reference/boris/interpreter/browser-services.rkt:35-47: cache keyed by
the canonical URL, url.rkt:37-38) and extraction suppression of #f/void
values (browser-services.rkt:50-53).

The oracle is the parity target for the Spark engine: same program + same
snapshot ⇒ identical (fly sequence, URL-seen set, first-visit order).

Path keys: every fan-out appends (next-state index i, child-web index j) —
the interpreter's ``for*`` order (interpreter.rkt:57-58) — so DFS pre-order
equals lexicographic path-key order, which is how the distributed engine
reconstructs the reference's ordering (SURVEY.md §3 "Ordering parity").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Protocol

from ..kernel import resolve2
from . import program as P


class Fetcher(Protocol):
    def fetch(self, url_canon: str, method: str = "GET", form_data=None,
              url_full: str | None = None, jar=None) -> tuple[int, str]:
        """Return (status, body) or (status, body, head). *jar* is the
        navigating branch's cookie list (RFC6265-subset tuples) — cookie-
        aware fetchers send the matching ones (head.rkt:94-98); file-style
        fetchers ignore it."""


class SnapshotFetcher:
    """Deterministic fetcher over a dict snapshot {canonical_url: body}.

    The analogue of the reference's file:// fixture fetches
    (/root/reference/hypertext-browser/file.rkt:38-47); missing URLs yield
    (404, "") — selectors on an empty body return [] and the branch prunes
    naturally, on both oracle and engine."""

    def __init__(self, pages: dict[str, str]):
        self.pages = pages

    def fetch(self, url_canon: str, method: str = "GET", form_data=None,
              url_full: str | None = None, jar=None) -> tuple[int, str]:
        body = self.pages.get(url_canon)
        return (200, body) if body is not None else (404, "")


@dataclass
class Fly:
    path: tuple[int, ...]
    value: Any


@dataclass
class OracleResult:
    flies: list[Fly] = field(default_factory=list)
    visits: list[str] = field(default_factory=list)  # first-fetch order (DFS)
    seen: set[str] = field(default_factory=set)  # canonical URLs fetched
    discoveries: list[tuple[str, tuple[int, ...]]] = field(default_factory=list)
    downloads: list[tuple[tuple[int, ...], str, str]] = field(default_factory=list)

    @property
    def fly_values(self) -> list[Any]:
        return [f.value for f in self.flies]


@dataclass
class _State:
    url: str | None = None       # canonical (the cache key)
    url_full: str | None = None  # full request url (the reference's browser-url)
    body: str = ""
    bindings: dict[str, Any] = field(default_factory=dict)
    head: tuple[str, list] | None = None  # (status line, header alist); None = file semantics
    method: str = "GET"
    # per-branch cookie jar (hypertext-browser/base.rkt:78-94): threaded
    # through every navigation, folded from each response's Set-Cookie
    jar: list = field(default_factory=list)


class Spider:
    """``spider`` (/root/reference/boris/interpreter.rkt:50-51)."""

    def __init__(self, root: P.Node, fetcher: Fetcher, max_steps: int = 1_000_000):
        self.root = root
        self.fetcher = fetcher
        self.cache: dict[str, str] = {}
        self.result = OracleResult()
        self._steps = 0
        self._max_steps = max_steps

    def run(self) -> OracleResult:
        self._crawl(self.root, _State(), ())
        return self.result

    # -- node dispatch ----------------------------------------------------

    def _crawl(self, node: P.Node, state: _State, path: tuple[int, ...]) -> None:
        self._steps += 1
        if self._steps > self._max_steps:
            raise RuntimeError("oracle step budget exceeded (cyclic program?)")
        ctx = P.EvalCtx(state.body, state.url_full or state.url, state.bindings,
                        head=state.head, method=state.method)

        if isinstance(node, (P.Go, P.Click)):
            urls = P.ensure_list(node.urls.eval(ctx))
            self._navigate(node, state, path, [(u, "GET", None) for u in urls])
        elif isinstance(node, P.Submit):
            forms = P.ensure_list(node.forms_expr.eval(ctx))
            reqs = [(action, "POST", fields) for action, _method, fields in forms]
            self._navigate(node, state, path, reqs)
        elif isinstance(node, P.Extract):
            v = node.value.eval(ctx)
            self._yield_flies(path, [v])
        elif isinstance(node, P.ExtractList):
            vs = P.ensure_list(node.values.eval(ctx))
            self._yield_flies(path, vs)
        elif isinstance(node, (P.LetWeb, P.ForWeb)):
            for i, bset in enumerate(self._binding_sets(node, ctx)):
                new = _State(state.url, state.url_full, state.body,
                             {**state.bindings, **bset},
                             state.head, state.method, state.jar)
                self._fan_children(node.children, new, path, i)
        elif isinstance(node, P.Label):
            # control.rkt:14-20 — bind the label node itself (the web whose
            # head is this bind) so recur can re-enter its children.
            new = _State(
                state.url, state.url_full, state.body,
                {**state.bindings, P.LABEL_PREFIX + node.name: node},
                state.head, state.method, state.jar,
            )
            self._fan_children(node.children, new, path, 0)
        elif isinstance(node, P.Recur):
            # jump (semantics.rkt:86-92): replace the remaining web; the
            # interpreter recurses into the NEW web's children
            # (interpreter.rkt:58 takes cdr) — the label head is skipped.
            target: P.Node = state.bindings[P.LABEL_PREFIX + node.name]
            self._fan_children(target.children, state, path, 0)
        elif isinstance(node, P.Show):
            node.msg.eval(ctx)  # evaluated for effect-parity; not printed
            self._fan_children(node.children, state, path, 0)
        elif isinstance(node, P.Download):
            self.result.downloads.append((path, state.url or "", state.body))
        else:  # pragma: no cover
            raise TypeError(f"unknown node {type(node)}")

    # -- helpers ----------------------------------------------------------

    def _yield_flies(self, path: tuple[int, ...], values: list[Any]) -> None:
        # browser-services.rkt:50-53: #f / void suppressed
        for k, v in enumerate(values):
            if v is None or v is False:
                continue
            self.result.flies.append(Fly(path + (k,), v))

    def _binding_sets(self, node, ctx) -> list[dict[str, Any]]:
        if isinstance(node, P.LetWeb):
            return [{k: e.eval(ctx) for k, e in node.bindings}]
        # ForWeb: zipped parallel clauses (binding.rkt:50-64)
        lists = [(k, P.ensure_list(e.eval(ctx))) for k, e in node.bindings]
        n = min((len(v) for _, v in lists), default=0)
        return [{k: v[i] for k, v in lists} for i in range(n)]

    def _navigate(self, node, state: _State, path, requests) -> None:
        for i, (u, method, form_data) in enumerate(requests):
            url_canon, url_full = resolve2(state.url_full or state.url, str(u))
            self.result.discoveries.append((url_canon, path + (i,)))
            if url_canon in self.cache:
                body, head = self.cache[url_canon]  # cache hit: full replay
            else:
                resp = self.fetcher.fetch(url_canon, method, form_data,
                                          url_full, jar=list(state.jar))
                # (status, body) → file semantics (empty head, file.rkt:38-47);
                # (status, body, head) → live head = (status line, alist)
                body = resp[1]
                head = resp[2] if len(resp) > 2 else None
                self.cache[url_canon] = (body, head)
                self.result.visits.append(url_canon)
                self.result.seen.add(url_canon)
            # the branch folds the (possibly replayed) response's Set-Cookie
            # into its OWN jar — per-branch state, memoized response
            from ..kernel.cookies import jar_fold_head

            new = _State(url_canon, url_full, body, dict(state.bindings),
                         head, method,
                         jar_fold_head(list(state.jar), head, url_full))
            self._fan_children(node.children, new, path, i)

    def _fan_children(self, children, state: _State, path, i: int) -> None:
        for j, child in enumerate(children):
            self._crawl(child, state, path + (i, j))


def spider(root: P.Node, fetcher: Fetcher) -> OracleResult:
    return Spider(root, fetcher).run()
