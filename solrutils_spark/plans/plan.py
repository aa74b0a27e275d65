"""QueryPlan — the compiled form of a JSON query (QueryBuilder twin).

The reference compiles JSON into a ``SolrQuery`` ordered param multimap
(QueryBuilder.java:29 extends SolrQuery) plus facet state and a response-
handler chain. QueryPlan is that object for the Spark engine: a pure-Python
param multimap the execution layer (operators/executor.py) interprets into
DataFrame operations.

Param conventions mirror Solr's: ``q``, repeated ``fq``, ``sort``, ``rows``,
``start``, ``fl``, ``facet.field``/``facet.query``/``facet.range`` (repeated),
``json.facet``. ``currentValue`` threading, ``getValue`` reference syntax
(``/json-key``, ``.current-key``, param name) and the facet/jsonFacet
finalization replicate QueryBuilder.java:52,141-199.
"""

from __future__ import annotations

import json as _json
from typing import Any, Callable


class QueryPlan:
    def __init__(self, searcher: "Callable[[QueryPlan], dict] | None" = None):
        self.params: dict[str, list[str]] = {}
        self.current_value: Any = None
        self.json: dict[str, Any] = {}
        self.facet = False
        self.json_facet: list[str] | None = None
        self.facet_decorators: list = []
        self.response_handlers: list = []
        # execution hook for nested <search> ops (B8); injected by the executor
        self.searcher = searcher
        self.response: dict[str, Any] = {}

    # -- SolrQuery-style multimap ------------------------------------------
    def set(self, name: str, value) -> None:
        self.params[name] = [_to_str(value)]

    def add(self, name: str, value) -> None:
        self.params.setdefault(name, []).append(_to_str(value))

    def remove(self, name: str) -> None:
        self.params.pop(name, None)

    def get_params(self, name: str) -> list[str] | None:
        return self.params.get(name)

    def get_param(self, name: str, default: str | None = None) -> str | None:
        v = self.params.get(name)
        return v[0] if v else default

    def set_query(self, q: str) -> None:
        self.set("q", q)

    def add_filter_query(self, fq: str) -> None:
        self.add("fq", fq)

    # -- value references (QueryBuilder.getValue, :141-163) -----------------
    def get_value(self, ref: str):
        if not ref:
            return None
        c = ref[0]
        if c == "/":
            return self.json.get(ref[1:])
        if c == ".":
            if len(ref) > 1 and isinstance(self.current_value, dict):
                key = ref[2:] if ref[1] == "/" else ref[1:]
                return self.current_value.get(key)
            return None
        vals = self.params.get(ref)
        if not vals:
            return None
        return vals[0] if len(vals) == 1 else list(vals)

    # -- facets (QueryBuilder.addFacet, :106-133) ----------------------------
    def add_facet(self, type_: str, facet_value: str, decorator=None) -> None:
        if type_ in ("field", "query", "range"):
            self.add(f"facet.{type_}", facet_value)
            self.facet = True
        elif type_ == "json":
            if self.json_facet is None:
                self.json_facet = []
            self.json_facet.append(facet_value)
        if decorator is not None:
            self.facet_decorators.append(decorator)

    def add_response_handler(self, handler) -> None:
        """Prepend (handler chain is LIFO like QueryBuilder.addResponseHandler)."""
        self.response_handlers.insert(0, handler)


def _to_str(value) -> str:
    if isinstance(value, str):
        return value
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float) and value.is_integer():
        return f"{value:.1f}"
    return str(value)


def parse_json_facet(plan: QueryPlan) -> dict | None:
    """The assembled json.facet string parsed back to a dict (execution side)."""
    s = plan.get_param("json.facet")
    if not s:
        return None
    return _json.loads(s)
