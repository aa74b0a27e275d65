"""SearchModel — JSON-query → QueryPlan compiler (SearchModel.java twin).

A model is a dict mapping allowed top-level JSON query keys to operator specs
(plans/operators.py). ``_open_`` / ``_close_`` are pre/post hooks
(SearchModel.java:22-31,99-110). Models are parsed once and immutable
(SearchModel.java:37-38 "Models considered to be immutable") — build them at
session start, reuse across queries.

Build semantics (QueryBuilder.build, QueryBuilder.java:165-199):
- onopen first, then one operator application per JSON key in order,
- unknown key → error, unless ``__``-prefixed (reference-keeping keys, B11),
- facet finalization: ``facet=true`` param + assembled ``json.facet``,
- FacetResponseHandler added when facets/decorators present,
- onclose last.
"""

from __future__ import annotations

import json as _json
from pathlib import Path
from typing import Any

from solrutils_spark.plans.operators import (
    NOOP,
    FacetResponseHandler,
    Operator,
    parse_operator,
)
from solrutils_spark.plans.plan import QueryPlan


class UndefinedQueryElement(ValueError):
    pass


class SearchModel:
    def __init__(self, spec: dict[str, Any]):
        self.onopen: Operator | None = None
        self.onclose: Operator | None = None
        self.model: dict[str, Operator] = {}
        for key, child in spec.items():
            op = parse_operator(child)
            if op is None:
                op = NOOP
            if key.startswith("_"):
                if key == "_open_":
                    self.onopen = op
                elif key == "_close_":
                    self.onclose = op
                # unknown predefined keys ignored (reference logs an error)
            else:
                self.model[key] = op

    @classmethod
    def load(cls, path: str | Path) -> "SearchModel":
        return cls(_json.loads(Path(path).read_text()))

    def get(self, key: str) -> Operator | None:
        return self.model.get(key)

    def build(self, plan: QueryPlan, json_query: dict[str, Any]) -> QueryPlan:
        plan.json = json_query
        plan.model = self
        if self.onopen is not None:
            self.onopen.apply(plan, None)
        for key, value in json_query.items():
            op = self.model.get(str(key))
            if op is None:
                if str(key).startswith("__"):
                    continue
                raise UndefinedQueryElement(f"Undefined query element: {key}")
            op.apply(plan, value)
        if plan.facet:
            plan.set("facet", True)
        if plan.json_facet is not None:
            plan.set("json.facet", "{" + ", ".join(plan.json_facet) + "}")
        if plan.facet or plan.facet_decorators:
            plan.add_response_handler(FacetResponseHandler())
        if self.onclose is not None:
            self.onclose.apply(plan, None)
        return plan


def overlay_url_params(params: dict[str, Any], json_query: dict[str, Any]) -> dict[str, Any]:
    """S2 — merge ``a.b.c=v`` URL params into the nested JSON dict
    (CustomSearchHandler.toMap, CustomSearchHandler.java:197-238): dot-path
    splitting with digit guard (keys with digit-leading segments are left
    flat), multi-value → list."""
    for key, val in params.items():
        if isinstance(val, (list, tuple)):
            val = list(val) if len(val) > 1 else val[0]
        parts = key.split(".")
        if any(p[:1].isdigit() for p in parts):
            json_query[key] = val
            continue
        d = json_query
        for p in parts[:-1]:
            nxt = d.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                d[p] = nxt
            d = nxt
        d[parts[-1]] = val
    return json_query
