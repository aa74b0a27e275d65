"""B1-B11 + P1-P3 + T1 + A1-A8 — the query-model operator algebra.

Behavioral port of ``dinom.solr.op.*`` (each class docstring cites its
reference twin). Models are JSON/dict instead of XML; an operator spec is::

    {"op": "<name>", ...attrs..., "body": "<template text>"}     (leaf)
    [spec, spec, ...]                                            (composite)

Operator names mirror the reference tag registry
(SolrQueryOperator.getClass, SolrQueryOperator.java:107-136):
``q fq facet set add remove get switch sortBy call foreach search
if elseif else response``.

All operators run at query-compile time (driver side): they mutate a
:class:`~solrutils_spark.plans.plan.QueryPlan`, never data.
"""

from __future__ import annotations

import json as _json
import re
import urllib.parse
from typing import Any

from solrutils_spark.functions import template as T
from solrutils_spark.functions.conversions import NONE, _stringify
from solrutils_spark.functions.conversions import parse as parse_conv
from solrutils_spark.plans.plan import QueryPlan


class Operator:
    """SolrQueryOperator twin (SolrQueryOperator.java:16-60)."""

    def parse(self, spec: dict) -> "Operator | None":
        return self

    def apply(self, plan: QueryPlan, value) -> None:
        raise NotImplementedError

    def apply_keyed(self, plan: QueryPlan, key: str, value) -> None:
        self.apply(plan, value)

    def set_parent(self, op: "Operator") -> None:
        pass


class Noop(Operator):
    def apply(self, plan, value):
        pass


NOOP = Noop()


class Composite(Operator):
    """B1 — ordered operator list with currentValue threading + if-gluing
    (Composite.java:21-103)."""

    def __init__(self):
        self.list: list[Operator] = []

    def parse(self, spec) -> Operator | None:
        self.list = []
        last_if: If | None = None
        for child in spec:
            op = parse_operator(child)
            if op is None:
                continue
            if isinstance(op, If):
                # the reference glues EVERY consecutive If into one chain
                # (Composite.java:37-55) — a second bare "if" acts as elseif
                if last_if is None:
                    self.list.append(op)
                    last_if = op
                else:
                    last_if.next = op
                    last_if = op
            else:
                self.list.append(op)
                last_if = None
        if not self.list:
            return None
        return self.list[0] if len(self.list) == 1 else self

    def apply(self, plan, value):
        old = plan.current_value
        plan.current_value = value
        for op in self.list:
            op.apply(plan, plan.current_value)
        plan.current_value = old

    def set_parent(self, op):
        for ch in self.list:
            ch.set_parent(op)


class If(Composite):
    """B2 — if/elseif/else chains with has/get/eq/ne/contains predicates
    (If.java:11-115). Subclasses pick the predicate."""

    next: "If | None" = None
    arg: str = ""

    def parse(self, spec):
        body = spec.get("do", [])
        super().parse(body if isinstance(body, list) else [body])
        if spec.get("op") == "else":
            return self
        for attr, cls in _IF_PREDICATES.items():
            if attr in spec:
                op = cls()
                op.list = self.list
                op.arg = str(spec[attr])
                return op
        raise ValueError(f"comparison attribute expected: {spec}")

    def apply(self, plan, value):  # the bare 'else' branch
        Composite.apply(self, plan, value)


class IfHas(If):
    def choose(self, value, v):
        return value

    def apply(self, plan, value):
        v = plan.get_value(self.arg)
        if v is not None:
            Composite.apply(self, plan, self.choose(value, v))
        elif self.next is not None:
            self.next.apply(plan, value)


class IfGet(IfHas):
    def choose(self, value, v):
        return v


class IfEquals(If):
    def matches(self, val) -> bool:
        return self.arg == ("" if val is None else _stringify(val))

    def apply(self, plan, value):
        if self.matches(value):
            Composite.apply(self, plan, value)
        elif self.next is not None:
            self.next.apply(plan, value)


class IfNotEquals(IfEquals):
    def matches(self, val):
        return not super().matches(val)


class IfContains(IfEquals):
    def matches(self, val):
        return False if val is None else self.arg in _stringify(val)


_IF_PREDICATES = {
    "has": IfHas,
    "get": IfGet,
    "eq": IfEquals,
    "ne": IfNotEquals,
    "contains": IfContains,
}


class Switch(Operator):
    """B3 — dispatch on value string or runtime type name (Switch.java:23-105)."""

    def __init__(self):
        self.choices: dict[str, Operator] = {}
        self.default_op: Operator | None = None
        self.check_type = False

    def parse(self, spec):
        check = spec.get("check", "value")
        if check == "type":
            self.check_type = True
        elif check != "value":
            raise ValueError("'check' must be 'type' or 'value'.")
        default_name = spec.get("default", "Else")
        for name, child in spec.get("choices", {}).items():
            op = parse_operator(child)
            if op is not None:
                self.choices[name] = op
        self.default_op = self.choices.pop(default_name, None)
        if self.default_op is None and default_name != "Else":
            raise ValueError(f"default choice is not defined: {default_name}")
        return self if (self.choices or self.default_op) else None

    def apply(self, plan, value):
        if value is None:
            v = "null"
        elif self.check_type:
            if isinstance(value, list):
                v = "List"
            elif isinstance(value, dict):
                v = "Map"
            elif isinstance(value, bool):
                v = "Boolean"
            elif isinstance(value, (int, float)):
                v = "Double"  # JSON numbers are Double in the reference surface
            else:
                v = "String"
        else:
            v = _stringify(value)
        op = self.choices.get(v) or self.default_op
        if op is not None:
            op.apply(plan, value)


class Param(Operator):
    """B6 — <set>: set a raw plan parameter (Param.java:23-52)."""

    name: str = ""
    template: T.Template

    def parse(self, spec):
        self.name = spec.get("name", "")
        if not self.name:
            raise ValueError("'name' attribute is required.")
        if "value" in spec:
            self.template = T.ConstTemplate(str(spec["value"]))
        else:
            self.template = T.compile(spec.get("body", ""))
        return self

    def apply(self, plan, value):
        plan.set(self.name, self.template.apply(value))


class ParamAdd(Param):
    def apply(self, plan, value):
        plan.add(self.name, self.template.apply(value))


class ParamRemove(Param):
    def apply(self, plan, value):
        plan.remove(self.name)


class ParamGet(Operator):
    """B6 — <get>: read a value reference into currentValue (Param.java:63-80)."""

    def parse(self, spec):
        self.value_ref = spec.get("name", "")
        if not self.value_ref:
            raise ValueError("'name' attribute expected")
        return self

    def apply(self, plan, value):
        plan.current_value = plan.get_value(self.value_ref)


class Query(Operator):
    """P1 — <q>: template-render the scoring query (Query.java:10-31)."""

    def parse(self, spec):
        def_type = spec.get("valueType", "")
        conv = parse_conv(def_type) if def_type else NONE
        self.template = T.compile(spec.get("body", ""), conv or NONE)
        return self

    def apply(self, plan, value):
        plan.set_query(self.template.apply(value))


class FilterQuery(Operator):
    """P2 — leaf <fq>: template-render one non-scoring filter
    (FilterQuery.java:11-64). Filters NEVER contribute to score."""

    def __init__(self, parent: "FilterQuery | None" = None):
        self.def_type = NONE
        self.template: T.Template | None = None
        if parent is not None:
            self.set_parent(parent)

    def set_properties(self, spec):
        v = spec.get("valueType", "")
        self.def_type = (parse_conv(v) or NONE) if v else NONE

    def set_parent(self, op):
        if isinstance(op, FilterQuery):
            self.def_type = op.def_type

    def parse(self, spec):
        self.set_properties(spec)
        self.template = T.compile(spec.get("body", ""), self.def_type)
        return self

    def apply(self, plan, value):
        if self.template is None:
            return
        fq = self.template.apply(value)
        if fq is not None:
            plan.add_filter_query(fq)


class FilterBy(FilterQuery):
    """P3 — <fq> group: named sub-filters, key[.suffix] dispatch, Map /
    List-of-Map / raw-string (strict=false) values (FilterBy.java:19-102)."""

    def __init__(self):
        super().__init__()
        self.filters: dict[str, Operator] | None = None
        self.strict = True

    def parse(self, spec):
        if "body" in spec and "filters" not in spec:
            return FilterQuery().parse(spec)
        self.set_properties(spec)
        self.strict = spec.get("strict", True) is not False
        self.filters = {}
        for name, child in spec.get("filters", {}).items():
            if isinstance(child, str):
                child = {"body": child}
            op: Operator
            if isinstance(child, dict) and ("filters" in child or child.get("op") == "fq"):
                op = FilterBy()
            elif isinstance(child, dict) and "op" in child:
                op = _REGISTRY[child["op"]]()
            else:
                op = FilterQuery(self)
            op.set_parent(self)
            parsed = op.parse(child)
            if parsed is not None:
                self.filters[name] = parsed
        return self

    def apply_keyed(self, plan, key, value):
        key = key.split(".", 1)[0]
        fq = self.filters.get(key)
        if fq is not None:
            fq.apply(plan, value)

    def apply(self, plan, value):
        if self.filters is None:
            super().apply(plan, value)
        elif isinstance(value, dict):
            for k, v in value.items():
                self.apply_keyed(plan, str(k), v)
        elif isinstance(value, list):
            for v in value:
                if isinstance(v, dict):
                    for k, vv in v.items():
                        self.apply_keyed(plan, str(k), vv)
        elif isinstance(value, str) and not self.strict:
            plan.add_filter_query(value)


class SortBy(Operator):
    """T1 — abstract sort names → concrete sorts, '!' raw passthrough,
    direction/secondary-sort splicing (SortBy.java:16-96)."""

    def parse(self, spec):
        self.name_map = {k.lower(): v for k, v in spec.get("map", {}).items()}
        return self

    def apply(self, plan, value):
        if not isinstance(value, str):
            return
        key = value
        if key.startswith("!"):
            plan.set("sort", key[1:])
            return
        idx = key.find(" ")
        if idx == -1:
            direction = ""
        else:
            direction = key[idx:]
            key = key[:idx]
        sort_by = self.name_map.get(key.lower())
        if sort_by is None:
            return
        if direction:
            i0 = direction.find(",")
            i1 = sort_by.find(" ")
            if i0 != -1:
                sort_by = key + (direction[:-1] if direction.endswith(",") else direction)
            elif i1 != -1:
                j = sort_by.find(",", i1 + 1)
                sort_by = sort_by[:i1] + direction + (sort_by[j:] if j != -1 else "")
            else:
                sort_by += direction
        plan.set("sort", sort_by)


class Call(Composite):
    """B4 — invoke the parent operator with a constant/templated JSON value
    (Call.java:13-70)."""

    def __init__(self):
        super().__init__()
        self.key = ""
        self.value = None
        self.template: T.Template | None = None
        self.parent: Operator | None = None

    def parse(self, spec):
        self.key = spec.get("key", "")
        body = spec.get("body", "")
        if "value" in spec:
            self.value = spec["value"]
        elif body:
            self.template = T.compile(body)
            if isinstance(self.template, T.ConstTemplate):
                self.value = _json.loads(self.template.apply(None))
                self.template = None
        return self

    def set_parent(self, op):
        self.parent = op

    def apply(self, plan, value):
        if self.parent is None:
            return
        if self.template is None:
            self.parent.apply_keyed(plan, self.key, self.value)
        else:
            v = _json.loads(self.template.apply(value))
            self.parent.apply_keyed(plan, self.key, v)


class ForEach(Composite):
    """B5 — apply children per list element (ForEach.java:16-41)."""

    def parse(self, spec):
        body = spec.get("do", [])
        Composite.parse(self, body)
        return self

    def apply(self, plan, value):
        if isinstance(value, list):
            for v in value:
                Composite.apply(self, plan, v)
        else:
            Composite.apply(self, plan, value)


class FacetDecorator:
    """A8 — post-agg enrichment (FacetDecorator.java:9-21, FacetOp.DataDecorator)."""

    def __init__(self, key: str, data: str | dict | None, value_title: str | None):
        self.key = key
        self.data: dict | None = None
        if data:
            obj = _json.loads(data) if isinstance(data, str) else data
            self.data = obj if isinstance(obj, dict) else {"data": obj}
        self.value_title_op = parse_conv(value_title) if value_title else None

    def clone_for(self, key: str) -> "FacetDecorator":
        d = FacetDecorator.__new__(FacetDecorator)
        d.key = key
        d.data = self.data
        d.value_title_op = self.value_title_op
        return d

    def decorate(self, facets: dict) -> None:
        section = facets.get(self.key)
        if not isinstance(section, dict):
            return
        if self.data:
            section.update(self.data)
        if self.value_title_op is not None:
            buckets = section.get("buckets")
            if isinstance(buckets, list):
                for b in buckets:
                    if isinstance(b, dict) and b.get("val") is not None:
                        b["title"] = self.value_title_op.apply(b["val"])


class FacetOp(Operator):
    """A2-A5 — one typed facet spec (FacetOp.java:28-98)."""

    def __init__(self):
        self.key = ""
        self.type: str | None = None
        self.title_decorator: FacetDecorator | None = None
        self.template: T.Template | None = None
        self.key_param = False

    def parse(self, spec):
        self.key = spec.get("_key", spec.get("name", ""))
        t = spec.get("type", "")
        if t in ("field", "query", "range", "json"):
            self.type = t
        if self.type is None:
            raise ValueError("'type' attribute can be one of field,query,range,json")
        data = spec.get("data")
        value_title = spec.get("valueTitle")
        if data or value_title:
            self.title_decorator = FacetDecorator(self.key, data, value_title)
        self.template = T.compile(spec.get("body", ""))
        if isinstance(self.template, T.MapValue):
            self.key_param = "key" in self.template.names
        return self

    def apply_keyed(self, plan, key, value):
        if self.key_param:
            if value is None:
                value = {}
            elif not isinstance(value, dict):
                value = {"value": value}
            else:
                value = dict(value)
            value.setdefault("key", key)
        result = self.template.apply(value)
        dec = None
        if self.title_decorator is not None:
            dec = self.title_decorator if self.key == key else self.title_decorator.clone_for(key)
        plan.add_facet(self.type, result, dec)

    def apply(self, plan, value):
        self.apply_keyed(plan, self.key, value)


class Facets(Operator):
    """A1 — facet dispatcher: String / List / Map specs, key[.suffix] routing
    (Facets.java:20-107)."""

    def __init__(self):
        self.ops: dict[str, Operator] = {}

    def parse(self, spec):
        for name, child in spec.get("facets", {}).items():
            if isinstance(child, dict) and "type" in child:
                child = dict(child)
                child["_key"] = name
                op = FacetOp().parse(child)
            else:
                op = parse_operator(child)
            if op is not None:
                self.ops[name] = op
                op.set_parent(self)
        return self

    def apply_keyed(self, plan, key, value):
        base = key.split(".", 1)[0]
        op = self.ops.get(base)
        if op is not None:
            op.apply_keyed(plan, key, value)

    def apply(self, plan, value):
        if isinstance(value, list):
            for v in value:
                self.apply(plan, v)
        elif isinstance(value, dict):
            for k, v in value.items():
                self.apply_keyed(plan, str(k), v)
        elif value is not None:
            key = _stringify(value)
            op = self.ops.get(key)
            if op is not None:
                op.apply_keyed(plan, key, None)

    @staticmethod
    def extract_key(s: str) -> str:
        """{!key=...}field local-param key extraction (Facets.extractKey:114-128)."""
        if not s.startswith("{!"):
            return s
        idx = s.find("}")
        if idx == -1:
            return s
        key = s[idx + 1 :]
        inner = s[2:idx]
        kidx = inner.find("key=")
        if kidx == -1:
            return key
        kidx += 4
        edx = inner.find(" ", kidx)
        raw = inner[kidx:] if edx == -1 else inner[kidx:edx]
        return raw.replace("'", "")


class ResponseHandler(Operator):
    """B9 — chained post-processors (ResponseHandler.java:12-77)."""

    def apply(self, plan, value):
        plan.add_response_handler(self)

    def process(self, plan: QueryPlan, response: dict) -> None:
        raise NotImplementedError


class DataResponseHandler(ResponseHandler):
    """Merges static JSON into the response (ResponseHandler.Data)."""

    def parse(self, spec):
        obj = spec.get("data")
        if isinstance(obj, str):
            obj = _json.loads(obj)
        if not isinstance(obj, dict):
            raise ValueError("JSON object expected: {...}")
        self.data = obj
        return self

    def process(self, plan, response):
        response.update(self.data)


class FacetResponseHandler(ResponseHandler):
    """A7 — legacy facet_counts → unified facets with {val,count} buckets
    (FacetResponseHandler.java:17-70), then decorator pass."""

    def process(self, plan, response):
        facet_counts = response.get("facet_counts")
        facets = response.get("facets")
        if facets is None:
            if facet_counts is None:
                return
            facets = {}
            response["facets"] = facets
        if facet_counts is not None:
            for section in facet_counts.values():
                if isinstance(section, dict):
                    self._move_counts(facets, section)
            response.pop("facet_counts", None)
        for dec in plan.facet_decorators:
            dec.decorate(facets)

    @staticmethod
    def _move_counts(dst: dict, src: dict) -> None:
        for key, val in src.items():
            if isinstance(val, dict):
                buckets = [{"val": k, "count": v} for k, v in val.items()]
                val = {"buckets": buckets}
            dst[key] = val


class SearchOp(Operator):
    """B8 — nested sub-search (SearchOp.java:24-228): own model/json with
    ``${var}`` borrowing, raw ``params`` overrides, ``export`` re-publishing
    or ``collect`` of field values into currentValue (J1 semi-join feed)."""

    def __init__(self):
        self.model = None
        self.json: dict = {}
        self.json_extra: list[str] | None = None
        self.export: list[str] | None = None
        self.params_template: T.Template | None = None
        self.collect_fields: list[str] | None = None

    def parse(self, spec):
        from solrutils_spark.plans.model import SearchModel

        j = spec.get("json")
        if j:
            self.json = dict(j) if isinstance(j, dict) else _json.loads(j)
            for key in list(self.json.keys()):
                v = self.json[key]
                if isinstance(v, str) and v.startswith("${") and v.endswith("}"):
                    if self.json_extra is None:
                        self.json_extra = []
                    self.json_extra += [key, v[2:-1]]
                    del self.json[key]
        s = spec.get("export", "")
        if s:
            self.export = []
            for a in s.split(","):
                if "=" in a:
                    to, frm = a.split("=", 1)
                    self.export += [to.strip(), frm.strip()]
                else:
                    self.export.append(a.strip())
        p = spec.get("params", "")
        if p:
            self.params_template = T.compile(p)
        c = spec.get("collect", "")
        if c:
            self.collect_fields = [f.strip() for f in c.split(",")]
        if "model" in spec:
            self.model = SearchModel(spec["model"])
        return self

    def apply(self, plan, value):
        from solrutils_spark.plans.model import SearchModel  # noqa: F401

        if plan.searcher is None:
            raise RuntimeError("nested <search> needs an executor-bound plan")
        model = self.model
        if model is None:
            model = getattr(plan, "model", None)
        json_in = dict(self.json)
        if self.json_extra is not None:
            for i in range(1, len(self.json_extra), 2):
                val = plan.json.get(self.json_extra[i])
                if val is not None:
                    json_in[self.json_extra[i - 1]] = val

        inner = QueryPlan(searcher=plan.searcher)
        inner.model = model
        model.build(inner, json_in)
        if self.params_template is not None:
            qs = self.params_template.apply(plan.json)
            for prm in qs.split("&"):
                if "=" in prm:
                    k, v = prm.split("=", 1)
                    v = v.strip()
                    if "%" in v:
                        v = urllib.parse.unquote(v)
                    inner.set(k.strip(), v)
        result = plan.searcher(inner)

        if self.export is not None:
            if len(self.export) == 1:
                plan.response[self.export[0]] = result
            else:
                for i in range(1, len(self.export), 2):
                    plan.response[self.export[i - 1]] = result.get(self.export[i])
        elif self.collect_fields is not None:
            plan.current_value = result
        if self.collect_fields is not None:
            docs = (result.get("response") or {}).get("docs", [])
            single = len(self.collect_fields) == 1
            lst = []
            for doc in docs:
                if single:
                    v = doc.get(self.collect_fields[0])
                    if v is not None:
                        lst.append(v)
                else:
                    m = {f: doc[f] for f in self.collect_fields if doc.get(f) is not None}
                    if m:
                        lst.append(m)
            plan.current_value = lst


_REGISTRY: dict[str, type[Operator]] = {
    "if": If,
    "elseif": If,
    "else": If,
    "call": Call,
    "q": Query,
    "fq": FilterBy,
    "facet": Facets,
    "set": Param,
    "add": ParamAdd,
    "remove": ParamRemove,
    "get": ParamGet,
    "switch": Switch,
    "sortBy": SortBy,
    "search": SearchOp,
    "foreach": ForEach,
    "response": DataResponseHandler,
    "noop": Noop,
}


def parse_operator(spec) -> Operator | None:
    """Spec → operator (SolrQueryOperator.newInstance + parse twin)."""
    if spec is None:
        return None
    if isinstance(spec, list):
        return Composite().parse(spec)
    if isinstance(spec, dict):
        name = spec.get("op")
        if name is None:
            return Composite().parse([spec]) if spec else None
        cls = _REGISTRY.get(name)
        if cls is None:
            raise ValueError(f"Unknown operator: {name}")
        return cls().parse(spec)
    raise ValueError(f"Invalid operator spec: {spec!r}")
