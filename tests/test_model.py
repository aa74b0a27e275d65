"""Layer-B model/operator tests: compile JSON queries → QueryPlan params.

Pins the reference's query-construction semantics (SURVEY.md §2.8): operator
dispatch, currentValue threading, if/elseif gluing, switch, call macro,
filter groups, sortBy splicing, facet assembly, undefined-key rejection.
"""

from __future__ import annotations

import pytest

from solrutils_spark.plans.model import SearchModel, UndefinedQueryElement, overlay_url_params
from solrutils_spark.plans.operators import Facets
from solrutils_spark.plans.plan import QueryPlan


def build(model_spec, json_query):
    plan = QueryPlan()
    SearchModel(model_spec).build(plan, json_query)
    return plan


def test_q_template_with_conversion():
    plan = build(
        {"query": {"op": "q", "body": "content:${value:escape}"}},
        {"query": "a:b c"},
    )
    assert plan.get_param("q") == "content:a\\:b\\ c"


def test_undefined_key_rejected_but_dunder_passes():
    model = {"query": {"op": "q", "body": "${value}"}}
    with pytest.raises(UndefinedQueryElement):
        build(model, {"nope": 1})
    plan = build(model, {"__ref": 1, "query": "x"})
    assert plan.get_param("q") == "x"


def test_open_close_hooks_and_paging():
    model = {
        "_open_": [{"op": "set", "name": "rows", "value": "10"}],
        "_close_": [
            {"op": "get", "name": "/page"},
            {
                "op": "switch",
                "check": "value",
                "choices": {"null": {"op": "noop"}},
                "default": "Else",
            },
        ],
        "page": {"op": "set", "name": "page", "body": "${value:int}"},
    }
    plan = build(model, {"page": 3.0})
    assert plan.get_param("rows") == "10"
    assert plan.get_param("page") == "3"


def test_filter_group_dispatch_and_raw():
    model = {
        "filter": {
            "op": "fq",
            "strict": False,
            "filters": {
                "lang": {"body": "lang = '${value}'"},
                "repo": {"body": "repo = '${value:lowercase}'"},
            },
        }
    }
    plan = build(model, {"filter": {"lang": "py", "repo.x": "ORG/Repo"}})
    assert plan.get_params("fq") == ["lang = 'py'", "repo = 'org/repo'"]
    # list-of-maps; strings inside lists are ignored (FilterBy.java:85-90)
    plan = build(model, {"filter": [{"lang": "go"}, "ignored-in-list"]})
    assert plan.get_params("fq") == ["lang = 'go'"]
    # raw string passthrough only at top level (strict=false)
    plan = build(model, {"filter": "n_chars > 100"})
    assert plan.get_params("fq") == ["n_chars > 100"]


def test_if_elseif_else_gluing():
    model = {
        "k": [
            {"op": "if", "eq": "a", "do": [{"op": "set", "name": "hit", "value": "A"}]},
            {"op": "elseif", "eq": "b", "do": [{"op": "set", "name": "hit", "value": "B"}]},
            {"op": "else", "do": [{"op": "set", "name": "hit", "value": "Z"}]},
        ]
    }
    assert build(model, {"k": "a"}).get_param("hit") == "A"
    assert build(model, {"k": "b"}).get_param("hit") == "B"
    assert build(model, {"k": "q"}).get_param("hit") == "Z"


def test_if_has_get_reads_refs():
    model = {
        "k": [
            {"op": "if", "get": "/other", "do": [{"op": "set", "name": "v", "body": "${value}"}]},
            {"op": "else", "do": [{"op": "set", "name": "v", "value": "none"}]},
        ],
        "other": {"op": "noop"},
    }
    assert build(model, {"k": 1.0, "other": "X"}).get_param("v") == "X"
    assert build(model, {"k": 1.0}).get_param("v") == "none"


def test_switch_check_type():
    model = {
        "k": {
            "op": "switch",
            "check": "type",
            "choices": {
                "List": {"op": "set", "name": "t", "value": "list"},
                "Map": {"op": "set", "name": "t", "value": "map"},
                "String": {"op": "set", "name": "t", "value": "str"},
                "Double": {"op": "set", "name": "t", "value": "num"},
            },
        }
    }
    assert build(model, {"k": [1]}).get_param("t") == "list"
    assert build(model, {"k": {"a": 1}}).get_param("t") == "map"
    assert build(model, {"k": "s"}).get_param("t") == "str"
    assert build(model, {"k": 2.5}).get_param("t") == "num"


def test_composite_current_value_threading():
    model = {
        "k": [
            {"op": "get", "name": "/alt"},
            {"op": "set", "name": "out", "body": "${value}"},
        ],
        "alt": {"op": "noop"},
    }
    plan = build(model, {"k": "original", "alt": "replaced"})
    assert plan.get_param("out") == "replaced"


def test_call_macro_invokes_parent_with_key():
    model = {
        "filter": {
            "op": "fq",
            "filters": {
                "lang": {"body": "lang = '${value}'"},
                "default_lang": {"op": "call", "key": "lang", "body": '"py"'},
            },
        }
    }
    plan = build(model, {"filter": {"default_lang": None}})
    assert plan.get_params("fq") == ["lang = 'py'"]


def test_foreach_applies_per_element():
    model = {"k": {"op": "foreach", "do": [{"op": "add", "name": "x", "body": "${value}"}]}}
    assert build(model, {"k": ["a", "b"]}).get_params("x") == ["a", "b"]
    assert build(model, {"k": "solo"}).get_params("x") == ["solo"]


def test_sortby_splicing():
    model = {
        "sortBy": {
            "op": "sortBy",
            "map": {
                "date": "publish_date desc,score desc",
                "title": "title_s asc",
            },
        }
    }
    assert build(model, {"sortBy": "date"}).get_param("sort") == "publish_date desc,score desc"
    # direction change replaces primary, keeps secondaries
    assert build(model, {"sortBy": "date asc"}).get_param("sort") == "publish_date asc,score desc"
    # raw passthrough
    assert build(model, {"sortBy": "!x desc"}).get_param("sort") == "x desc"
    # unknown name ignored
    assert build(model, {"sortBy": "nope"}).get_param("sort") is None
    # multi-sort passed in → used verbatim with key prefix
    assert (
        build(model, {"sortBy": "date asc,title asc"}).get_param("sort") == "date asc,title asc"
    )


def test_facets_assembly_and_key_extraction():
    model = {
        "facet": {
            "op": "facet",
            "facets": {
                "lang": {"type": "field", "body": "{!key=${key}}lang"},
                "recent": {"type": "query", "body": "ts:[NOW-7DAY TO *]"},
                "size": {"type": "json", "body": '"${key}": {"type":"terms","field":"n_chars"}'},
            },
        }
    }
    plan = build(model, {"facet": ["lang", {"recent": None, "size.a": None}]})
    assert plan.get_params("facet.field") == ["{!key=lang}lang"]
    assert plan.get_params("facet.query") == ["ts:[NOW-7DAY TO *]"]
    assert plan.get_param("facet") == "true"
    assert plan.get_param("json.facet") == '{"size.a": {"type":"terms","field":"n_chars"}}'
    assert Facets.extract_key("{!key=lang}lang") == "lang"
    assert Facets.extract_key("{!key='xy'}f") == "xy"
    # space terminates the key even inside quotes (Facets.java:125-127)
    assert Facets.extract_key("{!key='x y'}f") == "x"
    assert Facets.extract_key("plain") == "plain"
    assert len(plan.response_handlers) == 1  # FacetResponseHandler auto-added


def test_facet_decorator_title():
    model = {
        "facet": {
            "op": "facet",
            "facets": {
                "lang": {
                    "type": "field",
                    "body": "lang",
                    "valueTitle": "uppercase",
                    "data": {"note": "langs"},
                }
            },
        }
    }
    plan = build(model, {"facet": "lang"})
    response = {"facet_counts": {"facet_fields": {"lang": {"py": 10, "go": 5}}}}
    for h in plan.response_handlers:
        h.process(plan, response)
    assert response["facets"]["lang"]["buckets"] == [
        {"val": "py", "count": 10, "title": "PY"},
        {"val": "go", "count": 5, "title": "GO"},
    ]
    assert response["facets"]["lang"]["note"] == "langs"
    assert "facet_counts" not in response


def test_url_param_overlay():
    q = {"a": {"b": 1}}
    overlay_url_params({"a.c": "2", "x": ["1", "2"], "v.1.z": "flat"}, q)
    assert q["a"] == {"b": 1, "c": "2"}
    assert q["x"] == ["1", "2"]
    assert q["v.1.z"] == "flat"  # digit guard keeps it flat
