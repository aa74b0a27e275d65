"""Template goldens ported from the reference's TemplateTest.java:20-79."""

from __future__ import annotations

from solrutils_spark.functions import template as T

HELLO = "Hello, World!"


def test_const():
    tmpl = T.compile(HELLO)
    assert isinstance(tmpl, T.ConstTemplate)
    assert tmpl.apply(None) == HELLO


def test_value():
    tmpl = T.compile("${value}")
    assert tmpl is T.VALUE
    assert tmpl.apply("Hello, Mister!") == "Hello, Mister!"
    assert tmpl.apply(12345) == "12345"
    assert tmpl.apply(None) == ""

    tmpl = T.compile("${value:int}")
    assert tmpl.apply("1") == "1"
    assert tmpl.apply(1.0) == "1"


def test_single_value():
    s = HELLO.replace("World", "${value}")
    assert T.compile(s).apply("World") == HELLO

    s2 = s + s
    assert T.compile(s2).apply("World") == HELLO + HELLO

    s3 = "${value}" + HELLO + "${value}"
    assert T.compile(s3).apply("Oh..") == "Oh.." + HELLO + "Oh.."


def test_multi_value():
    s = HELLO.replace("World", "${first}") + " and ${second} too!"
    tmpl = T.compile(s)
    assert isinstance(tmpl, T.MapValue)
    out = tmpl.apply({"first": "Robert", "second": "Terra"})
    assert out == "Hello, Robert! and Terra too!"
    assert tmpl.apply(None) == "Hello, ! and  too!"


def test_map_wraps_scalar_as_value():
    tmpl = T.compile("q=${value} f=${other}")
    assert tmpl.apply("X") == "q=X f="


def test_slot_conversion_chain():
    tmpl = T.compile("tag:${name:quotes,uppercase}")
    assert tmpl.apply({"name": "phil"}) == 'tag:"PHIL"'
