"""Conversion goldens ported from the reference's ConversionTest.java:19-114."""

from __future__ import annotations

import pytest

from solrutils_spark.functions.conversions import Const, Lowercase, Uppercase, apply_spec, parse


def test_simple_conversions():
    cv = Uppercase()
    assert cv.apply("Upper(23a)") == "UPPER(23A)"
    assert cv.apply(None) is None

    cv = Lowercase()
    assert cv.apply(None) is None
    assert cv.apply("LoweR(23A)") == "lower(23a)"

    cv = parse("int")
    assert cv.apply(None) is None
    assert cv.apply(2.1) == "2"  # JSON numbers arrive as float (Double)
    assert cv.apply("2.1") == "2.1"  # strings pass through

    cv = parse("default(value='123'),uppercase")
    assert cv.apply(None) == "123"
    assert cv.apply("a=0.5") == "A=0.5"

    cv = Const("Const")
    assert cv.apply("other value") == "Const"


def test_quotes():
    cv = parse("quotes")
    assert cv.apply("hello") == '"hello"'
    assert cv.apply("") == '""'
    assert cv.apply(None) is None
    assert cv.apply("\\") == '"\\\\"'
    assert cv.apply('test "me"!') == '"test \\"me\\"!"'
    assert cv.apply('test \\"me"!') == '"test \\\\\\"me\\"!"'


def test_main():
    cv = parse("max(length='4')")
    assert cv.apply(None) is None
    assert cv.apply("1234567") == "1234"

    cv = parse("escape")
    assert cv.apply(None) is None
    assert cv.apply("title:Hello") == "title\\:Hello"

    cv = parse("string")
    assert cv.apply(None) is None
    assert cv.apply("x") == "x"

    cv = parse("string(before='(', after=')' ), match(pattern='\\w+', separator=',') ")
    assert cv.apply(None) is None
    assert cv.apply("one={two,three}") == "(one,two,three)"
    cv.next.separator = " "
    assert cv.apply("one=(two,three);") == "(one two three)"

    cv = parse("quotes,replace(what='\"',with=\"'\" )")
    assert cv.apply('name:"Phil"') == "\"name:'Phil'\""

    cv = parse("replace(pattern='[-;.=:]+', with=' ' )")
    assert cv.apply("a=535.23;b:=17;") == "a 535 23 b 17 "


def test_substr():
    cv = parse("substr(start='0', end='4')")
    assert cv.apply(None) is None
    assert cv.apply("1234567") == "1234"
    assert cv.apply("67") == "67"

    cv = parse("substr(start='-4', end='0')")
    assert cv.apply("1234567") == "4567"
    assert cv.apply("12") == "12"


def test_join():
    val = [1.0, 2.0, 3.0, "title:hello"]  # JSON ints arrive as Double

    cv = parse("join(separator=' OR '),escape ")
    assert cv.apply(val) == "1.0 OR 2.0 OR 3.0 OR title\\:hello"
    assert cv.apply("title:hello") == "title\\:hello"

    cv = parse("join(separator=' OR ', postfix='*'),escape ")
    assert cv.apply(val) == "1.0* OR 2.0* OR 3.0* OR title\\:hello*"
    assert cv.apply("title:hello") == "title\\:hello*"

    cv = parse("join(separator=' OR ', prefix='tag:'),quotes ")
    assert cv.apply(val) == 'tag:"1.0" OR tag:"2.0" OR tag:"3.0" OR tag:"title:hello"'
    assert cv.apply("title:hello") == 'tag:"title:hello"'


def test_join_int_elements_match_reference_rendering():
    # the reference test uses Java Integers (render without decimal); our JSON
    # surface can carry real ints too — they must render the same way
    cv = parse("join(separator=' OR '),escape ")
    assert cv.apply([1, 2, 3, "title:hello"]) == "1 OR 2 OR 3 OR title\\:hello"


def test_unknown_name_rejected():
    with pytest.raises(ValueError, match="Unknown conversion"):
        parse("nope(x=1)")


def test_apply_spec_shortcut():
    assert apply_spec("uppercase", "abc") == "ABC"
