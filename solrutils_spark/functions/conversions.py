"""C1-C15 — the scalar Conversion chain (query-compile side).

Behavioral port of the reference's conversion system (Conversion.java:34-479;
goldens from its own ConversionTest.java reproduced in
tests/test_conversions.py). Key semantics preserved exactly:

- A spec is ``name[(args)][,name2[(args)]...]``; args are ``k=v`` pairs,
  values optionally single/double-quoted, bare-empty value → "true"
  (Conversion.parse/parseArgs, Conversion.java:61-172).
- **Chain order is inverted**: each conversion applies its ``next`` (the
  conversion listed AFTER it) first, then itself — so
  ``default(value='123'),uppercase`` uppercases first, then defaults
  (ConversionTest.java:44-47). ``join`` is the exception: it applies the rest
  of the chain to EACH list element before joining (Conversion.java:262-304).
- Values are the JSON-surface types: str, float (JSON numbers), bool, list,
  dict, None, datetime. ``int`` converts only floats (noggit-parses-numbers-
  as-Double semantics, Conversion.java:187-198).
- All conversions null-propagate except ``default`` and ``const``.

Data-side equivalents live in :mod:`column_conversions` (Column exprs).
"""

from __future__ import annotations

import re
from datetime import datetime

from solrutils_spark.functions.dates import iso_instant, to_solr_date
from solrutils_spark.functions.text import escape_query_chars


class Conversion:
    next: "Conversion | None" = None

    def setup(self, props: dict[str, str]) -> None:
        pass

    def apply(self, value):
        raise NotImplementedError

    def _chain(self, value):
        return self.next.apply(value) if self.next is not None else value


class _None(Conversion):
    def apply(self, value):
        return value


NONE = _None()


class Const(Conversion):
    def __init__(self, value):
        self.const_val = value

    def apply(self, value):
        return self.const_val


class ToInt(Conversion):
    def apply(self, value):
        value = self._chain(value)
        if isinstance(value, float):
            return str(int(value))
        return value


class ToString(Conversion):
    before = ""
    after = ""

    def setup(self, props):
        self.before = props.get("before", self.before)
        self.after = props.get("after", self.after)

    def apply(self, value):
        value = self._chain(value)
        if value is None:
            return None
        return self.before + _stringify(value) + self.after


class Default(Conversion):
    value = None

    def setup(self, props):
        if "value" in props:
            self.value = props["value"]

    def apply(self, value):
        value = self._chain(value)
        return self.value if value is None else value


class Uppercase(Conversion):
    def apply(self, value):
        value = self._chain(value)
        return _stringify(value).upper() if value is not None else None


class Lowercase(Conversion):
    def apply(self, value):
        value = self._chain(value)
        return _stringify(value).lower() if value is not None else None


class Escape(Conversion):
    def apply(self, value):
        value = self._chain(value)
        return escape_query_chars(_stringify(value)) if value is not None else None


class Quotes(Conversion):
    def apply(self, value):
        value = self._chain(value)
        if value is None:
            return None
        s = _stringify(value)
        return '"' + re.sub(r'(["\\])', r"\\\1", s) + '"'


class MaxLen(Conversion):
    length = 128

    def setup(self, props):
        if "length" in props:
            try:
                self.length = int(props["length"])
            except ValueError as e:
                raise ValueError(f"'int' value expected: {props['length']}") from e

    def apply(self, value):
        value = self._chain(value)
        if value is None:
            return None
        s = _stringify(value)
        return s[: self.length]


class Join(Conversion):
    prefix: str | None = None
    postfix: str | None = None
    separator: str | None = " "

    def setup(self, props):
        self.prefix = props.get("prefix", self.prefix)
        self.postfix = props.get("postfix", self.postfix)
        self.separator = props.get("separator", self.separator)

    def apply(self, value):
        if value is None:
            return None
        buf: list[str] = []
        if isinstance(value, list):
            first = True
            for v in value:
                if self.next is not None:
                    v = self.next.apply(v)
                if v is None:
                    continue
                if self.separator is not None and not first:
                    buf.append(self.separator)
                first = False
                if self.prefix is not None:
                    buf.append(self.prefix)
                buf.append(_stringify(v))
                if self.postfix is not None:
                    buf.append(self.postfix)
        else:
            value = self._chain(value)
            if self.prefix is not None:
                buf.append(self.prefix)
            buf.append(_stringify(value))
            if self.postfix is not None:
                buf.append(self.postfix)
        return "".join(buf)


class Replace(Conversion):
    what: str | None = None
    pattern: re.Pattern | None = None
    with_: str = " "

    def setup(self, props):
        if "with" in props:
            self.with_ = props["with"]
        if "what" in props:
            self.what = props["what"]
        if "pattern" in props:
            self.pattern = re.compile(props["pattern"])

    def apply(self, value):
        value = self._chain(value)
        if value is None:
            return None
        s = _stringify(value)
        if self.pattern is not None:
            # Java replaceAll replacement syntax ($1) → re syntax (\1)
            return self.pattern.sub(_java_repl(self.with_), s)
        if self.what is not None:
            return s.replace(self.what, self.with_)
        return value


class Match(Conversion):
    pattern: re.Pattern | None = None
    separator = " "

    def setup(self, props):
        if "separator" in props:
            self.separator = props["separator"]
        if "pattern" in props:
            self.pattern = re.compile(props["pattern"])

    def apply(self, value):
        value = self._chain(value)
        if value is None:
            return None
        return self.separator.join(m.group() for m in self.pattern.finditer(_stringify(value)))


class Substr(Conversion):
    start = 0
    end = 0

    def setup(self, props):
        if "start" in props:
            self.start = int(props["start"])
        if "end" in props:
            self.end = int(props["end"])

    def apply(self, value):
        value = self._chain(value)
        if value is None:
            return None
        v = _stringify(value)
        s = max(len(v) + self.start if self.start < 0 else self.start, 0)
        e = min(len(v) + self.end if self.end <= 0 else self.end, len(v))
        return "" if s >= e else v[s:e]


class UTCString(Conversion):
    def apply(self, value):
        value = self._chain(value)
        if value is None:
            return None
        if isinstance(value, datetime):
            return iso_instant(value)
        return value


class SolrDate(Conversion):
    def apply(self, value):
        value = self._chain(value)
        if value is None:
            return None
        return to_solr_date(_stringify(value))


def _stringify(value) -> str:
    """Java's toString for the JSON value space (Double 2.0 → '2.0', bool → 'true')."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float) and value.is_integer():
        return f"{value:.1f}"
    return str(value)


def _java_repl(repl: str) -> str:
    return re.sub(r"\$(\d)", r"\\\1", repl)


_REGISTRY: dict[str, type[Conversion]] = {
    "int": ToInt,
    "string": ToString,
    "default": Default,
    "uppercase": Uppercase,
    "lowercase": Lowercase,
    "escape": Escape,
    "quotes": Quotes,
    "max": MaxLen,
    "join": Join,
    "replace": Replace,
    "match": Match,
    "substr": Substr,
    "utc": UTCString,
    "SolrDate": SolrDate,
}


def create(name: str) -> Conversion:
    if name == "none":
        return NONE
    cls = _REGISTRY.get(name)
    if cls is None:
        raise ValueError(f"Unknown conversion name: {name}")
    return cls()


def _index_of_unquoted(text: str, ch: str, i: int) -> int:
    """Find ``ch`` at depth 0 outside quotes (Util.indexOf semantics)."""
    sq = dq = False
    while i < len(text):
        c = text[i]
        if c == "'" and not dq:
            sq = not sq
        elif c == '"' and not sq:
            dq = not dq
        elif c == ch and not sq and not dq:
            return i
        i += 1
    return -1


def parse_args(text: str) -> dict[str, str]:
    props: dict[str, str] = {}
    p = i = 0
    n = len(text)
    sq = dq = False
    name: str | None = None
    while i < n:
        c = text[i]
        i += 1
        if c == ",":
            if sq or dq:
                continue
            if name is not None:
                v = text[p : i - 1].strip()
                props[name] = v if v else "true"
                name = None
            p = i
        elif c == "=":
            if sq or dq:
                continue
            name = text[p : i - 1].strip()
            p = i
        elif c == '"':
            if sq:
                continue
            if dq:
                props[name] = text[p : i - 1]
                name = None
                dq = False
            else:
                if text[p : i - 1].strip():
                    raise ValueError(f"Unexpected text before '\"' in: {text}")
                dq = True
            p = i
        elif c == "'":
            if dq:
                continue
            if sq:
                props[name] = text[p : i - 1]
                name = None
                sq = False
            else:
                if text[p : i - 1].strip():
                    raise ValueError(f"Unexpected text before single quote in: {text}")
                sq = True
            p = i
    if name is not None:
        v = text[p:].strip()
        props[name] = v if v else "true"
    return props


def parse(text: str) -> Conversion | None:
    """Parse a conversion-chain spec → linked Conversion (reference parse)."""
    p = i = 0
    n = len(text)
    root: Conversion | None = None
    last: Conversion | None = None

    def attach(c: Conversion) -> Conversion:
        nonlocal root, last
        if root is None:
            root = last = c
        else:
            last.next = c
            last = c
        return c

    while i < n:
        c = text[i]
        i += 1
        if c == "(":
            tmp = attach(create(text[p : i - 1].strip()))
            p = i
            i = _index_of_unquoted(text, ")", p)
            if i == -1:
                raise ValueError(f"Unmatched '(' in: {text}")
            tmp.setup(parse_args(text[p:i]))
            i += 1
            p = i
        elif c == ",":
            name = text[p : i - 1].strip()
            if name:
                attach(create(name))
            p = i
    name = text[p:].strip()
    if name:
        attach(create(name))
    return root


def apply_spec(spec: str, value):
    conv = parse(spec)
    return conv.apply(value) if conv else value
