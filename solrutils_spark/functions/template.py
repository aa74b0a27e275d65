"""C16 — the ``text ${name:conv} text`` template engine (query-compile side).

Behavioral port of the reference Template (Template.java:18-225; goldens from
TemplateTest.java:20-79). Semantics preserved:

- no ``${`` → Const (constant fast path, Template.java:42-44)
- exactly ``${value}`` → the shared VALUE template (identity; null → "")
- every slot named ``value`` → PlainValue: the whole input value feeds each
  slot (through its conversion chain)
- any other name → MapValue: the input must be a dict (a non-dict input is
  wrapped as ``{"value": input}``, null → empty dict); missing names render
  as empty (conversion applied to None; None output appends nothing)
"""

from __future__ import annotations

from solrutils_spark.functions import conversions as conv
from solrutils_spark.functions.conversions import NONE, Conversion, _stringify


class Template:
    def apply(self, val) -> str:
        raise NotImplementedError


class ConstTemplate(Template):
    def __init__(self, text: str):
        if text is None:
            raise ValueError("null template text")
        self.s = text

    def apply(self, val) -> str:
        return self.s


class _Value(Template):
    def apply(self, val) -> str:
        return "" if val is None else _stringify(val)


VALUE = _Value()


class PlainValue(Template):
    def __init__(self, texts: list[str], convs: list[Conversion]):
        if len(texts) < len(convs):
            raise ValueError("'text/values' count mismatch.")
        self.texts = texts
        self.convs = convs

    def _slot_value(self, slot: Conversion, val, i: int):
        return slot.apply(val)

    def apply(self, val) -> str:
        out: list[str] = []
        i = 0
        for i, slot in enumerate(self.convs):
            out.append(self.texts[i])
            v = self._slot_value(slot, val, i)
            if v is not None:
                out.append(_stringify(v))
        out.extend(self.texts[len(self.convs) :])
        return "".join(out)


class MapValue(PlainValue):
    def __init__(self, texts: list[str], names: list[str], convs: list[Conversion]):
        super().__init__(texts, convs)
        if len(names) != len(convs):
            raise ValueError("'names/values' count mismatch.")
        self.names = names

    def _slot_value(self, slot: Conversion, val, i: int):
        if val is None:
            m: dict = {}
        elif isinstance(val, dict):
            m = val
        else:
            m = {"value": val}
        return slot.apply(m.get(self.names[i]))


def compile(text: str, default_conv: Conversion = NONE) -> Template:  # noqa: A001
    i = text.find("${")
    if i == -1:
        return ConstTemplate(text)
    if i == 0 and text == "${value}" and default_conv is NONE:
        return VALUE

    texts: list[str] = []
    names: list[str] = []
    convs: list[Conversion] = []
    _compile_into(text, default_conv, texts, names, convs)

    if any(nm != "value" for nm in names):
        return MapValue(texts, names, convs)
    return PlainValue(texts, convs)


def _compile_into(
    text: str,
    conv_default: Conversion,
    texts: list[str],
    names: list[str],
    convs: list[Conversion],
) -> None:
    i = text.find("${")
    if i == -1:
        texts.append(text)
        return
    texts.append(text[:i])
    i += 2
    p = i
    n = len(text)
    while i < n:
        c = text[i]
        i += 1
        if c not in ":}":
            continue
        names.append(text[p : i - 1].strip())
        if c == ":":
            p = i
            i = conv._index_of_unquoted(text, "}", p)
            if i == -1:
                raise ValueError(f"No matching '}}' found: {text}")
            convs.append(conv.parse(text[p:i]) or NONE)
            i += 1
        else:
            convs.append(conv_default)
        p = i
        i = text.find("${", p)
        if i == -1:
            if p < n:
                texts.append(text[p:])
            break
        texts.append(text[p:i])
        i += 2
        p = i
