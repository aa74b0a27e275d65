"""S9 — HTML → XML DOM conversion (Html2Xml.java:50-195 behavioral twin).

The reference walks its lenient HTML tokenizer and builds a DOM with a
strict ATTRIBUTE WHITELIST plus normalizations (Html2Xml.java:94-141):

- ``style``      kept verbatim (STYLE_KEEP), dropped (STYLE_IGNORE), or
                 decoded into one attribute per css property with ``px``
                 values converted to ``em`` (STYLE_DECODE, :160-183;
                 px→em at 18 px/em, value truncated to 4 chars, :185-195)
- ``href``       entity-unescaped; relative URLs (not ``#...``/``http...``)
                 resolved against a base URI with spaces %20-escaped (:143-158)
- ``class``      copied only when ``copy_class`` (:103-107)
- ``title``/``id``  copied silently; ``name`` → ``id`` (:108-113)
- ``adhocenable``/``valign``  silently dropped (:114-116)
- ``height``     dropped when ``%``-suffixed, else px→em (:117-123)
- ``width``      on a cell whose parent is ``<tr>`` inside a table: recorded
                 ONCE per column as ``column<N>`` on the table element, where
                 N = the tr's child-NODE count at that moment (:124-135)
- anything else  dropped

Structure rules (Html2Xml.java:59-91): inline tags {br, input, embed, meta}
never become the current parent (HtmlReader.java:300-304); an end tag pops
only when it matches the current element's name; text between tags is
entity-unescaped; trailing text is kept only if non-blank; <script>/<style>
bodies are dropped by the tokenizer (HtmlReader.java:173-193) though the
elements themselves appear.

Out-of-engine-scope note from round 1 is closed here: this is document-prep,
exposed both as a pure function and as an Arrow-batched column transform.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from html import unescape
from html.parser import HTMLParser
from urllib.parse import urljoin

STYLE_KEEP = 1
STYLE_IGNORE = 2
STYLE_DECODE = 3

_INLINE_TAGS = {"br", "input", "embed", "meta"}
_DROP_ATTRS = {"adhocenable", "valign"}

_NAME_OK = re.compile(r"[^A-Za-z0-9._-]")


def _xml_name(name: str) -> str:
    """Sanitize a lenient-HTML tag/attribute name into a valid XML name.

    Divergence note: the reference's ``doc.createElement`` would throw
    INVALID_CHARACTER_ERR on names like ``b;`` — we map invalid characters to
    ``_`` instead so conversion NEVER raises and output stays parseable
    (leniency property pinned by hypothesis test)."""
    name = _NAME_OK.sub("_", name) or "_"
    if not (name[0].isalpha() or name[0] == "_"):
        name = "_" + name
    return name


def _to_em(pixels: str) -> str | None:
    """px → em at ~18 px/em; stringified value truncated to 4 chars (:185-195)."""
    try:
        px = int(pixels)
    except ValueError:
        return None
    val = str(px / 18.0)
    if len(val) > 4:
        val = val[:4]
    return val + "em"


class _Html2XmlParser(HTMLParser):
    def __init__(self, root: ET.Element, *, base_uri: str | None,
                 copy_class: bool, style_mode: int):
        super().__init__(convert_charrefs=True)
        self.base_uri = base_uri
        self.copy_class = copy_class
        self.style_mode = style_mode
        self.stack = [root]
        # Java counts ALL child nodes (text + elements) for the column<N> key
        self.child_nodes: dict[int, int] = {id(root): 0}
        self._skip = 0  # inside <script>/<style>: tokenizer drops the body

    # -- DOM helpers ----------------------------------------------------------
    def _append_text(self, text: str) -> None:
        cur = self.stack[-1]
        kids = list(cur)
        if kids:
            kids[-1].tail = (kids[-1].tail or "") + text
        else:
            cur.text = (cur.text or "") + text
        self.child_nodes[id(cur)] = self.child_nodes.get(id(cur), 0) + 1

    # -- attribute whitelist (Html2Xml.java:94-141) ----------------------------
    def _add_attr(self, el: ET.Element, name: str, value: str) -> None:
        if name == "style":
            if self.style_mode == STYLE_KEEP:
                el.set("style", value)
            elif self.style_mode == STYLE_DECODE:
                for css in value.lower().split(";"):
                    idx = css.find(":")
                    if idx > 0:
                        css_name = css[:idx].strip()
                        css_value = css[idx + 1 :].strip()
                        if css_value.endswith("px"):
                            css_value = _to_em(css_value[:-2])
                            if css_value is None:
                                continue
                        el.set(_xml_name(css_name), css_value)
        elif name == "href":
            # html.parser already entity-unescaped the value (:145)
            if not (value.startswith("#") or value.startswith("http")):
                if self.base_uri is not None:
                    try:
                        value = urljoin(self.base_uri, value.replace(" ", "%20"))
                    except ValueError:
                        pass  # reference logs and keeps the raw value (:152-156)
            el.set("href", value)
        elif name == "class":
            if self.copy_class:
                el.set("class", value)
        elif name in ("title", "id"):
            el.set(name, value)
        elif name == "name":
            el.set("id", value)
        elif name in _DROP_ATTRS:
            pass
        elif name == "height":
            if not value.endswith("%"):
                em = _to_em(value)
                if em is not None:
                    el.set("height", em)
        elif name == "width":
            tr = self.stack[-1]  # the new cell's parent
            if tr.tag == "tr" and len(self.stack) >= 3:
                tbl = self.stack[-3]  # tr.parent.parent (Html2Xml.java:127)
                if tbl.tag.startswith("table"):
                    key = f"column{self.child_nodes.get(id(tr), 0)}"
                    if tbl.get(key) is None:
                        tbl.set(key, value)
        # default: silently dropped (:136-140)

    # -- tokenizer events ------------------------------------------------------
    def _open(self, tag: str, attrs, descend: bool) -> None:
        cur = self.stack[-1]
        el = ET.SubElement(cur, _xml_name(tag))
        self.child_nodes[id(cur)] = self.child_nodes.get(id(cur), 0) + 1
        self.child_nodes[id(el)] = 0
        for k, v in attrs:
            self._add_attr(el, k.lower(), v if v is not None else "")
        if descend and tag not in _INLINE_TAGS:
            self.stack.append(el)

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in ("script", "style"):
            self._skip += 1
        self._open(tag, attrs, descend=True)

    def handle_startendtag(self, tag, attrs):
        self._open(tag.lower(), attrs, descend=False)

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in ("script", "style") and self._skip:
            self._skip -= 1
        # pop only on a name match with the current element (:80-84)
        if len(self.stack) > 1 and self.stack[-1].tag == _xml_name(tag):
            self.stack.pop()

    def handle_data(self, data):
        if self._skip:
            return  # tokenizer skips script/style bodies (HtmlReader:173-193)
        self._append_text(data)


def html_to_xml(
    html: str,
    root_tag: str = "doc",
    *,
    base_uri: str | None = None,
    copy_class: bool = True,
    style: int = STYLE_KEEP,
) -> ET.Element:
    """Convert lenient HTML into an XML element tree (Html2Xml.convert twin).

    Trailing text after the last tag is kept only when non-blank (:86-91).
    """
    root = ET.Element(root_tag)
    parser = _Html2XmlParser(
        root, base_uri=base_uri, copy_class=copy_class, style_mode=style
    )
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # tokenizer-level leniency: the reference never raises on bad HTML
        root.text = unescape(html)
        return root
    # trailing-blank rule: drop a whitespace-only LAST text node
    kids = list(root)
    if kids and kids[-1].tail is not None and not kids[-1].tail.strip():
        kids[-1].tail = None
    elif not kids and root.text is not None and not root.text.strip():
        root.text = None
    return root


def html_to_xml_string(html: str | None, root_tag: str = "doc", **kw) -> str | None:
    if html is None:
        return None
    return ET.tostring(html_to_xml(html, root_tag, **kw), encoding="unicode")


def html_to_xml_col(col, root_tag: str = "doc", **kw):
    """Arrow-batched column transform: html string → XML string."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(s):
        return s.map(lambda h: html_to_xml_string(h, root_tag, **kw))

    return _udf(col)
