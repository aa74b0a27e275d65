"""Pure-Python XSLT 1.0 SUBSET interpreter (S3 completion without lxml).

The reference compiles arbitrary user stylesheets with JAXP
(XsltUpdateHandler.java:114-136) and applies them per request (:149-152).
This container has no lxml/libxslt, so ``make_xslt_transform`` falls back to
this interpreter, which covers the constructs the handler exists for —
mapping source XML into Solr ``<add><doc><field name=..>`` documents:

supported instructions
    xsl:stylesheet / xsl:transform     (template container)
    xsl:template match="name|a/b|/"    (also match="*"; first doc-order win,
                                        longer paths tried first)
    xsl:apply-templates [select=path]
    xsl:for-each select=path
    xsl:value-of select=path
    xsl:if test="path" | test="path='literal'" | test="not(path)"
    xsl:choose / xsl:when / xsl:otherwise
    xsl:attribute name=...
    xsl:text
    literal result elements with {path} attribute-value templates

supported select/match paths (relative to the context node)
    .   name   a/b/c   @attr   a/@attr   text()   *   /absolute/path

Anything else raises ``UnsupportedXsltError`` at compile or apply time —
never a silent wrong answer. Built-in rules: an element with no matching
template recurses into child elements; text nodes are NOT implicitly copied
(Solr-mapping stylesheets are explicit; deviation documented here).

For full XSLT install lxml — ``make_xslt_transform`` prefers it when present.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

XSL_NS = "http://www.w3.org/1999/XSL/Transform"
_X = "{%s}" % XSL_NS
_AVT_RE = re.compile(r"\{([^}]+)\}")
_EQ_TEST_RE = re.compile(r"^(.*?)\s*=\s*'([^']*)'$")


class UnsupportedXsltError(NotImplementedError):
    pass


def _strip_ns(tag: str) -> str:
    return tag.split("}", 1)[1] if tag.startswith("{") else tag


def _select(ctx: ET.Element, path: str, root: ET.Element) -> list:
    """Evaluate a (very small) path → list of Elements / strings."""
    path = path.strip()
    if path == ".":
        return [ctx]
    # absolute paths start at the synthetic document node (whose only child
    # is the source root element), exactly like XSLT's "/"
    nodes: list = [root] if path.startswith("/") else [ctx]
    steps = [s for s in path.split("/") if s]
    for step in steps:
        out: list = []
        for n in nodes:
            if not isinstance(n, ET.Element):
                raise UnsupportedXsltError(f"cannot step {step!r} from a value")
            if step == "@*":
                out.extend(n.attrib.values())
            elif step.startswith("@"):
                v = n.attrib.get(step[1:])
                if v is not None:
                    out.append(v)
            elif step == "text()":
                if n.text:
                    out.append(n.text)
            elif step == "*":
                out.extend(list(n))
            elif step == "..":
                raise UnsupportedXsltError("parent axis not supported")
            else:
                out.extend(c for c in n if _strip_ns(c.tag) == step)
        nodes = out
    return nodes


def _string_value(node) -> str:
    if isinstance(node, ET.Element):
        return "".join(node.itertext())
    return str(node)


class MiniXSLT:
    """Compile once, apply many (the Templates-cache shape, :63-66)."""

    def __init__(self, xslt_source: str):
        sheet = ET.fromstring(xslt_source)
        if sheet.tag not in (f"{_X}stylesheet", f"{_X}transform"):
            raise UnsupportedXsltError(f"not a stylesheet root: {sheet.tag}")
        self.templates: list[tuple[str, ET.Element]] = []
        for child in sheet:
            tag = child.tag
            if tag == f"{_X}template":
                match = child.get("match")
                if match is None:
                    raise UnsupportedXsltError("named templates not supported")
                self.templates.append((match, child))
            elif tag == f"{_X}output":
                continue  # serialization hints — we always emit unicode XML
            elif tag is ET.Comment:
                continue
            else:
                raise UnsupportedXsltError(f"top-level {tag} not supported")
        # longer (more specific) match patterns first, stable otherwise
        self.templates.sort(key=lambda t: -len(t[0].split("/")))

    # -- matching ------------------------------------------------------------
    def _find_template(self, elem: ET.Element, root: ET.Element) -> ET.Element | None:
        name = _strip_ns(elem.tag)
        for match, tmpl in self.templates:
            if match == "/":
                if elem is root and getattr(self, "_root_phase", False):
                    return tmpl
                continue
            steps = [s for s in match.split("/") if s]
            if not steps:
                continue
            if steps[-1] in ("*", name):
                # suffix match on the recorded ancestor names
                anc = self._ancestors.get(id(elem), [])
                want = steps[:-1]
                if len(want) <= len(anc) and all(
                    w in ("*", a) for w, a in zip(want, anc[len(anc) - len(want):])
                ):
                    if not match.startswith("/") or len(want) == len(anc):
                        return tmpl
        return None

    # -- application ---------------------------------------------------------
    def __call__(self, xml: str) -> str:
        src = ET.fromstring(xml)
        doc = ET.Element("__document__")  # XSLT document node stand-in
        doc.append(src)
        self._ancestors: dict[int, list[str]] = {}

        def record(e: ET.Element, path: list[str]) -> None:
            self._ancestors[id(e)] = path
            for c in e:
                record(c, path + [_strip_ns(e.tag)])

        record(src, [])
        out_root = ET.Element("__result__")
        self._root_phase = True
        tmpl = self._find_template(doc, doc)
        self._root_phase = False
        if tmpl is None:
            # built-in rule for the document node: apply to the root ELEMENT
            self._apply_one(src, doc, out_root)
        else:
            self._run_body(tmpl, doc, doc, out_root)
        kids = list(out_root)
        if len(kids) == 1 and not (out_root.text or "").strip():
            return ET.tostring(kids[0], encoding="unicode")
        return ET.tostring(out_root, encoding="unicode")

    def _apply_to_children(self, ctx: ET.Element, root: ET.Element, out: ET.Element):
        for child in ctx:
            self._apply_one(child, root, out)

    def _apply_one(self, elem: ET.Element, root: ET.Element, out: ET.Element):
        tmpl = self._find_template(elem, root)
        if tmpl is not None:
            self._run_body(tmpl, elem, root, out)
        else:  # built-in rule: descend
            self._apply_to_children(elem, root, out)

    def _test(self, ctx: ET.Element, test: str, root: ET.Element) -> bool:
        test = test.strip()
        if test.startswith("not(") and test.endswith(")"):
            return not self._test(ctx, test[4:-1], root)
        m = _EQ_TEST_RE.match(test)
        if m:
            nodes = _select(ctx, m.group(1), root)
            return any(_string_value(n) == m.group(2) for n in nodes)
        return bool(_select(ctx, test, root))

    def _avt(self, value: str, ctx: ET.Element, root: ET.Element) -> str:
        return _AVT_RE.sub(
            lambda m: "".join(
                _string_value(n) for n in _select(ctx, m.group(1), root)[:1]
            ),
            value,
        )

    def _append_text(self, out: ET.Element, text: str) -> None:
        if not text:
            return
        if len(out):
            out[-1].tail = (out[-1].tail or "") + text
        else:
            out.text = (out.text or "") + text

    def _run_body(self, body: ET.Element, ctx: ET.Element, root: ET.Element,
                  out: ET.Element) -> None:
        for node in body:
            tag = node.tag
            if tag is ET.Comment:
                continue
            if tag == f"{_X}value-of":
                nodes = _select(ctx, node.get("select", "."), root)
                self._append_text(out, _string_value(nodes[0]) if nodes else "")
            elif tag == f"{_X}text":
                self._append_text(out, node.text or "")
            elif tag == f"{_X}for-each":
                for sub in _select(ctx, node.get("select", "."), root):
                    if not isinstance(sub, ET.Element):
                        raise UnsupportedXsltError("for-each over non-elements")
                    self._run_body(node, sub, root, out)
            elif tag == f"{_X}apply-templates":
                sel = node.get("select")
                targets = (
                    _select(ctx, sel, root) if sel is not None else list(ctx)
                )
                for t in targets:
                    if not isinstance(t, ET.Element):
                        raise UnsupportedXsltError("apply-templates over values")
                    self._apply_one(t, root, out)
            elif tag == f"{_X}if":
                if self._test(ctx, node.get("test", ""), root):
                    self._run_body(node, ctx, root, out)
            elif tag == f"{_X}choose":
                for branch in node:
                    if branch.tag == f"{_X}when" and self._test(
                        ctx, branch.get("test", ""), root
                    ):
                        self._run_body(branch, ctx, root, out)
                        break
                    if branch.tag == f"{_X}otherwise":
                        self._run_body(branch, ctx, root, out)
                        break
            elif tag == f"{_X}attribute":
                if len(out) == 0 and out.tag == "__result__":
                    raise UnsupportedXsltError("xsl:attribute with no element")
                target = out[-1] if len(out) else out
                buf = ET.Element("__attr__")
                self._run_body(node, ctx, root, buf)
                # literal text inside xsl:attribute comes before child output
                target.set(
                    self._avt(node.get("name", ""), ctx, root),
                    (node.text or "").strip() + (buf.text or ""),
                )
            elif tag.startswith(_X):
                raise UnsupportedXsltError(f"unsupported instruction {tag}")
            else:  # literal result element
                lit = ET.SubElement(
                    out, _strip_ns(tag) if not tag.startswith("{") else tag
                )
                for k, v in node.attrib.items():
                    lit.set(k, self._avt(v, ctx, root))
                if node.text and node.text.strip():
                    lit.text = node.text
                self._run_body(node, ctx, root, lit)
            # literal trailing text inside templates (rare in mapping sheets)
            if node.tail and node.tail.strip():
                self._append_text(out, node.tail)
