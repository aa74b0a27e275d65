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
    xsl:template name=... + xsl:call-template [xsl:with-param]
    xsl:template mode=... + xsl:apply-templates mode=... (built-in rules
                                        descend in the same mode)
    xsl:param (in named templates; select= or literal-content default)
    xsl:apply-templates [select=path] [mode=m] [xsl:sort...]
    xsl:for-each select=path [xsl:sort...]  (sets position()/last())
    xsl:sort select= [data-type=text|number] [order=ascending|descending]
                                        (stable multi-key; doc-order ties)
    xsl:key name/match/use + key('name', arg)[/steps] in select paths
    xsl:variable (top-level globals + template-local; select= or
                                        text-only content, $name refs)
    xsl:number [level=single|any] [count=pattern] (format="1" only)
    xsl:include / xsl:import via a resolver= callback (import = lower
                                        precedence, XSLT 1.0 §2.6)
    'string literals' in select= expressions
    xsl:value-of select=path|position()|last()|$param
    xsl:copy-of select=path            (deep copy of selected nodes/values)
    xsl:if test="path" | "path='lit'" | "not(...)" | "position()=N"
    xsl:choose / xsl:when / xsl:otherwise
    xsl:attribute name=...
    xsl:text
    literal result elements with {path} attribute-value templates

supported select/match paths (relative to the context node)
    .   name   a/b/c   @attr   a/@attr   text()   *   /absolute/path   $param
    any step may carry predicates: a[2]  a[last()]  a[@id='x']  a[b='v']
    a[@attr]  a[position()=2]  (chained ``[p][q]`` filters left to right;
    position() inside a predicate is the node's 1-based index in ITS step's
    candidate list per parent — XPath proximity position)

Anything else raises ``UnsupportedXsltError`` at compile or apply time —
never a silent wrong answer. Built-in rules: an element with no matching
template recurses into child elements; text nodes are NOT implicitly copied
(Solr-mapping stylesheets are explicit; deviation documented here).

For full XSLT install lxml — ``make_xslt_transform`` prefers it when present.
"""

from __future__ import annotations

import copy as _copy
import re
import xml.etree.ElementTree as ET

XSL_NS = "http://www.w3.org/1999/XSL/Transform"
_X = "{%s}" % XSL_NS
_AVT_RE = re.compile(r"\{([^}]+)\}")
_EQ_TEST_RE = re.compile(r"^(.*?)\s*=\s*'([^']*)'$")
_POS_TEST_RE = re.compile(r"^(position\(\)|last\(\))\s*=\s*(\d+)$")
_STEP_RE = re.compile(r"^([^\[\]]+)((?:\[[^\]]*\])*)$")
_PRED_RE = re.compile(r"\[([^\]]*)\]")
_KEY_RE = re.compile(r"^key\(\s*'([^']*)'\s*,\s*([^)]*?)\s*\)(.*)$")


class UnsupportedXsltError(NotImplementedError):
    pass


def _strip_ns(tag: str) -> str:
    return tag.split("}", 1)[1] if tag.startswith("{") else tag


def _string_value(node) -> str:
    if isinstance(node, ET.Element):
        return "".join(node.itertext())
    return str(node)


class _Ctx:
    """Evaluation context: node + XPath position()/last() + param bindings."""

    __slots__ = ("node", "pos", "last", "env")

    def __init__(self, node, pos: int = 1, last: int = 1, env: dict | None = None):
        self.node = node
        self.pos = pos
        self.last = last
        self.env = env or {}

    def at(self, node, pos: int, last: int) -> "_Ctx":
        return _Ctx(node, pos, last, self.env)

    def with_env(self, env: dict) -> "_Ctx":
        return _Ctx(self.node, self.pos, self.last, env)


class MiniXSLT:
    """Compile once, apply many (the Templates-cache shape, :63-66)."""

    def __init__(self, xslt_source: str,
                 resolver: "Callable[[str], str] | None" = None):
        """``resolver``: optional ``href → stylesheet-source`` callback
        enabling ``xsl:include`` (same precedence) and ``xsl:import``
        (lower precedence: imported match-templates fire only when no
        including-sheet template matches — XSLT 1.0 §2.6). Without a
        resolver those instructions raise, as before."""
        self.templates: list[tuple[str, str | None, ET.Element]] = []
        self.imported: list[tuple[str, str | None, ET.Element]] = []
        self.named: dict[str, ET.Element] = {}
        self._named_prec: dict[str, bool] = {}  # name → defined-by-import?
        self.key_defs: list[tuple[str, str, str]] = []  # (name, match, use)
        self.global_vars: list[ET.Element] = []  # top-level xsl:variable
        self._resolver = resolver
        self._compile(xslt_source, imported=False, seen=set())
        # longer (more specific) match patterns first, stable otherwise
        self.templates.sort(key=lambda t: -len(t[0].split("/")))
        self.imported.sort(key=lambda t: -len(t[0].split("/")))

    def _compile(self, xslt_source: str, imported: bool, seen: set) -> None:
        sheet = ET.fromstring(xslt_source)
        if sheet.tag not in (f"{_X}stylesheet", f"{_X}transform"):
            raise UnsupportedXsltError(f"not a stylesheet root: {sheet.tag}")
        dest = self.imported if imported else self.templates
        for child in sheet:
            tag = child.tag
            if tag in (f"{_X}include", f"{_X}import"):
                href = child.get("href", "")
                if self._resolver is None:
                    raise UnsupportedXsltError(
                        f"{tag} requires a resolver= callback (href={href!r})")
                if href in seen:
                    raise UnsupportedXsltError(f"circular include/import: {href!r}")
                self._compile(self._resolver(href),
                              imported=imported or tag == f"{_X}import",
                              seen=seen | {href})
            elif tag == f"{_X}template":
                match = child.get("match")
                name = child.get("name")
                mode = child.get("mode")
                if name is not None:
                    # precedence: non-imported (main sheet + xsl:include)
                    # beats imported; duplicates at EQUAL precedence are an
                    # XSLT 1.0 error — raise, per the loud-failure contract
                    prev = self._named_prec.get(name)
                    if prev is None or (prev and not imported):
                        self.named[name] = child
                        self._named_prec[name] = imported
                    elif prev == imported:
                        raise UnsupportedXsltError(
                            f"duplicate named template at equal import "
                            f"precedence: {name!r}")
                    # else: prev is non-imported, new is imported — keep prev
                if match is not None:
                    dest.append((match, mode, child))
                if match is None and name is None:
                    raise UnsupportedXsltError("template needs match= or name=")
            elif tag == f"{_X}key":
                kname, kmatch, kuse = (child.get("name"), child.get("match"),
                                       child.get("use"))
                if not (kname and kmatch and kuse):
                    raise UnsupportedXsltError("xsl:key needs name/match/use")
                if "[" in kmatch:
                    raise UnsupportedXsltError(
                        "predicates in key match patterns not supported")
                self.key_defs.append((kname, kmatch, kuse))
            elif tag == f"{_X}variable":
                # global variable: evaluated per document at apply time (its
                # select path may read the source), doc-order, may reference
                # earlier globals
                self.global_vars.append(child)
            elif tag == f"{_X}output":
                continue  # serialization hints — we always emit unicode XML
            elif tag is ET.Comment:
                continue
            else:
                raise UnsupportedXsltError(f"top-level {tag} not supported")

    # -- path evaluation -------------------------------------------------------
    def _select(self, ctx: _Ctx, path: str, root: ET.Element) -> list:
        """Evaluate a (very small) path → list of Elements / strings / ints."""
        path = path.strip()
        if path == ".":
            return [ctx.node]
        if path == "position()":
            return [ctx.pos]
        if path == "last()":
            return [ctx.last]
        if len(path) >= 2 and path[0] == path[-1] and path[0] in "'\"":
            return [path[1:-1]]  # XPath string literal (select="'x'")
        if path.startswith("$"):
            name = path[1:]
            if "/" in name or "[" in name:
                raise UnsupportedXsltError(f"steps off a param not supported: {path}")
            if name in ctx.env:
                val = ctx.env[name]
            elif name in getattr(self, "_globals", {}):
                val = self._globals[name]
            else:
                raise UnsupportedXsltError(f"undefined parameter/variable ${name}")
            return list(val) if isinstance(val, list) else [val]
        km = _KEY_RE.match(path)
        if km:
            return self._key_select(ctx, km, root)
        # absolute paths start at the synthetic document node (whose only
        # child is the source root element), exactly like XSLT's "/"
        nodes: list = [root] if path.startswith("/") else [ctx.node]
        steps = [s for s in path.split("/") if s]
        for step in steps:
            m = _STEP_RE.match(step)
            if not m:
                raise UnsupportedXsltError(f"cannot parse step {step!r}")
            base, preds_src = m.group(1), m.group(2)
            preds = _PRED_RE.findall(preds_src) if preds_src else []
            out: list = []
            for n in nodes:
                if not isinstance(n, ET.Element):
                    raise UnsupportedXsltError(f"cannot step {step!r} from a value")
                matched = self._step_base(n, base)
                # predicates filter per-parent with proximity position()
                for pred in preds:
                    last = len(matched)
                    matched = [
                        v for i, v in enumerate(matched, 1)
                        if self._pred(ctx, v, pred, i, last, root)
                    ]
                out.extend(matched)
            nodes = out
        return nodes

    def _key_select(self, ctx: _Ctx, km: "re.Match[str]", root: ET.Element) -> list:
        """``key('name', arg)[/more/steps]`` — arg is a quoted literal or a
        path whose node string-values are unioned (XPath key() semantics)."""
        kname, argsrc, rest = km.group(1), km.group(2).strip(), km.group(3).strip()
        tables = getattr(self, "_keys", {})
        if kname not in tables:
            raise UnsupportedXsltError(f"key() over undeclared key {kname!r}")
        if argsrc.startswith("'") and argsrc.endswith("'"):
            vals = [argsrc[1:-1]]
        else:
            vals = [_string_value(n) for n in self._select(ctx, argsrc, root)]
        nodes: list = []
        seen: set[int] = set()
        for v in vals:  # union in document order per value, dedup across values
            for n in tables[kname].get(v, []):
                if id(n) not in seen:
                    seen.add(id(n))
                    nodes.append(n)
        if not rest:
            return nodes
        if not rest.startswith("/"):
            raise UnsupportedXsltError(f"cannot parse key() suffix {rest!r}")
        out: list = []
        for n in nodes:
            out.extend(self._select(ctx.at(n, 1, 1), rest.lstrip("/"), root))
        return out

    def _sort_spec(self, instr: ET.Element) -> list[tuple[str, str, str]]:
        """Collect xsl:sort children of for-each / apply-templates."""
        specs = []
        for c in instr:
            if c.tag != f"{_X}sort":
                continue
            sel = c.get("select", ".")
            dt = c.get("data-type", "text")
            order = c.get("order", "ascending")
            if dt not in ("text", "number"):
                raise UnsupportedXsltError(f"sort data-type {dt!r} not supported")
            if order not in ("ascending", "descending"):
                raise UnsupportedXsltError(f"sort order {order!r} not supported")
            if c.get("lang") or c.get("case-order"):
                raise UnsupportedXsltError("sort lang/case-order not supported")
            if "position()" in sel or "last()" in sel:
                raise UnsupportedXsltError("positional sort keys not supported")
            specs.append((sel, dt, order))
        return specs

    def _sorted(self, targets: list, specs: list, ctx: _Ctx,
                root: ET.Element) -> list:
        """Stable multi-key sort (keys applied last→first; document order
        breaks ties, as XSLT 1.0 requires)."""
        if not specs:
            return targets
        out = list(targets)
        for sel, dt, order in reversed(specs):
            def keyf(n, sel=sel, dt=dt):
                vals = self._select(ctx.at(n, 1, 1), sel, root)
                s = _string_value(vals[0]) if vals else ""
                if dt == "number":
                    try:
                        return float(s)
                    except ValueError:
                        return float("-inf")  # NaN-like sorts first, as libxslt
                return s
            out.sort(key=keyf, reverse=(order == "descending"))
        return out

    @staticmethod
    def _step_base(n: ET.Element, base: str) -> list:
        if base == "@*":
            return list(n.attrib.values())
        if base.startswith("@"):
            v = n.attrib.get(base[1:])
            return [v] if v is not None else []
        if base == "text()":
            return [n.text] if n.text else []
        if base == "*":
            return list(n)
        if base == "..":
            raise UnsupportedXsltError("parent axis not supported")
        return [c for c in n if _strip_ns(c.tag) == base]

    def _pred(self, ctx: _Ctx, value, pred: str, pos: int, last: int,
              root: ET.Element) -> bool:
        pred = pred.strip()
        if pred.isdigit():  # [2] ≡ [position()=2]
            return pos == int(pred)
        if pred == "last()":  # number-valued predicate ≡ position()=number
            return pos == last
        if pred == "position()":
            raise UnsupportedXsltError("bare position() predicate is always true")
        if not isinstance(value, ET.Element):
            raise UnsupportedXsltError(
                f"predicate {pred!r} on a non-element value"
            )
        return self._test(ctx.at(value, pos, last), pred, root)

    # -- matching ------------------------------------------------------------
    def _matches_pattern(self, elem: ET.Element, match: str) -> bool:
        """True if ``elem`` matches a (predicate-free) pattern like
        ``name``, ``a/b``, ``*``, ``/abs/path`` — suffix match on the
        recorded ancestor names (shared by template dispatch and xsl:key)."""
        name = _strip_ns(elem.tag)
        steps = [s for s in match.split("/") if s]
        if not steps:
            return False
        if any("[" in s for s in steps):
            raise UnsupportedXsltError(
                f"predicates in match patterns not supported: {match!r}"
            )
        if steps[-1] not in ("*", name):
            return False
        anc = self._ancestors.get(id(elem), [])
        want = steps[:-1]
        if len(want) <= len(anc) and all(
            w in ("*", a) for w, a in zip(want, anc[len(anc) - len(want):])
        ):
            return not match.startswith("/") or len(want) == len(anc)
        return False

    def _find_template(
        self, elem: ET.Element, root: ET.Element, mode: str | None = None
    ) -> ET.Element | None:
        # main-sheet (+ included) templates first; xsl:import'ed ones fire
        # only when nothing in the importing sheet matches (XSLT §2.6/§5.5)
        for group in (self.templates, self.imported):
            for match, tmode, tmpl in group:
                if tmode != mode:
                    continue
                if match == "/":
                    if elem is root and getattr(self, "_root_phase", False):
                        return tmpl
                    continue
                if self._matches_pattern(elem, match):
                    return tmpl
        return None

    # -- application ---------------------------------------------------------
    def __call__(self, xml: str) -> str:
        src = ET.fromstring(xml)
        doc = ET.Element("__document__")  # XSLT document node stand-in
        doc.append(src)
        self._ancestors: dict[int, list[str]] = {}

        self._parent: dict[int, ET.Element] = {}
        self._doc_order: list[ET.Element] = []

        def record(e: ET.Element, path: list[str]) -> None:
            self._ancestors[id(e)] = path
            self._doc_order.append(e)
            for c in e:
                if isinstance(c.tag, str):
                    self._parent[id(c)] = e
                    record(c, path + [_strip_ns(e.tag)])

        record(src, [])
        # xsl:key tables: one doc-order walk per key definition, built once
        # per document (libxslt does the same lazily; eager is simpler and
        # the mapping-sheet sources are request-sized)
        self._keys: dict[str, dict[str, list]] = {}
        for kname, kmatch, kuse in self.key_defs:
            table = self._keys.setdefault(kname, {})
            for e in src.iter():
                if not isinstance(e.tag, str):
                    continue  # comments / processing instructions
                if self._matches_pattern(e, kmatch):
                    for v in self._select(_Ctx(e), kuse, doc):
                        table.setdefault(_string_value(v), []).append(e)
        # global xsl:variable bindings: doc-order, each may reference the
        # ones before it (visible through _select's $name fallback)
        self._globals: dict[str, list] = {}
        for gv in self.global_vars:
            self._globals[gv.get("name", "")] = self._eval_param_value(
                gv, _Ctx(doc), doc)
        out_root = ET.Element("__result__")
        self._root_phase = True
        tmpl = self._find_template(doc, doc)
        self._root_phase = False
        if tmpl is None:
            # built-in rule for the document node: apply to the root ELEMENT
            self._apply_one(_Ctx(src), doc, out_root)
        else:
            self._run_body(tmpl, _Ctx(doc), doc, out_root)
        kids = list(out_root)
        if len(kids) == 1 and not (out_root.text or "").strip():
            return ET.tostring(kids[0], encoding="unicode")
        return ET.tostring(out_root, encoding="unicode")

    def _apply_to_children(self, ctx: _Ctx, root: ET.Element, out: ET.Element,
                           mode: str | None = None):
        # comments/PIs (non-str tag) are skipped: the built-in rule for them
        # is "emit nothing", and they carry no name to match templates on
        kids = [c for c in ctx.node if isinstance(c.tag, str)]
        for i, child in enumerate(kids, 1):
            self._apply_one(ctx.at(child, i, len(kids)), root, out, mode)

    def _apply_one(self, ctx: _Ctx, root: ET.Element, out: ET.Element,
                   mode: str | None = None):
        # Fresh param frame: a match-template reached via apply-templates must
        # NOT see the caller's bindings (this subset has no apply-templates
        # with-param, and real XSLT errors on an unbound $ref — leaking the
        # caller's env would silently resolve names the template never
        # declared, violating the never-a-silent-wrong-answer contract).
        ctx = ctx.with_env({})
        tmpl = self._find_template(ctx.node, root, mode)
        if tmpl is not None:
            self._run_body(tmpl, ctx, root, out)
        else:  # built-in rule: descend IN THE SAME MODE (XSLT 1.0 §5.8)
            self._apply_to_children(ctx, root, out, mode)

    def _test(self, ctx: _Ctx, test: str, root: ET.Element) -> bool:
        test = test.strip()
        if test.startswith("not(") and test.endswith(")"):
            return not self._test(ctx, test[4:-1], root)
        pm = _POS_TEST_RE.match(test)
        if pm:
            val = ctx.pos if pm.group(1) == "position()" else ctx.last
            return val == int(pm.group(2))
        m = _EQ_TEST_RE.match(test)
        if m:
            nodes = self._select(ctx, m.group(1), root)
            return any(_string_value(n) == m.group(2) for n in nodes)
        return bool(self._select(ctx, test, root))

    def _avt(self, value: str, ctx: _Ctx, root: ET.Element) -> str:
        return _AVT_RE.sub(
            lambda m: "".join(
                _string_value(n) for n in self._select(ctx, m.group(1), root)[:1]
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

    def _eval_param_value(self, node: ET.Element, ctx: _Ctx, root: ET.Element):
        """xsl:with-param / xsl:param default: select= or literal content."""
        sel = node.get("select")
        if sel is not None:
            return self._select(ctx, sel, root)
        buf = ET.Element("__param__")
        self._run_body(node, ctx, root, buf)
        if len(buf):
            raise UnsupportedXsltError("element-valued parameters not supported")
        # literal text content precedes instruction output (as in xsl:attribute)
        return [(node.text or "").strip() + (buf.text or "")]

    def _call_template(self, node: ET.Element, ctx: _Ctx, root: ET.Element,
                       out: ET.Element) -> None:
        name = node.get("name", "")
        tmpl = self.named.get(name)
        if tmpl is None:
            raise UnsupportedXsltError(f"call-template to unknown template {name!r}")
        env: dict = {}
        for wp in node:
            if wp.tag is ET.Comment:
                continue
            if wp.tag != f"{_X}with-param":
                raise UnsupportedXsltError(
                    f"only xsl:with-param allowed in call-template, got {wp.tag}"
                )
            env[wp.get("name", "")] = self._eval_param_value(wp, ctx, root)
        # the called template sees ONLY its params (fresh frame, XSLT scoping);
        # its leading xsl:param defaults fill unbound names (handled in body)
        self._run_body(tmpl, ctx.with_env(env), root, out)

    def _number(self, node: ET.Element, ctx: _Ctx, out: ET.Element) -> None:
        """xsl:number subset: level="single"|"any", count=pattern (default:
        same name as the current node), format="1". from=, other formats and
        level="multiple" stay behind the loud gate."""
        if node.get("from") is not None:
            raise UnsupportedXsltError("xsl:number from= not supported")
        if node.get("format", "1") != "1":
            raise UnsupportedXsltError("only xsl:number format='1' supported")
        level = node.get("level", "single")
        if level not in ("single", "any"):
            raise UnsupportedXsltError(f"xsl:number level={level!r} not supported")
        if node.get("value") is not None:
            raise UnsupportedXsltError("xsl:number value= not supported")
        cur = ctx.node
        if not isinstance(cur, ET.Element) or not isinstance(cur.tag, str):
            raise UnsupportedXsltError("xsl:number outside an element context")
        count_pat = node.get("count")
        if count_pat is None:
            name = _strip_ns(cur.tag)
            matches = lambda e: _strip_ns(e.tag) == name  # noqa: E731
        else:
            matches = lambda e: self._matches_pattern(e, count_pat)  # noqa: E731
        if level == "single":
            target = cur
            while target is not None and not matches(target):
                target = self._parent.get(id(target))
            if target is None:
                return  # empty count list → empty string (XSLT 1.0 §7.7)
            parent = self._parent.get(id(target))
            if parent is None:
                self._append_text(out, "1")
                return
            sibs = [c for c in parent if isinstance(c.tag, str) and matches(c)]
            self._append_text(out, str(1 + sibs.index(target)))
        else:  # any: matching nodes at or before cur in document order
            n = 0
            for e in self._doc_order:
                if matches(e):
                    n += 1
                if e is cur:
                    break
            self._append_text(out, str(n) if n else "")

    def _run_body(self, body: ET.Element, ctx: _Ctx, root: ET.Element,
                  out: ET.Element) -> None:
        for node in body:
            tag = node.tag
            if tag is ET.Comment:
                continue
            if tag == f"{_X}param":
                # declared parameter: bind default if the caller didn't
                pname = node.get("name", "")
                if pname not in ctx.env:
                    ctx = ctx.with_env(
                        {**ctx.env, pname: self._eval_param_value(node, ctx, root)}
                    )
            elif tag == f"{_X}variable":
                # local variable: bound for the remaining siblings of this
                # body (XSLT 1.0 §11.5 scope); select= or text-only content
                ctx = ctx.with_env(
                    {**ctx.env,
                     node.get("name", ""): self._eval_param_value(node, ctx, root)}
                )
            elif tag == f"{_X}value-of":
                nodes = self._select(ctx, node.get("select", "."), root)
                self._append_text(out, _string_value(nodes[0]) if nodes else "")
            elif tag == f"{_X}copy-of":
                for n in self._select(ctx, node.get("select", "."), root):
                    if isinstance(n, ET.Element):
                        out.append(_copy.deepcopy(n))
                    else:
                        self._append_text(out, _string_value(n))
            elif tag == f"{_X}text":
                self._append_text(out, node.text or "")
            elif tag == f"{_X}sort":
                continue  # consumed by the enclosing for-each/apply-templates
            elif tag == f"{_X}for-each":
                subs = self._select(ctx, node.get("select", "."), root)
                subs = self._sorted(subs, self._sort_spec(node), ctx, root)
                for i, sub in enumerate(subs, 1):
                    if not isinstance(sub, ET.Element):
                        raise UnsupportedXsltError("for-each over non-elements")
                    self._run_body(node, ctx.at(sub, i, len(subs)), root, out)
            elif tag == f"{_X}apply-templates":
                for c in node:
                    if c.tag != f"{_X}sort" and c.tag is not ET.Comment:
                        raise UnsupportedXsltError(
                            "only xsl:sort allowed inside apply-templates"
                        )
                sel = node.get("select")
                mode = node.get("mode")
                targets = (
                    self._select(ctx, sel, root)
                    if sel is not None
                    else [c for c in ctx.node if isinstance(c.tag, str)]
                )
                targets = self._sorted(targets, self._sort_spec(node), ctx, root)
                for i, t in enumerate(targets, 1):
                    if not isinstance(t, ET.Element):
                        raise UnsupportedXsltError("apply-templates over values")
                    self._apply_one(ctx.at(t, i, len(targets)), root, out, mode)
            elif tag == f"{_X}call-template":
                self._call_template(node, ctx, root, out)
            elif tag == f"{_X}number":
                self._number(node, ctx, out)
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
