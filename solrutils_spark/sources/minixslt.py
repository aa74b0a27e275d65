"""Pure-Python XSLT 1.0 SUBSET interpreter (S3 completion without lxml).

The reference compiles arbitrary user stylesheets with JAXP
(XsltUpdateHandler.java:114-136) and applies them per request (:149-152).
This container has no lxml/libxslt, so ``make_xslt_transform`` falls back to
this interpreter, which covers the constructs the handler exists for —
mapping source XML into Solr ``<add><doc><field name=..>`` documents:

supported instructions
    xsl:stylesheet / xsl:transform     (template container)
    xsl:template match="name|a/b|/"    (also match="*", alternation a|b,
                                        a//b descendant gaps, and step
                                        predicates item[@active='yes'] /
                                        a[2]/b, combinable: a//b[@x]
                                        backtracks over candidate ancestors
                                        at each gap; first doc-order win,
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
    xsl:number [level=single|any|multiple] [count=pattern] [from=pattern]
                                        [value=EXPR] (format tokens
                                        1/01/a/A/i/I with literal
                                        separators, XSLT §7.7.1)
    xsl:element name=AVT               (computed-name element)
    xsl:copy                           (shallow copy, §7.5)
    xsl:attribute-set + use-attribute-sets on xsl:element / xsl:copy /
                                        literal elements (§7.1.4: nesting,
                                        explicit attrs override, same-name
                                        sets merge import-precedence-first)
    xsl:include / xsl:import via a resolver= callback (import = lower
                                        precedence, XSLT 1.0 §2.6)
    xsl:value-of / xsl:copy-of select=EXPR (full expression, see below)
    xsl:if test=EXPR / xsl:choose / xsl:when / xsl:otherwise
    xsl:attribute name=...
    xsl:text
    literal result elements with {EXPR} attribute-value templates

supported XPath 1.0 expressions (round 5: select=/test=/predicates/AVTs all
route through one precedence-climbing evaluator, ``_XPathEval``)
    or and  = != < <= > >=  + - * div mod  unary -  union ``|``  ( )
    core functions: string number boolean not true false count sum concat
    contains starts-with substring substring-before substring-after
    string-length normalize-space translate name local-name namespace-uri
    floor ceiling
    round position last
    node-set comparison semantics (existential, §3.4) and the §4.2
    number→string formatting (integers print without a decimal point)

supported select/match paths (relative to the context node)
    .   ..   name   a/b/c   @attr   a/@attr   text()   *   /absolute/path
    $param   parent::n   ancestor::n   ancestor-or-self::n   self::n
    child::n   attribute::n   descendant::n   descendant-or-self::n
    following-sibling::n   preceding-sibling::n   following::n   preceding::n
    //  (descendant-or-self shorthand, in select paths AND match patterns;
    node-sets stay deduplicated in document order, XPath §3.3/§5; reverse
    axes present their spec proximity order to predicates first —
    ancestor::*[1] is the nearest ancestor)
    namespaces (round 5): ``pfx:name`` / ``pfx:*`` / ``@pfx:attr`` name
    tests in select paths AND match patterns, resolved via the
    STYLESHEET's xmlns declarations (merged across include/import; a
    prefix bound to two URIs raises). An UNPREFIXED name matches that
    local name in ANY namespace — a documented deviation from XPath 1.0
    (which matches only the null namespace): prefix-free Solr mapping
    sheets keep working over default-namespaced sources. name() returns
    a QName using a stylesheet-declared prefix when one exists for the
    node's URI (ElementTree does not retain source-document prefixes);
    the namespace:: axis itself stays gated.
    any step may carry predicates: a[2]  a[last()]  a[@id='x']  a[b='v']
    a[@attr]  a[position()&lt;3]  a[EXPR]  (chained ``[p][q]`` filters left
    to right; position() inside a predicate is the node's 1-based index in
    ITS step's candidate list per parent — XPath proximity position;
    number-valued predicates mean position()=N)

Anything else raises ``UnsupportedXsltError`` at compile or apply time —
never a silent wrong answer. Built-in rules: an element with no matching
template recurses into child elements; text nodes are NOT implicitly copied
(Solr-mapping stylesheets are explicit; deviation documented here).

PERMANENT SCOPE (round 6 close-out): the ``namespace::`` axis and the
documented unprefixed-name-test deviation are out of scope for this
interpreter — both stay behind the loud ``UnsupportedXsltError`` gate. The
subset already exceeds what Solr mapping stylesheets exercise; stylesheets
that need the namespace axis should use lxml (below), which this module
prefers automatically when installed.

For full XSLT install lxml — ``make_xslt_transform`` prefers it when present.
"""

from __future__ import annotations

import copy as _copy
import math
import re
import xml.etree.ElementTree as ET

XSL_NS = "http://www.w3.org/1999/XSL/Transform"
_X = "{%s}" % XSL_NS
_AVT_RE = re.compile(r"\{([^}]+)\}")
_STEP_RE = re.compile(r"^([^\[\]]+)((?:\[[^\]]*\])*)$")
_PRED_RE = re.compile(r"\[([^\]]*)\]")
_KEY_RE = re.compile(r"^key\(\s*'([^']*)'\s*,\s*([^)]*?)\s*\)(.*)$")


class UnsupportedXsltError(NotImplementedError):
    pass


def _expand_descendant(path: str) -> str:
    """Canonical XPath 1.0 §2.5 abbreviation: ``//`` outside predicates and
    string literals becomes ``/descendant-or-self::node()/``."""
    out: list[str] = []
    depth = 0
    quote = None
    i = 0
    while i < len(path):
        c = path[i]
        if quote:
            if c == quote:
                quote = None
            out.append(c)
            i += 1
            continue
        if c in "'\"":
            quote = c
        elif c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
        elif c == "/" and depth == 0 and path[i + 1 : i + 2] == "/":
            out.append("/descendant-or-self::node()/")
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _split_outside(s: str, sep: str) -> list[str]:
    """Split ``s`` on ``sep`` at bracket depth 0 and outside string
    literals (predicates may contain '/', '|' and quoted text)."""
    parts: list[str] = []
    cur: list[str] = []
    depth = 0
    quote = None
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
            cur.append(ch)
            continue
        if ch in "'\"":
            quote = ch
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


_NUM_FMT_TOK = re.compile(r"[0-9A-Za-z]+")

_ROMAN = (
    (1000, "m"), (900, "cm"), (500, "d"), (400, "cd"), (100, "c"),
    (90, "xc"), (50, "l"), (40, "xl"), (10, "x"), (9, "ix"),
    (5, "v"), (4, "iv"), (1, "i"),
)


def _format_number_token(num: int, tok: str) -> str:
    """One xsl:number format token (XSLT 1.0 §7.7.1): ``1`` decimal,
    ``01`` zero-padded to the token width, ``a``/``A`` alphabetic,
    ``i``/``I`` roman. Anything else raises loudly."""
    if tok and set(tok) <= set("0123456789") and tok.lstrip("0") in ("", "1"):
        return str(num).zfill(len(tok))
    if tok in ("a", "A"):
        s, n = "", num
        while n > 0:
            n, r = divmod(n - 1, 26)
            s = chr(ord("a") + r) + s
        return s.upper() if tok == "A" else s
    if tok in ("i", "I"):
        s, n = "", num
        for val, sym in _ROMAN:
            while n >= val:
                s += sym
                n -= val
        return s.upper() if tok == "I" else s
    raise UnsupportedXsltError(f"xsl:number format token {tok!r} not supported")


def _format_number_list(nums: list[int], fmt: str) -> str:
    """Format a count list against a format string: alphanumeric runs are
    format tokens, the runs between them separators; a leading run prefixes
    and a trailing run suffixes the result; extra numbers reuse the last
    token joined by the last separator (default ``.``), XSLT 1.0 §7.7.1."""
    toks = [(m.group(), m.start(), m.end()) for m in _NUM_FMT_TOK.finditer(fmt)]
    if not toks:
        raise UnsupportedXsltError(f"xsl:number format {fmt!r} has no tokens")
    prefix = fmt[: toks[0][1]]
    suffix = fmt[toks[-1][2] :]
    seps = [fmt[toks[i][2] : toks[i + 1][1]] for i in range(len(toks) - 1)]
    parts: list[str] = []
    for i, n in enumerate(nums):
        if i > 0:
            parts.append(seps[i - 1] if i - 1 < len(seps) else (seps[-1] if seps else "."))
        tok = toks[i][0] if i < len(toks) else toks[-1][0]
        parts.append(_format_number_token(n, tok))
    return prefix + "".join(parts) + suffix


def _strip_ns(tag: str) -> str:
    return tag.split("}", 1)[1] if tag.startswith("{") else tag


def _string_value(node) -> str:
    if isinstance(node, ET.Element):
        return "".join(node.itertext())
    if isinstance(node, bool):  # before float: bool is not float, but be explicit
        return "true" if node else "false"
    if isinstance(node, float):
        return _num_str(node)
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


def _num_str(f: float) -> str:
    """XPath number→string (§4.2): integers without a decimal point."""
    if f != f:
        return "NaN"
    if f == float("inf"):
        return "Infinity"
    if f == float("-inf"):
        return "-Infinity"
    if f == int(f) and abs(f) < 1e16:
        return str(int(f))
    return repr(f)


def _xstr(v) -> str:
    """XPath string() of an evaluator value (§4.2): node-sets take the
    FIRST node's string-value; '' when empty."""
    if isinstance(v, list):
        return _string_value(v[0]) if v else ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _num_str(v)
    return _string_value(v)


def _xnum(v) -> float:
    """XPath number() (§4.4): NaN on non-numeric strings."""
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    s = _xstr(v).strip()
    try:
        return float(s)
    except ValueError:
        return float("nan")


def _xbool(v) -> bool:
    """XPath boolean() (§4.3)."""
    if isinstance(v, list):
        return len(v) > 0
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v == v and v != 0.0
    return len(_xstr(v)) > 0


_XP_TOK = re.compile(
    r"""\s*(?:
      (?P<str>'[^']*'|"[^"]*")
    | (?P<num>\d+(?:\.\d+)?|\.\d+)
    | (?P<dslash>//)
    | (?P<ddot>\.\.)
    | (?P<axis>[A-Za-z][\w\-]*::)
    | (?P<name>[A-Za-z_][\w\-.]*(?::(?:[A-Za-z_][\w\-.]*|\*))?)
    | (?P<op>!=|<=|>=|[()\[\],|=<>+\-*/@$.])
    )""",
    re.X,
)


class _XPathEval:
    """XPath 1.0 EXPRESSION evaluator (round 5).

    Covers or/and, = != < <= > >= (node-set existence semantics), + -
    * div mod, unary minus, union ``|``, parentheses, the core function
    library (string/number/boolean/count/concat/contains/starts-with/
    substring*/normalize-space/string-length/translate/name/local-name/
    namespace-uri/
    sum/floor/ceiling/round/position/last/true/false/not), and
    LocationPaths. Paths (incl. ``key()`` and ``$var`` refs) delegate to
    :meth:`MiniXSLT._select` by source-slice, so path semantics (axes,
    predicates, keys) live in ONE place. Unrecognized syntax raises
    :class:`UnsupportedXsltError` — the module's loud-failure contract.
    Reference twin: the JAXP processor the handler compiles
    (XsltUpdateHandler.java:114-136) exposes full XPath 1.0.

    Values: ``list`` = node-set, ``str``, ``float``, ``bool``.
    """

    _FUNCS = {
        "position", "last", "count", "sum", "string", "number", "boolean",
        "not", "true", "false", "concat", "contains", "starts-with",
        "substring", "substring-before", "substring-after", "string-length",
        "normalize-space", "translate", "name", "local-name",
        "namespace-uri", "floor", "ceiling", "round",
    }
    _PATH_NODETESTS = ("text", "node")

    def __init__(self, m: "MiniXSLT", ctx: "_Ctx", root, src: str):
        self.m = m
        self.ctx = ctx
        self.root = root
        self.src = src
        self.toks: list[tuple[str, str, int, int]] = []
        pos = 0
        while pos < len(src):
            mt = _XP_TOK.match(src, pos)
            if not mt or mt.end() == pos:
                if src[pos:].strip() == "":
                    break
                raise UnsupportedXsltError(f"cannot tokenize XPath: {src!r}")
            kind = mt.lastgroup
            self.toks.append((kind, mt.group(kind), mt.start(kind), mt.end()))
            pos = mt.end()
        self.i = 0

    # -- token helpers --------------------------------------------------
    def _peek(self, off: int = 0):
        j = self.i + off
        return self.toks[j] if j < len(self.toks) else (None, None, -1, -1)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _is_op(self, text: str, off: int = 0) -> bool:
        k, v, _, _ = self._peek(off)
        return k == "op" and v == text

    # -- entry -----------------------------------------------------------
    def eval(self):
        v = self._or()
        if self.i < len(self.toks):
            raise UnsupportedXsltError(
                f"trailing tokens in XPath {self.src!r} at {self.toks[self.i][1]!r}")
        return v

    # -- precedence-climbing grammar --------------------------------------
    def _or(self):
        v = self._and()
        while self._peek()[0] == "name" and self._peek()[1] == "or":
            self._next()
            r = self._and()
            v = _xbool(v) or _xbool(r)
        return v

    def _and(self):
        v = self._eq()
        while self._peek()[0] == "name" and self._peek()[1] == "and":
            self._next()
            r = self._eq()
            v = _xbool(v) and _xbool(r)
        return v

    def _eq(self):
        v = self._rel()
        while self._is_op("=") or self._is_op("!="):
            op = self._next()[1]
            v = self._compare(op, v, self._rel())
        return v

    def _rel(self):
        v = self._add()
        while self._is_op("<") or self._is_op("<=") or self._is_op(">") or self._is_op(">="):
            op = self._next()[1]
            v = self._compare(op, v, self._add())
        return v

    def _add(self):
        v = self._mul()
        while self._is_op("+") or self._is_op("-"):
            op = self._next()[1]
            r = _xnum(self._mul())
            v = _xnum(v) + r if op == "+" else _xnum(v) - r
        return v

    def _mul(self):
        v = self._unary()
        while self._is_op("*") or (
            self._peek()[0] == "name" and self._peek()[1] in ("div", "mod")
            # 'div'/'mod' are operators only in operator position — i.e.
            # when they are NOT followed by something that continues a path
            and not self._is_op("/", 1) and not self._is_op("[", 1)
        ):
            op = self._next()[1]
            a, b = _xnum(v), _xnum(self._unary())
            if op == "*":
                v = a * b
            elif op == "div":
                try:
                    v = a / b
                except ZeroDivisionError:
                    v = float("nan") if a == 0 else float("inf") if a > 0 else float("-inf")
            else:
                v = math.fmod(a, b) if b else float("nan")
        return v

    def _unary(self):
        if self._is_op("-"):
            self._next()
            return -_xnum(self._unary())
        return self._union()

    def _union(self):
        v = self._primary()
        while self._is_op("|"):
            self._next()
            r = self._primary()
            if not (isinstance(v, list) and isinstance(r, list)):
                raise UnsupportedXsltError("union | needs node-sets")
            seen = {id(x) for x in v}
            merged = v + [x for x in r if id(x) not in seen]
            order = getattr(self.m, "_doc_order", [])
            idx = {id(e): j for j, e in enumerate(order)}
            if all(id(x) in idx for x in merged):
                merged.sort(key=lambda x: idx[id(x)])  # document order
            v = merged
        return v

    # -- primaries ---------------------------------------------------------
    def _primary(self):
        k, val, s, e = self._peek()
        if k is None:
            raise UnsupportedXsltError(f"unexpected end of XPath {self.src!r}")
        if k == "str":
            self._next()
            return val[1:-1]
        if k == "num":
            self._next()
            return float(val)
        if k == "op" and val == "(":
            self._next()
            v = self._or()
            if not self._is_op(")"):
                raise UnsupportedXsltError(f"missing ) in {self.src!r}")
            self._next()
            return v
        if k == "op" and val == "$":
            self._next()
            nk, nv, ns_, ne = self._next()
            if nk != "name":
                raise UnsupportedXsltError(f"bad variable ref in {self.src!r}")
            # RAW value, not _select's node-set wrapping: a boolean/number
            # variable must keep its type ($flag and ... would otherwise see
            # a non-empty list == true regardless of the stored value)
            return self.m._lookup_var(self.ctx, nv)
        if k == "name" and self._is_op("(", 1):
            if val == "key":
                return self._path()
            if val in self._PATH_NODETESTS:
                return self._path()
            if val in self._FUNCS:
                return self._call(val)
            raise UnsupportedXsltError(f"unknown XPath function {val}()")
        if k in ("name", "ddot", "axis", "dslash") or (
            k == "op" and val in ("@", "/", ".", "*")
        ):
            return self._path()
        raise UnsupportedXsltError(f"cannot parse XPath at {val!r} in {self.src!r}")

    def _call(self, name: str):
        self._next()  # name
        self._next()  # (
        args = []
        if not self._is_op(")"):
            args.append(self._or())
            while self._is_op(","):
                self._next()
                args.append(self._or())
        if not self._is_op(")"):
            raise UnsupportedXsltError(f"missing ) after {name}( in {self.src!r}")
        self._next()
        return self._apply(name, args)

    def _apply(self, name: str, a: list):
        ctx = self.ctx
        if name == "position":
            return float(ctx.pos)
        if name == "last":
            return float(ctx.last)
        if name == "true":
            return True
        if name == "false":
            return False
        if name == "not":
            return not _xbool(a[0])
        if name == "boolean":
            return _xbool(a[0])
        if name == "number":
            return _xnum(a[0] if a else [ctx.node])
        if name == "string":
            return _xstr(a[0] if a else [ctx.node])
        if name == "count":
            if not isinstance(a[0], list):
                raise UnsupportedXsltError("count() needs a node-set")
            return float(len(a[0]))
        if name == "sum":
            if not isinstance(a[0], list):
                raise UnsupportedXsltError("sum() needs a node-set")
            return float(sum(_xnum([n]) for n in a[0]))
        if name in ("name", "local-name", "namespace-uri"):
            nodes = a[0] if a else [ctx.node]
            if not isinstance(nodes, list):
                raise UnsupportedXsltError(f"{name}() needs a node-set")
            if not nodes:
                return ""
            n = nodes[0]
            if not (isinstance(n, ET.Element) and isinstance(n.tag, str)):
                return ""
            uri = n.tag[1:].split("}", 1)[0] if n.tag.startswith("{") else ""
            if name == "namespace-uri":
                return uri
            if name == "local-name" or not uri:
                return _strip_ns(n.tag)
            # name(): QName using a stylesheet-declared prefix for the URI
            # (ET does not retain the source document's own prefixes); if
            # the stylesheet declares none, fall back to the local name —
            # documented, and better than inventing an ns0: prefix
            for pfx, u in self.m.ns.items():
                if u == uri:
                    return f"{pfx}:{_strip_ns(n.tag)}"
            return _strip_ns(n.tag)
        if name == "concat":
            return "".join(_xstr(x) for x in a)
        if name == "contains":
            return _xstr(a[1]) in _xstr(a[0])
        if name == "starts-with":
            return _xstr(a[0]).startswith(_xstr(a[1]))
        if name == "substring-before":
            s, sep = _xstr(a[0]), _xstr(a[1])
            return s.split(sep, 1)[0] if sep and sep in s else ""
        if name == "substring-after":
            s, sep = _xstr(a[0]), _xstr(a[1])
            return s.split(sep, 1)[1] if sep and sep in s else ""
        if name == "substring":
            # XPath 1-based with round() semantics (§4.2)
            s = _xstr(a[0])
            start = math.floor(_xnum(a[1]) + 0.5)
            if len(a) > 2:
                ln = math.floor(_xnum(a[2]) + 0.5)
                if ln != ln or start != start:
                    return ""
                lo = max(1, start)
                hi = start + ln
                return s[int(lo) - 1 : max(int(hi) - 1, 0)]
            if start != start:
                return ""
            return s[max(0, int(start) - 1):]
        if name == "string-length":
            return float(len(_xstr(a[0] if a else [ctx.node])))
        if name == "normalize-space":
            return " ".join(_xstr(a[0] if a else [ctx.node]).split())
        if name == "translate":
            s, frm, to = _xstr(a[0]), _xstr(a[1]), _xstr(a[2])
            table = {}
            for i, ch in enumerate(frm):
                if ch not in table:
                    table[ch] = to[i] if i < len(to) else None
            return "".join(
                table.get(ch, ch) for ch in s if table.get(ch, ch) is not None
            )
        if name == "floor":
            return float(math.floor(_xnum(a[0])))
        if name == "ceiling":
            return float(math.ceil(_xnum(a[0])))
        if name == "round":
            v = _xnum(a[0])
            return v if v != v else float(math.floor(v + 0.5))
        raise UnsupportedXsltError(f"XPath function {name}() not implemented")

    # -- location paths (delegated by source-slice) -------------------------
    def _path(self):
        start = self._peek()[2]
        end = start
        k, v, _, e = self._peek()
        if k == "dslash":
            # leading // — _select expands it (XPath §2.5 abbreviation)
            end = self._next()[3]
        elif k == "op" and v == "/":
            end = self._next()[3]
            if not self._path_step_starts():
                # bare "/" = document node
                return [self.root]
        if k == "name" and v == "key" and self._is_op("(", 1):
            self._next()  # key
            end = self._consume_balanced("(", ")")
            # optional /steps suffix
            while self._is_op("/") or self._peek()[0] == "dslash":
                self._next()
                end = self._consume_step()
            return self.m._select(self.ctx, self.src[start:end], self.root)
        end = self._consume_step()
        while self._is_op("/") or self._peek()[0] == "dslash":
            self._next()
            end = self._consume_step()
        return self.m._select(self.ctx, self.src[start:end], self.root)

    def _path_step_starts(self) -> bool:
        k, v, _, _ = self._peek()
        if k in ("name", "ddot", "axis", "dslash"):
            return True
        return k == "op" and v in ("@", ".", "*")

    def _consume_step(self) -> int:
        """Consume one path step (+ its predicates); return its end offset."""
        k, v, _, e = self._peek()
        if k == "axis":
            self._next()
            k, v, _, e = self._peek()
            if not (k == "name" or (k == "op" and v == "*")):
                raise UnsupportedXsltError(f"bad axis step in {self.src!r}")
            end = self._next()[3]
            if k == "name" and self._is_op("("):  # axis::node() / axis::text()
                if v not in self._PATH_NODETESTS:
                    raise UnsupportedXsltError(
                        f"function {v}() cannot appear as a nodetest")
                self._next()
                if not self._is_op(")"):
                    raise UnsupportedXsltError(f"bad nodetest in {self.src!r}")
                end = self._next()[3]
        elif k == "op" and v == "@":
            self._next()
            k, v, _, e = self._peek()
            if not (k == "name" or (k == "op" and v == "*")):
                raise UnsupportedXsltError(f"bad attribute step in {self.src!r}")
            end = self._next()[3]
        elif k == "ddot" or (k == "op" and v in (".", "*")):
            end = self._next()[3]
        elif k == "name":
            end = self._next()[3]
            if self._is_op("("):  # text() / node() nodetest
                if v not in self._PATH_NODETESTS:
                    raise UnsupportedXsltError(
                        f"function {v}() cannot appear as a path step")
                self._next()
                if not self._is_op(")"):
                    raise UnsupportedXsltError(f"bad nodetest in {self.src!r}")
                end = self._next()[3]
        else:
            raise UnsupportedXsltError(f"cannot parse path step in {self.src!r}")
        while self._is_op("["):
            end = self._consume_balanced("[", "]")
        return end

    def _consume_balanced(self, opener: str, closer: str) -> int:
        depth = 0
        while True:
            k, v, _, e = self._next()
            if k is None:
                raise UnsupportedXsltError(f"unbalanced {opener} in {self.src!r}")
            if k == "op" and v == opener:
                depth += 1
            elif k == "op" and v == closer:
                depth -= 1
                if depth == 0:
                    return e

    # -- comparisons (§3.4) -------------------------------------------------
    @staticmethod
    def _compare(op: str, a, b) -> bool:
        def cmp_scalar(x, y):
            if op == "=":
                return x == y
            if op == "!=":
                return x != y
            if op == "<":
                return x < y
            if op == "<=":
                return x <= y
            if op == ">":
                return x > y
            return x >= y

        rel = op in ("<", "<=", ">", ">=")
        if isinstance(a, list) and isinstance(b, list):
            av = [_string_value(x) for x in a]
            bv = [_string_value(y) for y in b]
            if rel:
                return any(cmp_scalar(_xnum(x), _xnum(y)) for x in av for y in bv)
            return any(cmp_scalar(x, y) for x in av for y in bv)
        if isinstance(a, list) or isinstance(b, list):
            ns, other = (a, b) if isinstance(a, list) else (b, a)
            flip = not isinstance(a, list)
            for n in ns:
                sv = _string_value(n)
                if rel or isinstance(other, float):
                    x, y = _xnum(sv), _xnum(other)
                elif isinstance(other, bool):
                    x, y = _xbool([n]), other
                else:
                    x, y = sv, _xstr(other)
                if cmp_scalar(*((y, x) if flip else (x, y))):
                    return True
            return False
        if rel:
            return cmp_scalar(_xnum(a), _xnum(b))
        if isinstance(a, bool) or isinstance(b, bool):
            return cmp_scalar(_xbool(a), _xbool(b))
        if isinstance(a, float) or isinstance(b, float):
            return cmp_scalar(_xnum(a), _xnum(b))
        return cmp_scalar(_xstr(a), _xstr(b))


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
        # name → [(imported, xsl:attribute-set element)]: same-name sets
        # MERGE (XSLT 1.0 §7.1.4) with importing-sheet attributes winning,
        # so imported declarations are applied first and get overridden
        self.attr_sets: dict[str, list[tuple[bool, ET.Element]]] = {}
        # prefix → namespace URI, merged across include/import (XPath 1.0
        # resolves name-test prefixes against the STYLESHEET's in-scope
        # declarations; one flat map + a loud conflict gate instead of
        # scoped maps — conflicting redeclarations are vanishingly rare in
        # mapping stylesheets and silent mis-resolution would be worse)
        self.ns: dict[str, str] = {}
        self._resolver = resolver
        self._compile(xslt_source, imported=False, seen=set())
        for decls in self.attr_sets.values():
            decls.sort(key=lambda t: not t[0])  # imported (lower prec) first
        # longer (more specific) match patterns first, stable otherwise
        self.templates.sort(key=lambda t: -len(t[0].split("/")))
        self.imported.sort(key=lambda t: -len(t[0].split("/")))

    def _collect_ns(self, xslt_source: str) -> None:
        pull = ET.XMLPullParser(["start-ns"])
        pull.feed(xslt_source)
        pull.close()
        for _, (pfx, uri) in pull.read_events():
            if not pfx or uri == XSL_NS:
                continue  # default ns / the xsl prefix itself
            prev = self.ns.get(pfx)
            if prev is not None and prev != uri:
                raise UnsupportedXsltError(
                    f"namespace prefix {pfx!r} bound to two URIs "
                    f"({prev!r} vs {uri!r}) — scoped prefix maps not supported")
            self.ns[pfx] = uri

    def _compile(self, xslt_source: str, imported: bool, seen: set) -> None:
        self._collect_ns(xslt_source)
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
            elif tag == f"{_X}attribute-set":
                aname = child.get("name")
                if not aname:
                    raise UnsupportedXsltError("xsl:attribute-set needs name=")
                self.attr_sets.setdefault(aname, []).append((imported, child))
            elif tag == f"{_X}output":
                continue  # serialization hints — we always emit unicode XML
            elif tag is ET.Comment:
                continue
            else:
                raise UnsupportedXsltError(f"top-level {tag} not supported")

    # -- path evaluation -------------------------------------------------------
    def _lookup_var(self, ctx: _Ctx, name: str):
        """Raw (un-wrapped) value of a parameter/variable binding."""
        if name in ctx.env:
            return ctx.env[name]
        if name in getattr(self, "_globals", {}):
            return self._globals[name]
        raise UnsupportedXsltError(f"undefined parameter/variable ${name}")

    def _eval_expr(self, ctx: _Ctx, src: str, root: ET.Element):
        """Full XPath 1.0 EXPRESSION evaluation (round 5): operators, the
        core function library, and location paths (paths delegate back to
        :meth:`_select`, so axis/predicate/key semantics live in one place).
        Returns a node-set ``list``, ``str``, ``float``, or ``bool``."""
        return _XPathEval(self, ctx, root, src).eval()

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
            val = self._lookup_var(ctx, name)
            return list(val) if isinstance(val, list) else [val]
        km = _KEY_RE.match(path)
        if km:
            return self._key_select(ctx, km, root)
        if "//" in path:
            path = _expand_descendant(path)
        # absolute paths start at the synthetic document node (whose only
        # child is the source root element), exactly like XSLT's "/"
        nodes: list = [root] if path.startswith("/") else [ctx.node]
        steps = [s.strip() for s in _split_outside(path, "/") if s.strip()]
        # reverse/descendant axes can emit duplicates or leave elements out
        # of document order (e.g. a//b visits b-children of a before deeper
        # b's that precede them); XPath node-sets are duplicate-free and in
        # document order (§3.3/§5) — normalize after each such step
        normalize = "::" in path or ".." in path
        order_idx = getattr(self, "_doc_order_idx", None)
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
            if (
                normalize
                and order_idx is not None
                and len(out) > 1
                and all(isinstance(v, ET.Element) for v in out)
            ):
                seen_ids: set[int] = set()
                uniq = []
                for v in out:
                    if id(v) not in seen_ids:
                        seen_ids.add(id(v))
                        uniq.append(v)
                uniq.sort(key=lambda e: order_idx.get(id(e), -1))
                out = uniq
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
                s = _xstr(self._eval_expr(ctx.at(n, 1, 1), sel, root))
                if dt == "number":
                    try:
                        return float(s)
                    except ValueError:
                        return float("-inf")  # NaN-like sorts first, as libxslt
                return s
            out.sort(key=keyf, reverse=(order == "descending"))
        return out

    def _expand_qname(self, qname: str) -> str:
        """``pfx:local`` → ElementTree's ``{uri}local`` via the stylesheet's
        xmlns declarations. Undeclared prefix = loud error, never a silent
        non-match."""
        pfx, local = qname.split(":", 1)
        uri = self.ns.get(pfx)
        if uri is None:
            raise UnsupportedXsltError(
                f"undeclared namespace prefix in name test: {qname!r}")
        return "{%s}%s" % (uri, local)

    def _nt(self, tag, test: str) -> bool:
        """XPath 1.0 name test against an ElementTree expanded tag.

        ``*`` / ``node()`` match any element; ``pfx:local`` and ``pfx:*``
        resolve the prefix against the stylesheet's xmlns declarations and
        compare namespace-exactly; an UNPREFIXED name matches that local
        name in ANY namespace — a documented deviation from XPath (which
        would match only the null namespace): Solr mapping stylesheets
        written without prefixes keep working over default-namespaced
        sources, and the prefixed form is available when namespace
        exactness matters."""
        if test in ("*", "node()"):
            return isinstance(tag, str)
        if not isinstance(tag, str):
            return False  # comments / PIs
        if ":" in test:
            pfx, local = test.split(":", 1)
            uri = self.ns.get(pfx)
            if uri is None:
                raise UnsupportedXsltError(
                    f"undeclared namespace prefix in name test: {test!r}")
            if local == "*":
                return tag.startswith("{%s}" % uri)
            return tag == "{%s}%s" % (uri, local)
        return _strip_ns(tag) == test

    def _step_base(self, n: ET.Element, base: str) -> list:
        base = base.strip()
        # explicit-axis sugar for the axes this subset supports
        if base.startswith("child::"):
            base = base[len("child::"):]
        elif base.startswith("attribute::"):
            base = "@" + base[len("attribute::"):]
        if base == "@*":
            return list(n.attrib.values())
        if base.startswith("@"):
            aname = base[1:]
            if ":" in aname:
                if aname.endswith(":*"):
                    return [v for k, v in n.attrib.items()
                            if self._nt(k, aname)]
                aname = self._expand_qname(aname)
            v = n.attrib.get(aname)
            return [v] if v is not None else []
        if base == "text()":
            return [n.text] if n.text else []
        if base == ".":
            return [n]
        if base == "*":
            return list(n)
        if base == "node()":
            # element children only — text nodes are not modeled as steppable
            # (same deviation as the built-in rules, module docstring)
            return list(n)
        if base == ".." or base.startswith("parent::"):
            # parent map is recorded per-document in __call__; the root
            # element's parent is the synthetic document node (XPath: the
            # root node), so ``../x`` from the root selects siblings-of-root
            # correctly (i.e. nothing but the root element itself)
            p = getattr(self, "_parent", {}).get(id(n))
            if p is None:
                return []
            if base == ".." or base == "parent::*" or (
                self._nt(p.tag, base[len("parent::"):])
            ):
                # parent::* is an ELEMENT test — the document stand-in isn't one
                if base != ".." and p.tag == "__document__":
                    return []
                return [p]
            return []
        if base.startswith(("ancestor::", "ancestor-or-self::")):
            name = base.split("::", 1)[1]
            chain = []
            cur = n if base.startswith("ancestor-or-self::") else \
                getattr(self, "_parent", {}).get(id(n))
            while cur is not None and cur.tag != "__document__":
                chain.append(cur)
                cur = getattr(self, "_parent", {}).get(id(cur))
            # AXIS order (nearest-first, XPath §2.2 reverse axis) so step
            # predicates see the spec's proximity position — ancestor::x[1]
            # is the NEAREST x; _select normalizes the final node-set back
            # into document order afterwards
            return [c for c in chain if self._nt(c.tag, name)]
        if base.startswith(("following-sibling::", "preceding-sibling::")):
            name = base.split("::", 1)[1]
            p = getattr(self, "_parent", {}).get(id(n))
            if p is None:
                return []
            sibs = [c for c in p if isinstance(c.tag, str)]
            i = next(j for j, c in enumerate(sibs) if c is n)
            if base.startswith("following-sibling::"):
                chosen = sibs[i + 1:]
            else:
                chosen = sibs[:i][::-1]  # reverse axis: nearest-first
            return [c for c in chosen if self._nt(c.tag, name)]
        if base.startswith(("following::", "preceding::")):
            # whole-document axes (§2.2): doc-order slices around n minus
            # its own subtree (following) / its ancestor chain (preceding)
            name = base.split("::", 1)[1]
            order = getattr(self, "_doc_order", None)
            idx = getattr(self, "_doc_order_idx", {}).get(id(n))
            if order is None or idx is None:
                return []
            if base.startswith("following::"):
                in_subtree = {id(d) for d in n.iter()}
                chosen = [e for e in order[idx + 1:] if id(e) not in in_subtree]
            else:
                ancs: set[int] = set()
                cur = self._parent.get(id(n))
                while cur is not None:
                    ancs.add(id(cur))
                    cur = self._parent.get(id(cur))
                # reverse axis: nearest (latest in doc order) first
                chosen = [e for e in order[:idx] if id(e) not in ancs][::-1]
            return [e for e in chosen if self._nt(e.tag, name)]
        if base.startswith(("descendant::", "descendant-or-self::")):
            name = base.split("::", 1)[1]
            if name == "text()":
                raise UnsupportedXsltError(
                    "descendant::text() not supported — use //text()")
            # n.iter() is a document-order walk that yields n itself first
            found = [d for d in n.iter() if self._nt(d.tag, name)]
            if base.startswith("descendant::"):
                found = [d for d in found if d is not n]
            return found
        if base.startswith("self::"):
            name = base[len("self::"):]
            return [n] if self._nt(n.tag, name) else []
        if "::" in base:
            raise UnsupportedXsltError(f"axis not supported: {base!r}")
        return [c for c in n if self._nt(c.tag, base)]

    def _pred(self, ctx: _Ctx, value, pred: str, pos: int, last: int,
              root: ET.Element) -> bool:
        pred = pred.strip()
        if pred.isdigit():  # fast path: [2] ≡ [position()=2], no ctx needed
            return pos == int(pred)
        if not isinstance(value, ET.Element) and not pred.startswith(
            ("position()", "last()")
        ):
            raise UnsupportedXsltError(
                f"predicate {pred!r} on a non-element value"
            )
        v = self._eval_expr(ctx.at(value, pos, last), pred, root)
        if isinstance(v, float):  # number-valued predicate ≡ position()=N (§2.4)
            return float(pos) == v
        return _xbool(v)

    # -- matching ------------------------------------------------------------
    def _apply_attr_sets(
        self, names: str, ctx: "_Ctx", root: ET.Element, target: ET.Element,
        _seen: frozenset = frozenset(),
    ) -> None:
        """``use-attribute-sets`` (XSLT 1.0 §7.1.4): whitespace-separated
        named sets of ``xsl:attribute`` instructions, applied BEFORE the
        element's own attributes so explicit ones override. Sets may use
        other sets; cycles and undefined names raise."""
        for name in names.split():
            if name in _seen:
                raise UnsupportedXsltError(f"circular attribute-set {name!r}")
            decls = self.attr_sets.get(name)
            if decls is None:
                raise UnsupportedXsltError(f"undefined attribute-set {name!r}")
            for _imported, decl in decls:
                nested = decl.get("use-attribute-sets")
                if nested:
                    self._apply_attr_sets(
                        nested, ctx, root, target, _seen | {name})
                for a in decl:
                    if a.tag is ET.Comment:
                        continue
                    if a.tag != f"{_X}attribute":
                        raise UnsupportedXsltError(
                            "attribute-set may contain only xsl:attribute")
                    buf = ET.Element("__attr__")
                    self._run_body(a, ctx, root, buf)
                    target.set(
                        self._avt(a.get("name", ""), ctx, root),
                        buf.text or "",
                    )

    def _matches_pattern(self, elem: ET.Element, match: str) -> bool:
        """True if ``elem`` matches a (predicate-free) pattern like
        ``name``, ``a/b``, ``*``, ``/abs/path`` — suffix match on the
        recorded ancestor names (shared by template dispatch and xsl:key)."""
        if "|" in match:
            # pattern alternation (XSLT 1.0 §5.2 Pattern ::= ... '|' ...)
            alts = _split_outside(match, "|")
            if len(alts) > 1:
                return any(
                    self._matches_pattern(elem, m.strip())
                    for m in alts
                    if m.strip()
                )
        if "[" in match:
            return self._matches_pattern_with_preds(elem, match)
        if "//" in match:
            return self._matches_descendant_pattern(elem, match)
        steps = [s for s in match.split("/") if s]
        if not steps:
            return False
        if not self._nt(elem.tag, steps[-1]):
            return False
        anc = self._ancestors.get(id(elem), [])
        want = steps[:-1]
        if len(want) <= len(anc) and all(
            self._nt(a, w) for w, a in zip(want, anc[len(anc) - len(want):])
        ):
            return not match.startswith("/") or len(want) == len(anc)
        return False

    def _matches_pattern_with_preds(self, elem: ET.Element, match: str) -> bool:
        """Match pattern with step predicates and optional ``//`` gaps
        (XSLT 1.0 §5.2), e.g. ``item[@active='yes']``, ``a[2]/b``,
        ``cat//item[2]``. Walks the actual ancestor elements right-to-left,
        backtracking over every candidate ancestor at each descendant gap;
        each step's predicates are evaluated with the spec's proximity
        position — the element's 1-based index among same-nodetest siblings
        (Patterns §5.2 child-axis semantics)."""
        absolute = match.startswith("/") and not match.startswith("//")
        # document root for absolute paths inside predicate expressions
        root = elem
        while True:
            p = self._parent.get(id(root))
            if p is None:
                break
            root = p
        # ``//``-separated groups of ``/``-separated steps: an empty part
        # from the single-char split marks the gap ("a//b" → ["a","","b"])
        parts = [s.strip() for s in _split_outside(match.lstrip("/"), "/")]
        groups: list[list[str]] = []
        cur_group: list[str] = []
        for s in parts:
            if s:
                cur_group.append(s)
            elif cur_group:
                groups.append(cur_group)
                cur_group = []
            else:
                return False  # "///" or empty step — malformed pattern
        if cur_group:
            groups.append(cur_group)
        if not groups:
            return False
        return self._match_step_groups(elem, groups, absolute, root)

    def _match_step_groups(
        self, elem: ET.Element, groups: list[list[str]],
        absolute: bool, root: ET.Element,
    ) -> bool:
        """The last group's steps must chain parent-to-parent ending at
        ``elem``; each earlier group must end at SOME ancestor above it
        (descendant gap). Absolute patterns anchor the first group's top
        step directly under the document node."""
        cur: ET.Element | None = elem
        for step in reversed(groups[-1]):
            if cur is None or cur.tag == "__document__":
                return False
            if not self._elem_matches_step(cur, step, root):
                return False
            cur = self._parent.get(id(cur))
        rest = groups[:-1]
        if not rest:
            if absolute:
                return cur is not None and cur.tag == "__document__"
            return True
        anc = cur
        while anc is not None and anc.tag != "__document__":
            if self._match_step_groups(anc, rest, absolute, root):
                return True
            anc = self._parent.get(id(anc))
        return False

    def _elem_matches_step(
        self, e: ET.Element, step: str, root: ET.Element
    ) -> bool:
        m = _STEP_RE.match(step)
        if not m:
            raise UnsupportedXsltError(f"cannot parse pattern step {step!r}")
        base, preds_src = m.group(1).strip(), m.group(2)
        if "::" in base or base in ("..", ".") or base.startswith("@"):
            raise UnsupportedXsltError(
                f"only name/* steps supported in match patterns: {step!r}")
        if not self._nt(e.tag, base):
            return False
        preds = _PRED_RE.findall(preds_src) if preds_src else []
        if not preds:
            return True
        parent = self._parent.get(id(e))
        if parent is not None:
            sibs = [c for c in parent if self._nt(c.tag, base)]
            pos = 1 + next(j for j, c in enumerate(sibs) if c is e)
            last = len(sibs)
        else:
            pos = last = 1
        ctx = _Ctx(e)
        return all(
            self._pred(ctx, e, pred, pos, last, root) for pred in preds
        )

    def _matches_descendant_pattern(self, elem: ET.Element, match: str) -> bool:
        """``//`` in a match pattern (XSLT 1.0 §5.2): ``a//b`` matches a b
        with an ``a`` ancestor, ``//b`` ≡ ``b``. Compiled to a regex over the
        space-joined ancestor-tag chain (expanded tags cannot contain
        spaces — a URI with a space is not a valid URI)."""
        anc = self._ancestors.get(id(elem), [])
        chain = " " + " ".join(anc + [elem.tag]) + " "
        absolute = match.startswith("/") and not match.startswith("//")

        def step_rx(s: str) -> str:
            if s == "*":
                return "[^ ]+"
            if ":" in s:
                uri, local = self._expand_qname(s)[1:].split("}", 1)
                return re.escape("{%s}" % uri) + (
                    "[^ ]+" if local == "*" else re.escape(local))
            # unprefixed: any (or no) namespace — the _nt deviation
            return r"(?:\{[^ }]*\})?" + re.escape(s)

        groups = []
        for g in match.split("//"):
            steps = [s for s in g.split("/") if s]
            if steps:
                groups.append(" ".join(step_rx(s) for s in steps))
        if not groups:
            return False
        gap = " (?:[^ ]+ )*"
        rx = (
            ("^ " if absolute else "^ (?:[^ ]+ )*")
            + gap.join(groups)
            + " $"
        )
        return re.match(rx, chain) is not None

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
                    record(c, path + [e.tag])

        record(src, [])
        self._parent[id(src)] = doc  # parent of the root ELEMENT = root node
        # id → document-order rank, for node-set normalization in _select
        # (the synthetic document node is absent → ranks -1, i.e. first)
        self._doc_order_idx = {id(e): i for i, e in enumerate(self._doc_order)}
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
        """xsl:if/xsl:when test: XPath boolean() of the expression value."""
        return _xbool(self._eval_expr(ctx, test.strip(), root))

    def _avt(self, value: str, ctx: _Ctx, root: ET.Element) -> str:
        return _AVT_RE.sub(
            lambda m: _xstr(self._eval_expr(ctx, m.group(1), root)),
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
            # full expression: value keeps its XPath type (node-set, string,
            # number, boolean) — $refs see it raw via _lookup_var
            return self._eval_expr(ctx, sel, root)
        buf = ET.Element("__param__")
        # _run_body emits the leading literal text into buf already
        self._run_body(node, ctx, root, buf)
        if len(buf):
            raise UnsupportedXsltError("element-valued parameters not supported")
        return [buf.text or ""]

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

    def _number(self, node: ET.Element, ctx: _Ctx, out: ET.Element,
                root: ET.Element) -> None:
        """xsl:number: level="single"|"any"|"multiple", count=pattern
        (default: same name as the current node), from=pattern (bounds the
        ancestor walk / resets the doc-order count, §7.7), value=EXPR,
        format tokens 1/01/a/A/i/I with literal separators (§7.7.1)."""
        fmt = node.get("format", "1")
        level = node.get("level", "single")
        if level not in ("single", "any", "multiple"):
            raise UnsupportedXsltError(f"xsl:number level={level!r} not supported")
        if node.get("value") is not None:
            # value=EXPR: round the number, format with the first token (§7.7)
            n = _xnum(self._eval_expr(ctx, node.get("value"), root))
            if n != n:
                raise UnsupportedXsltError("xsl:number value= is NaN")
            self._append_text(out, _format_number_list([int(round(n))], fmt))
            return
        cur = ctx.node
        if not isinstance(cur, ET.Element) or not isinstance(cur.tag, str):
            raise UnsupportedXsltError("xsl:number outside an element context")
        count_pat = node.get("count")
        if count_pat is None:
            # default count: same EXPANDED name as the context node (§7.7 —
            # namespace-exact, unlike an unprefixed name test)
            name = cur.tag
            matches = lambda e: e.tag == name  # noqa: E731
        else:
            matches = lambda e: self._matches_pattern(e, count_pat)  # noqa: E731
        from_pat = node.get("from")
        if from_pat is None:
            matches_from = lambda e: False  # noqa: E731
        else:
            matches_from = lambda e: self._matches_pattern(e, from_pat)  # noqa: E731

        def sib_index(target: ET.Element) -> int:
            parent = self._parent.get(id(target))
            if parent is None:
                return 1
            sibs = [c for c in parent if isinstance(c.tag, str) and matches(c)]
            return 1 + sibs.index(target)

        if level == "single":
            target = cur
            while target is not None and target.tag != "__document__" \
                    and not matches(target):
                if matches_from(target):
                    return  # walk bounded by from= (§7.7) → empty string
                target = self._parent.get(id(target))
            if target is None or target.tag == "__document__":
                return  # empty count list → empty string (XSLT 1.0 §7.7)
            self._append_text(out, _format_number_list([sib_index(target)], fmt))
        elif level == "multiple":
            # every matching ancestor-or-self below the nearest from= match,
            # root-first (§7.7 level=multiple)
            chain: list = []
            target = cur
            while target is not None and target.tag != "__document__":
                if matches_from(target):
                    break
                if matches(target):
                    chain.append(target)
                target = self._parent.get(id(target))
            chain.reverse()
            if not chain:
                return
            self._append_text(
                out, _format_number_list([sib_index(t) for t in chain], fmt)
            )
        else:  # any: matching nodes at or before cur in document order,
            # counted from the most recent from= match (§7.7)
            n = 0
            for e in self._doc_order:
                if matches_from(e):
                    n = 0
                elif matches(e):
                    n += 1
                if e is cur:
                    break
            self._append_text(out, _format_number_list([n], fmt) if n else "")

    def _run_body(self, body: ET.Element, ctx: _Ctx, root: ET.Element,
                  out: ET.Element) -> None:
        if body.text and body.text.strip():
            # literal text before the first instruction (instruction TAILS
            # were always emitted — line guard mirrors theirs; the body's
            # leading text was silently dropped until round 5b)
            self._append_text(out, body.text)
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
                v = self._eval_expr(ctx, node.get("select", "."), root)
                self._append_text(out, _xstr(v))
            elif tag == f"{_X}copy-of":
                v = self._eval_expr(ctx, node.get("select", "."), root)
                for n in (v if isinstance(v, list) else [v]):
                    if isinstance(n, ET.Element):
                        out.append(_copy.deepcopy(n))
                    else:
                        self._append_text(out, _string_value(n))
            elif tag == f"{_X}element":
                # computed-name element (name= is an AVT, XSLT §7.1.2)
                if node.get("namespace"):
                    raise UnsupportedXsltError(
                        "xsl:element namespace= not supported")
                ename = self._avt(node.get("name", ""), ctx, root)
                if not ename:
                    raise UnsupportedXsltError("xsl:element with empty name")
                sub = ET.SubElement(out, ename)
                uas = node.get("use-attribute-sets")
                if uas:
                    self._apply_attr_sets(uas, ctx, root, sub)
                self._run_body(node, ctx, root, sub)
            elif tag == f"{_X}copy":
                # shallow copy of the context node (§7.5): element → same
                # tag, NO attributes; document node → body runs in place
                cur = ctx.node
                uas = node.get("use-attribute-sets")
                if not isinstance(cur, ET.Element):
                    self._append_text(out, _xstr(cur))
                elif cur.tag == "__document__":
                    self._run_body(node, ctx, root, out)
                else:
                    sub = ET.SubElement(out, _strip_ns(cur.tag))
                    if uas:
                        self._apply_attr_sets(uas, ctx, root, sub)
                    self._run_body(node, ctx, root, sub)
            elif tag == f"{_X}text":
                self._append_text(out, node.text or "")
            elif tag == f"{_X}sort":
                continue  # consumed by the enclosing for-each/apply-templates
            elif tag == f"{_X}for-each":
                subs = self._eval_expr(ctx, node.get("select", "."), root)
                if not isinstance(subs, list):
                    raise UnsupportedXsltError(
                        "for-each select must evaluate to a node-set"
                    )
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
                if sel is not None:
                    targets = self._eval_expr(ctx, sel, root)
                    if not isinstance(targets, list):
                        raise UnsupportedXsltError(
                            "apply-templates select must evaluate to a node-set"
                        )
                else:
                    targets = [c for c in ctx.node if isinstance(c.tag, str)]
                targets = self._sorted(targets, self._sort_spec(node), ctx, root)
                for i, t in enumerate(targets, 1):
                    if not isinstance(t, ET.Element):
                        raise UnsupportedXsltError("apply-templates over values")
                    self._apply_one(ctx.at(t, i, len(targets)), root, out, mode)
            elif tag == f"{_X}call-template":
                self._call_template(node, ctx, root, out)
            elif tag == f"{_X}number":
                self._number(node, ctx, out, root)
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
                # _run_body emits the leading literal text into buf already
                self._run_body(node, ctx, root, buf)
                target.set(
                    self._avt(node.get("name", ""), ctx, root),
                    buf.text or "",
                )
            elif tag.startswith(_X):
                raise UnsupportedXsltError(f"unsupported instruction {tag}")
            else:  # literal result element
                lit = ET.SubElement(
                    out, _strip_ns(tag) if not tag.startswith("{") else tag
                )
                uas = node.get(f"{_X}use-attribute-sets")
                if uas:  # sets first — literal attributes override (§7.1.4)
                    self._apply_attr_sets(uas, ctx, root, lit)
                for k, v in node.attrib.items():
                    if k == f"{_X}use-attribute-sets":
                        continue
                    lit.set(k, self._avt(v, ctx, root))
                # leading literal text is emitted by _run_body
                self._run_body(node, ctx, root, lit)
            # literal trailing text inside templates (rare in mapping sheets)
            if node.tail and node.tail.strip():
                self._append_text(out, node.tail)
