"""Minimal DOM + CSS-selector engine with Jsoup-equivalent semantics.

The container has no bs4/lxml/selectolax, so the engine ships its own
parser built on ``html.parser.HTMLParser``. It implements exactly the
surface the reference uses (SURVEY.md §2.9) and defines the
conformance semantics for the fixture corpus:

- ``select(css)`` with compound selectors (``tag``, ``#id``,
  ``.class``, ``[attr]``, ``[attr='val']``, multiple attr filters) and
  descendant (space) / child (``>``) combinators — enough for all five
  selectors the reference scrapes with
  (``div[data-cy='ad_title']``, ``div[data-testid='ad-price-container']``,
  ``div#mainContent ul>li>p``,
  ``div[data-testid='l-card'][data-cy='l-card'] a``,
  ``a[data-cy='pagination-forward'][data-testid='pagination-forward']``,
  reference ``DownloadAds.scala:46-49`` / ``DownloadLinks.scala:38-39``).
- ``text(nodes)`` = Jsoup ``Elements.text()``: each element's
  whitespace-normalized text, elements joined by a single space,
  empty-text elements skipped. Within an element, consecutive
  whitespace collapses to one space; crossing a *block*-element
  boundary (p, div, li, br, ...) inserts a space; inline boundaries
  (b, span, a, ...) do not.
- ``attr(nodes, name)`` = Jsoup ``Elements.attr()``: value from the
  FIRST element that has the attribute, else "".

This is a per-document Python kernel by nature (same as Jsoup); the
batching/vectorization happens one level up: ``map_batches`` hands a
whole Arrow batch of html strings to one call, and actor pools amortize
setup. Parsed selector programs are cached module-global.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}
# tags whose boundary contributes whitespace in text() (Jsoup block elements)
_BLOCK = {
    "address", "article", "aside", "blockquote", "body", "div", "dl",
    "dt", "dd", "fieldset", "figure", "footer", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "hr", "html", "li", "main",
    "nav", "ol", "p", "pre", "section", "table", "tr", "td", "th",
    "ul", "br",
}
# tags that implicitly close an open element of the same kind
_SELF_NESTING_CLOSE = {"li", "p", "tr", "td", "th", "option"}

# inline/formatting elements an implied end tag may close ACROSS:
# <li>a<b>x<li>b must close the first li (and the dangling <b>) the way
# Jsoup/HTML5 do, but the search never crosses block/list/table
# boundaries (a li in a NESTED ul is its own level)
_INLINE = {"a", "b", "i", "em", "strong", "span", "u", "s", "small",
           "big", "code", "sub", "sup", "font", "mark", "abbr", "cite",
           "q", "time", "var", "kbd", "samp"}

_WS = re.compile(r"\s+")


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []  # Node | str (text)
        self.parent = parent

    # -- Jsoup Element.text() -------------------------------------------
    def text(self) -> str:
        parts: list[str] = []
        self._accum(parts)
        out = "".join(parts)
        return _WS.sub(" ", out).strip()

    def _accum(self, parts: list[str]) -> None:
        for c in self.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                if c.tag in _BLOCK:
                    parts.append(" ")
                c._accum(parts)
                if c.tag in _BLOCK:
                    parts.append(" ")

    def iter(self):
        """Document-order traversal of element nodes (self excluded)."""
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter()

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.tag} {self.attrs}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        # implied end tag: a new <li>/<p>/<tr>/… closes an open element
        # of the same tag, searching across unclosed INLINE elements
        # (<li>a<b>x<li> closes the first li AND the dangling b, per
        # Jsoup/HTML5) but never across block/list/table boundaries
        if tag in _SELF_NESTING_CLOSE:
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t == tag:
                    del self.stack[i:]
                    break
                if t not in _INLINE:
                    break
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if tag in _VOID:
            node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
            self.stack[-1].children.append(node)
        else:
            # HTML5 (and Jsoup): the trailing slash on a non-void tag is
            # IGNORED — <div/> opens a div; treating it as a leaf would
            # push the element's real content out as siblings
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        # pop to the matching open tag if present; ignore stray closers
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        # script/style payloads are NOT text: Jsoup keeps them as
        # DataNodes and Element.text() excludes them — appending them
        # here would leak inline JS/CSS into extracted spans
        if data and self.stack[-1].tag not in ("script", "style"):
            self.stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    tb = _TreeBuilder()
    tb.feed(html or "")
    tb.close()
    return tb.root


# ------------------------------------------------------------ selectors
_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<rest>(?:#[\w-]+|\.[\w-]+|\[[^\]]+\])*)"
)
_PART_RE = re.compile(r"#([\w-]+)|\.([\w-]+)|\[([^\]]+)\]")
_ATTR_RE = re.compile(r"^([\w-]+)\s*(?:=\s*(?:'([^']*)'|\"([^\"]*)\"|([^\s\]]+)))?$")

_selector_cache: dict[str, list[tuple[str, tuple]]] = {}


def _compile_simple(s: str) -> tuple:
    m = _SIMPLE_RE.fullmatch(s)
    if not m:
        raise ValueError(f"unsupported selector component: {s!r}")
    tag = m.group("tag")
    tag = None if tag in (None, "*") else tag.lower()
    id_ = None
    classes: list[str] = []
    attrs: list[tuple[str, str | None]] = []
    for pm in _PART_RE.finditer(m.group("rest") or ""):
        if pm.group(1):
            id_ = pm.group(1)
        elif pm.group(2):
            classes.append(pm.group(2))
        else:
            am = _ATTR_RE.match(pm.group(3).strip())
            if not am:
                raise ValueError(f"unsupported attr selector: {pm.group(3)!r}")
            val = next((g for g in am.groups()[1:] if g is not None), None)
            attrs.append((am.group(1), val))
    return (tag, id_, tuple(classes), tuple(attrs))


def _tokenize_selector(css: str) -> list[str]:
    """Split a selector on whitespace / '>' OUTSIDE brackets and quotes
    — `[attr='a b']` is one token even though its value has a space."""
    toks: list[str] = []
    cur: list[str] = []
    depth = 0
    quote: str | None = None
    for ch in css.strip():
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
            continue
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
        if depth == 0 and (ch.isspace() or ch == ">"):
            if cur:
                toks.append("".join(cur))
                cur = []
            if ch == ">":
                toks.append(">")
            continue
        cur.append(ch)
    if cur:
        toks.append("".join(cur))
    return toks


def _compile(css: str) -> list[tuple[str, tuple]]:
    """Compile a selector into [(combinator, simple)] left→right;
    combinator is ' ' (descendant) or '>' (child); first entry ' '."""
    prog = _selector_cache.get(css)
    if prog is not None:
        return prog
    prog = []
    comb = " "
    for t in _tokenize_selector(css):
        if t == ">":
            comb = ">"
            continue
        prog.append((comb, _compile_simple(t)))
        comb = " "
    _selector_cache[css] = prog
    return prog


def _matches(node: Node, simple: tuple) -> bool:
    tag, id_, classes, attrs = simple
    if tag is not None and node.tag != tag:
        return False
    if id_ is not None and node.attrs.get("id") != id_:
        return False
    if classes:
        have = node.attrs.get("class", "").split()
        if any(c not in have for c in classes):
            return False
    for name, val in attrs:
        if name not in node.attrs:
            return False
        if val is not None and node.attrs[name] != val:
            return False
    return True


def select(root: Node, css: str) -> list[Node]:
    """All elements under ``root`` matching ``css``, in document order."""
    prog = _compile(css)
    out: list[Node] = []
    for node in root.iter():
        if _match_chain(node, prog, len(prog) - 1):
            out.append(node)
    return out


def _match_chain(node: Node, prog: list[tuple[str, tuple]], i: int) -> bool:
    comb, simple = prog[i]
    if not _matches(node, simple):
        return False
    if i == 0:
        return True
    parent = node.parent
    if comb == ">":
        return parent is not None and parent.tag != "#root" and _match_chain(parent, prog, i - 1)
    # descendant: any ancestor satisfies the prefix chain
    while parent is not None and parent.tag != "#root":
        if _match_chain(parent, prog, i - 1):
            return True
        parent = parent.parent
    return False


# --------------------------------------------------- Jsoup Elements API
def text(nodes: list[Node]) -> str:
    """Jsoup ``Elements.text()``: non-empty element texts joined by ' '."""
    return " ".join(t for t in (n.text() for n in nodes) if t)


def attr(nodes: list[Node], name: str) -> str:
    """Jsoup ``Elements.attr()``: first element that has the attribute."""
    for n in nodes:
        if name in n.attrs:
            return n.attrs[name]
    return ""
