"""Stdlib-HTML DOM instrumenter: html -> ordered node rows.

Re-implements the reference's page-level parse on ``html.parser``
(bs4 is unavailable here), preserving the three invariants every
downstream operator depends on (SURVEY.md §1.b):

1. **Node-ID assignment** — reverse pre-order via a LIFO stack that
   pushes children in document order and pops last-child-first
   (reference: src/warc/build.py:37-67, identical at app/builder.py:38-59).
   Consequence: for any two nodes where neither is the other's ancestor,
   *descending node_id == document order*; final text assembly sorts
   node_id descending (src/warc/get_text.py:36).
2. **Synthetic text nodes** — bare strings are wrapped in
   ``<span instrument_node>`` and get their own id, *except* strings
   directly under an existing ``<span>`` (src/warc/build.py:54-63).
3. **noscript exclusion** — an instrument span whose parent is
   ``<noscript>`` is not a text node (src/api/CommonCrawlApi.py:53).

The per-page node graph is per-row scratch state, never a distributed
structure: this module is pure Python and runs inside ``mapInPandas``
batches (operators/extract.py) and inside the single-process oracle.

Known divergence from bs4 (documented, corpus avoids them): comments,
doctypes and processing instructions are dropped entirely; bs4 would
treat a Comment as a wrappable string.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Elem:
    __slots__ = ("tag", "children", "parent", "node_id", "is_instrument")

    def __init__(self, tag: str, parent: "_Elem | None"):
        self.tag = tag
        self.children: list[object] = []  # _Elem | str
        self.parent = parent
        self.node_id: int | None = None
        self.is_instrument = False


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.top: list[object] = []
        self._stack: list[_Elem] = []

    def _append(self, child: object) -> None:
        if self._stack:
            self._stack[-1].children.append(child)
            if isinstance(child, _Elem):
                child.parent = self._stack[-1]
        else:
            self.top.append(child)

    def handle_starttag(self, tag: str, attrs) -> None:
        el = _Elem(tag, None)
        self._append(el)
        if tag not in VOID_TAGS:
            self._stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._append(_Elem(tag, None))

    def handle_endtag(self, tag: str) -> None:
        # tolerant close: pop to the nearest matching open tag, else ignore
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data and not self._drop_flush:
            self._append(data)

    _drop_flush = False

    def close(self) -> None:
        # EOF recovery for truncated pages: stdlib close() flushes an
        # INCOMPLETE trailing tag ('<div cla' at EOF) as literal data
        # ('<' + 'div cla'), which would leak tag soup into extracted
        # text on every truncated crawl record. Drop the flush only when
        # the buffer is a genuine tag/comment/decl PREFIX — '<' followed
        # by a letter, '/', '!' or '?' — so literal trailing text like a
        # lone '<' or '< 3' (which the parser would have emitted as data
        # mid-stream) still flushes; buffered trailing text / incomplete
        # entities ('ends with &') flush normally too. bs4's html.parser
        # builder keeps the fragment; lxml drops it — we follow lxml
        # (tests/test_html_fuzz.py pins both paths).
        # ASCII letters only: HTMLParser's tagfind only matches
        # [a-zA-Z], so 'i <é' at EOF is literal text mid-stream and must
        # flush here too (r4 ADVICE — str.isalpha() is Unicode-wide)
        buf = self.rawdata
        nxt = buf[1:2]
        self._drop_flush = buf.startswith("<") and (
            (nxt.isascii() and nxt.isalpha()) or nxt in ("/", "!", "?")
        )
        try:
            super().close()
        finally:
            self._drop_flush = False


class _Bail(Exception):
    """Fast tokenizer met a construct outside its proven subset."""


# Strict start-tag subset: simple name, whitespace-separated attrs with
# quoted values free of '<'/'>' or unquoted values free of specials, an
# optional self-closing slash. On every string this matches, stdlib
# html.parser's tolerant regexes (tagfind_tolerant/attrfind_tolerant/
# locatestarttagend_tolerant) find the SAME tag name, the same tag end,
# and the same start-vs-startend classification — anything else bails
# to the stdlib parser (tests/test_parser.py::test_fast_tokenizer_*
# pins the equivalence differentially).
#
# Whitespace inside the tag is the EXPLICIT ASCII class [\t\n\r\f ] —
# never \s. Python's \s additionally matches \x0b/\x85/\xa0/Unicode
# spaces, but stdlib tagfind_tolerant ends a tag NAME only on
# [\t\n\r\f />\x00], so '<p\x0bid=x>' is stdlib tag 'p\x0bid=x' while a
# \s-based fast pattern would silently parse tag 'p' (r6 code-review
# catch, reproduced). With the ASCII class such inputs simply fail the
# match and bail to stdlib. Exception: quoted attr VALUES may contain
# anything but the quote/angle chars — both parsers end them at the
# closing quote, so no divergence is possible there.
_WS = "\\t\\n\\r\\f "  # ASCII tag whitespace (see note above)
_FAST_STARTTAG = re.compile(
    rf"([a-zA-Z][-.a-zA-Z0-9:_]*)"                      # tag name
    rf"((?:[{_WS}]+[^{_WS}/>=<\"'`][^{_WS}/>=<\"'`]*"  # attr name
    rf"(?:[{_WS}]*=[{_WS}]*"                            # = value
    rf"(?:\"[^\"<>]*\"|'[^'<>]*'"                      # quoted value
    rf"|[^{_WS}<>\"'`=]+(?=[{_WS}/>])))?)*)"           # unquoted value
    rf"[{_WS}]*(/?)>"
)
_FAST_ENDTAG = re.compile(
    rf"/[{_WS}]*([a-zA-Z][-.a-zA-Z0-9:_]*)[{_WS}]*>"
)
_COMMENT_CLOSE = re.compile(r"--\s*>")  # == html.parser.commentclose


def _stdlib_cdata_close(elem: str) -> tuple[re.Pattern, re.Pattern]:
    """(search, strict) cdata terminators for ``elem``. ``search`` is
    the stdlib's OWN ``interesting`` regex, taken by introspection from
    a probe parser so the fast path's data-chunk boundary can never
    drift from the running interpreter's html.parser (the pattern
    changed across CPython versions: '</\\s*elem' pre-3.11.4 vs
    '</\\s*elem\\s*>' after — r6 code-review catch). ``strict`` is the
    full end-tag form; where ``search`` stops at something that is not
    a strict full end tag (possible only on the older pattern), the
    fast path bails instead of guessing."""
    probe = HTMLParser(convert_charrefs=True)
    probe.set_cdata_mode(elem)
    return probe.interesting, re.compile(rf"</\s*{elem}\s*>", re.I)


_CDATA_CLOSE = {elem: _stdlib_cdata_close(elem) for elem in ("script", "style")}


def _fast_feed(builder: _TreeBuilder, html: str) -> None:
    """Tokenize well-formed markup ~4x faster than HTMLParser.goahead,
    driving the SAME _TreeBuilder handlers so tree construction is
    shared with the stdlib path byte-for-byte. Raises _Bail on any
    construct outside the proven subset (caller re-parses via stdlib):
    malformed/incomplete tags, literal '<' in text, marked sections,
    unterminated comments/cdata."""
    i, n = 0, len(html)
    cdata_elem: str | None = None
    handle_data = builder.handle_data
    while i < n:
        if cdata_elem is not None:
            search, strict = _CDATA_CLOSE[cdata_elem]
            m = search.search(html, i)
            if m is None:
                raise _Bail  # EOF inside <script>/<style>
            e = strict.match(html, m.start())
            if e is None:
                raise _Bail  # stdlib would treat this as data; let it
            if m.start() > i:
                handle_data(html[i : m.start()])  # raw: no charref decode
            builder.handle_endtag(cdata_elem)
            cdata_elem = None
            i = e.end()
            continue
        j = html.find("<", i)
        if j < 0:
            handle_data(unescape(html[i:]))
            return
        if j > i:
            handle_data(unescape(html[i:j]))
        i = j
        nxt = html[i + 1 : i + 2]
        if nxt and nxt.isascii() and nxt.isalpha():
            m = _FAST_STARTTAG.match(html, i + 1)
            if m is None:
                raise _Bail
            tag = m.group(1).lower()
            if m.group(3):
                builder.handle_startendtag(tag, [])
            else:
                builder.handle_starttag(tag, [])
                if tag in _CDATA_CLOSE:
                    cdata_elem = tag
            i = m.end()
        elif nxt == "/":
            m = _FAST_ENDTAG.match(html, i + 1)
            if m is None:
                raise _Bail
            builder.handle_endtag(m.group(1).lower())
            i = m.end()
        elif html.startswith("<!--", i):
            m = _COMMENT_CLOSE.search(html, i + 4)
            if m is None:
                raise _Bail
            i = m.end()  # comments are dropped (no handler)
        elif nxt == "?":
            k = html.find(">", i + 2)
            if k < 0:
                raise _Bail
            i = k + 1  # PIs are dropped
        elif nxt == "!":
            if html.startswith("<![", i):
                raise _Bail  # marked section: stdlib-only path
            k = html.find(">", i + 2)
            if k < 0:
                raise _Bail
            i = k + 1  # doctype/bogus comment: dropped
        else:
            raise _Bail  # literal '<' data: stdlib-only path


def _parse_tree(html: str) -> list[object]:
    p = _TreeBuilder()
    try:
        _fast_feed(p, html)
        return p.top
    except _Bail:
        p = _TreeBuilder()  # discard partial fast-path state
        p.feed(html)
        p.close()
        return p.top


def _first_element(top: list[object]) -> _Elem | None:
    for child in top:
        if isinstance(child, _Elem):
            return child
    return None


def _instrument(root: _Elem) -> None:
    """Assign node ids exactly like the reference's add_node_id
    (src/warc/build.py:44-65): LIFO stack, children pushed in document
    order, bare strings span-wrapped (except directly under <span>)."""
    stack: list[_Elem] = [root]
    node_index = 0
    while stack:
        node = stack.pop()
        if node.node_id is not None:
            continue
        node.node_id = node_index
        node_index += 1
        for i, child in enumerate(node.children):
            if isinstance(child, str):
                if node.tag == "span":
                    continue  # bare strings under <span> stay unwrapped
                wrapper = _Elem("span", node)
                wrapper.is_instrument = True
                wrapper.children.append(child)
                node.children[i] = wrapper
                stack.append(wrapper)
            else:
                stack.append(child)


def _compute_texts(root: _Elem, cache: dict[int, str]) -> str:
    """One post-order pass: subtree text for every element (bs4 ``.text``
    semantics: all descendant strings in document order, '' separator)."""
    parts: list[str] = []
    for child in root.children:
        if isinstance(child, str):
            parts.append(child)
        else:
            parts.append(_compute_texts(child, cache))
    text = "".join(parts)
    cache[id(root)] = text
    return text


@dataclass
class NodeRow:
    """One instrumented DOM node, in document (pre-order) position ``seq``."""

    seq: int
    node_id: int
    tag: str
    is_text: bool
    text: str  # full subtree text, UN-stripped (C1 strip applied downstream)
    __slots__ = ("seq", "node_id", "tag", "is_text", "text")


def parse_nodes(html: str) -> list[NodeRow]:
    """html string -> instrumented node rows in document order.

    Document order mirrors the reference's ``soup.find_all()`` iteration
    over the instrumented tree (src/api/CommonCrawlApi.py:39-79), which is
    the order the model sequence is built in (src/warc/build.py:83).
    Returns [] for pages with no elements.
    """
    root = _first_element(_parse_tree(html))
    if root is None:
        return []
    _instrument(root)
    texts: dict[int, str] = {}
    _compute_texts(root, texts)

    rows: list[NodeRow] = []
    seq = 0
    # iterative pre-order walk over instrumented elements only
    walk: list[_Elem] = [root]
    while walk:
        el = walk.pop()
        if el.node_id is not None:
            is_text = el.is_instrument and (el.parent is None or el.parent.tag != "noscript")
            rows.append(NodeRow(seq, el.node_id, el.tag, is_text, texts[id(el)]))
            seq += 1
        walk.extend(
            c for c in reversed(el.children) if isinstance(c, _Elem)
        )
    return rows
