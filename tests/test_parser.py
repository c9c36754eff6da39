"""HTML parser invariants (SURVEY.md §1.b) — reference semantics at
src/warc/build.py:37-67 and src/api/CommonCrawlApi.py:39-130."""

from neuscraper_spark.functions.text import strip_ws_py
from neuscraper_spark.html_parser import parse_nodes


HTML = (
    "<html><head><title>T</title></head><body>"
    "<p>Hello world</p><span>inline</span><noscript>NS</noscript>"
    "<ol><li>a</li><li>b</li></ol></body></html>"
)


def test_root_gets_id_zero():
    rows = parse_nodes(HTML)
    assert rows[0].tag == "html" and rows[0].node_id == 0


def test_reverse_preorder_ids():
    """LIFO assignment: for non-ancestor pairs, descending id == doc order."""
    rows = parse_nodes(HTML)
    text_rows = [r for r in rows if r.is_text]
    doc_order_texts = [r.text for r in text_rows]
    by_desc_id = [r.text for r in sorted(text_rows, key=lambda r: -r.node_id)]
    assert doc_order_texts == by_desc_id == ["T", "Hello world", "a", "b"]


def test_bare_string_under_span_not_wrapped():
    rows = parse_nodes(HTML)
    inline = [r for r in rows if r.text == "inline"]
    # the pre-existing <span> itself is not an instrument node
    assert all(not r.is_text for r in inline)


def test_noscript_excluded():
    rows = parse_nodes(HTML)
    ns = [r for r in rows if r.text == "NS" and r.tag == "span"]
    assert ns and not ns[0].is_text


def test_element_text_is_subtree_concat():
    rows = parse_nodes(HTML)
    ol = next(r for r in rows if r.tag == "ol")
    assert ol.text == "ab"


def test_whitespace_strings_get_ids_but_empty_text():
    rows = parse_nodes("<html><body>\n  <p>x</p>\n</body></html>")
    ws = [r for r in rows if r.is_text and strip_ws_py(r.text) == ""]
    assert len(ws) == 2  # the two newline runs were wrapped and got ids


def test_strip_charset_exact():
    assert strip_ws_py("\r\n\t\xa0 x\xa0 \t") == "x"
    assert strip_ws_py("\x0b x \x0b") == "\x0b x \x0b"  # \v NOT in charset


def test_malformed_html_tolerated():
    rows = parse_nodes("<html><body><p>a<div>b</p>c</div></body></html>")
    assert rows and rows[0].node_id == 0


def test_empty_input():
    assert parse_nodes("") == []
    assert parse_nodes("just text, no tags") == []


# ---------------------------------------------------------- r6 fast tokenizer


def _stdlib_rows(html: str):
    """parse_nodes with the fast tokenizer bypassed (pure stdlib path)."""
    import neuscraper_spark.html_parser as H

    p = H._TreeBuilder()
    p.feed(html)
    p.close()
    top = p.top
    root = H._first_element(top)
    if root is None:
        return []
    H._instrument(root)
    texts = {}
    H._compute_texts(root, texts)
    rows = []
    seq = 0
    walk = [root]
    while walk:
        el = walk.pop()
        if el.node_id is not None:
            is_text = el.is_instrument and (
                el.parent is None or el.parent.tag != "noscript"
            )
            rows.append((seq, el.node_id, el.tag, is_text, texts[id(el)]))
            seq += 1
        walk.extend(c for c in reversed(el.children) if isinstance(c, H._Elem))
    return rows


def _as_tuples(rows):
    return [(r.seq, r.node_id, r.tag, r.is_text, r.text) for r in rows]


def test_fast_tokenizer_equivalent_on_corpus():
    """The fast path must be byte-identical to the stdlib parse on the
    corpus generator's output (the production input distribution)."""
    from neuscraper_spark.corpus import gen_pages

    for p in gen_pages(7, 60):
        html = p["html"].decode()
        assert _as_tuples(parse_nodes(html)) == _stdlib_rows(html)


def test_fast_tokenizer_equivalent_or_bails_on_edge_cases():
    """On constructs outside the strict subset the fast path must BAIL
    (fall back to stdlib) rather than diverge; on accepted input it
    must match. Either way parse_nodes == the stdlib result."""
    cases = [
        "<html><body>a &amp; b &lt;tag&gt; &nbsp;x</body></html>",
        "<html><body>a < b and c<d</body></html>",              # literal '<'
        "<html><body><p>a<div>b</p>c</div></body></html>",      # misnesting
        "<html><body><p class='s' id=x data-a>t</p></body></html>",
        "<html><body><!-- a <p>hidden</p> --><p>x</p></body></html>",
        "<!DOCTYPE html><html><body><p>x</p></body></html>",
        "<html><body><script>if (a<b) {x();}</script><p>t</p></body></html>",
        "<html><body><script>s</SCRIPT ><p>x</p></body></html>",
        "<html><body><style>p>a{}</style><p>x</p></body></html>",
        "<html><body><p>x</p><div cla",                          # truncated
        "<html><body><p>broken <a href=\"x>y\">t</a></p></body></html>",
        "<html><body><![CDATA[z]]><p>x</p></body></html>",
        "<html><body><?pi data?><p>x</p></body></html>",
        "<html><body><br/><BR><p>UP</p></body></html>",
        "<html><body><p>tail&amp",                               # entity at EOF
        "<html><body><noscript><p>n</p></noscript></body></html>",
    ]
    for html in cases:
        assert _as_tuples(parse_nodes(html)) == _stdlib_rows(html), html


def test_fast_tokenizer_fuzz_equivalence():
    """Random mutations of corpus pages: every page parses to the same
    rows via parse_nodes (fast-or-bail) and the forced stdlib path."""
    import random

    from neuscraper_spark.corpus import gen_pages

    rng = random.Random(99)
    frags = ["<", ">", "&", "&amp;", "<!", "</", "<x", "'", '"', "/>", "<!--"]
    for p in gen_pages(3, 25):
        html = p["html"].decode()
        for _ in range(4):
            i = rng.randrange(len(html))
            mutated = html[:i] + rng.choice(frags) + html[i:]
            assert _as_tuples(parse_nodes(mutated)) == _stdlib_rows(mutated)
