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
