"""C6 separator calculus + separator-aware assembly."""

import pandas as pd
import pytest

from neuscraper_spark.operators import separators as S


def _graph(html):
    nodes, title = S.build_graph(html)
    by_text = {}
    for g in nodes:
        if g.is_textnode:
            by_text[g.text.strip()] = g
    return nodes, title, by_text


def test_block_boundary_gets_newline():
    html = "<html><body><p>first</p><p>second</p></body></html>"
    _, _, by = _graph(html)
    assert S.get_text_separator(by["first"], by["second"]) == "\n"


def test_br_between_gets_newline():
    html = "<html><body><p><b>a</b><br/><b>b</b></p></body></html>"
    _, _, by = _graph(html)
    assert S.get_text_separator(by["a"], by["b"]) == "\n"


def test_inline_same_block_no_separator():
    html = "<html><body><p><b>bold</b><i>italic</i></p></body></html>"
    _, _, by = _graph(html)
    # both invisible (zero vdom), same block, inline, no margins -> ''
    assert S.get_text_separator(by["bold"], by["italic"]) == ""


def test_script_is_inline_element():
    # C6 parity: the reference's INLINE_ELEMENT includes "script"
    # (AnnotateHtmlApi.py:15) — a <script> between text nodes must take
    # the inline branch of the separator calculus, not the block branch.
    assert "script" in S.INLINE_ELEMENT
    html = '<html><body><p><b>a</b><script src="x.js"></script><b>b</b></p></body></html>'
    _, _, by = _graph(html)
    assert S.get_text_separator(by["a"], by["b"]) == ""


def test_trailing_space_gives_space():
    html = "<html><body><p><b>bold </b><i>italic</i></p></body></html>"
    _, _, by = _graph(html)
    assert S.get_text_separator(by["bold"], by["italic"]) == " "


def test_punctuation_suppresses_separator():
    html = "<html><body><p><b>end</b><em>. next</em></p></body></html>"
    _, _, by = _graph(html)
    # curr starts with punctuation+space -> '' (rule :707-723)
    assert S.get_text_separator(by["end"], by[". next"]) == ""


def test_visibility_boundary():
    html = "<html><body><p><b>a</b><i>b</i></p></body></html>"
    nodes, _, by = _graph(html)
    by["a"].vdom = S.Vdom(position_w=100, position_h=20, opacity=100)
    assert S.is_node_visible(by["a"]) and not S.is_node_visible(by["b"])
    assert S.get_text_separator(by["a"], by["b"]) == "\n"


def test_get_content_for_nodes_assembly():
    html = (
        "<html><head><title>T</title></head><body>"
        "<p>alpha</p><p>beta</p></body></html>"
    )
    nodes, _, by = _graph(html)
    ids = sorted(
        [by["alpha"].node_id, by["beta"].node_id], reverse=True
    )  # descending = document order
    text, offsets = S.get_content_for_nodes(html, ids, add_html_title=True)
    assert text == "T\nalpha\nbeta"
    for nid, (s, e) in offsets.items():
        assert text[s:e] in ("T", "alpha", "beta")


def test_primary_content_operator(spark, pages):
    pdf = pd.DataFrame(pages[:6])
    wp = spark.createDataFrame(pdf[["url", "html"]])
    out = S.primary_content(wp).toPandas()
    assert len(out) == 6
    # separator-aware: newlines between blocks, unlike the ''-join path
    assert all("\n" in t for t in out["text"])
    # title first (add_html_title), then primary blocks
    first = out.sort_values("url").iloc[0]
    page = next(p for p in pages if p["url"] == first["url"])
    title = page["html"].decode().split("<title>")[1].split("</title>")[0]
    assert first["text"].startswith(title)
