"""Malformed-HTML fuzz suite (VERDICT r2 #6).

Real Common-Crawl shards are broken in every way the synthetic corpus
is not. Two layers of coverage:

1. **Pinned recovery semantics** — canonical breakage classes (unclosed
   tags, misnested inline/block, stray close tags, comments inside
   script, EOF truncation, bogus markup) each get an explicit expected
   node/text outcome, so parser behavior on broken input is a contract,
   not an accident.
2. **Seeded mutation fuzz through the FULL pipeline** — well-formed
   pages are deterministically mutated (close-tag deletion, truncation,
   tag-name corruption, stray closes, attribute garbage), then the
   distributed plans must stay byte-identical to the single-process
   oracle on every mutant (crash-free + plan-equivalence, which is what
   the first real shard will test).

Known divergences from the reference's bs4 parse (html_parser.py:23-25,
documented — the stdlib parser is the sanctioned stand-in here):

- Comments/doctypes/PIs are DROPPED; bs4 keeps Comment strings as
  wrappable NavigableStrings. A page whose visible text lives in a
  comment extracts '' here, not the comment body.
- ``<script>`` content: html.parser emits raw script text as data in
  CDATA mode including ``<!--`` comment bytes; bs4 does the same, but
  unterminated ``<script>`` at EOF swallows the page tail silently.
- Misnested inline pairs (``<b><i></b></i>``) recover by popping to the
  nearest matching open tag — same shape as html5lib's simple case, but
  no adoption-agency reparenting: the ``</i>`` after the pop is ignored
  instead of reopening ``<i>``.
"""

from __future__ import annotations

import random

import pytest

from neuscraper_spark.html_parser import parse_nodes


def _texts(html: str) -> list[str]:
    return [r.text for r in parse_nodes(html) if r.is_text and r.text.strip()]


def _flat(html: str) -> str:
    rows = parse_nodes(html)
    kept = sorted(
        (r for r in rows if r.is_text and r.text.strip()),
        key=lambda r: -r.node_id,
    )
    return "".join(r.text.strip() for r in kept)


# ------------------------------------------------ pinned recovery classes


def test_unclosed_p_tags():
    # <p> never closed: html.parser nests the second <p> inside the
    # first (no implicit-close rules) — subtree text still covers both,
    # and each bare string gets its own instrument span
    html = "<html><body><p>first para<p>second para</body></html>"
    assert _texts(html) == ["first para", "second para"]


def test_misnested_inline_block():
    # </b> pops to the matching open; the dangling </i> is ignored
    html = "<div><b>bold <i>both</b> after</i> tail</div>"
    assert _texts(html) == ["bold ", "both", " after", " tail"]


def test_stray_close_tags():
    html = "</p></div><div>real content</div></span></body>"
    assert _texts(html) == ["real content"]


def test_unclosed_everything_at_eof():
    html = "<html><body><div><ul><li>item one<li>item two"
    assert _texts(html) == ["item one", "item two"]


def test_comment_inside_script():
    # script CDATA content is data (not markup); it reaches the node
    # stream and is dropped later by the quality chain, never parsed
    html = "<body><script><!-- var x = '<div>'; --></script><p>visible</p></body>"
    texts = _texts(html)
    assert "visible" in texts
    assert not any("<div>" in t and "var" not in t for t in texts)


def test_comment_outside_script_dropped():
    # documented bs4 divergence: comments are dropped entirely
    html = "<body><!-- hidden words --><p>shown</p></body>"
    assert _texts(html) == ["shown"]


def test_attribute_garbage():
    html = '<body><div class="a" ====" data-x=\'y<z\' broken>text</div></body>'
    assert _texts(html) == ["text"]


def test_bogus_bracket_soup():
    html = "<body><p>a < b and c > d</p><p>e<f</p></body>"
    joined = "".join(_texts(html))
    assert "a " in joined and " d" in joined


def test_truncated_mid_tag():
    html = "<html><body><p>kept text</p><div cla"
    assert _texts(html) == ["kept text"]


def test_duplicate_html_body():
    html = "<html><body><p>one</p></body><body><p>two</p></body></html>"
    assert _texts(html) == ["one", "two"]


def test_void_tags_never_hold_children():
    html = "<body><br><p>after br</p><img src=x><p>after img</p></body>"
    assert _texts(html) == ["after br", "after img"]


def test_empty_and_degenerate_pages():
    assert parse_nodes("") == []
    assert parse_nodes("just bare text, no elements") == []
    assert parse_nodes("<!-- only a comment -->") == []
    assert parse_nodes("<!DOCTYPE html>") == []


def test_node_id_invariants_on_broken_pages():
    """LIFO ids stay unique and descending-id == document order among
    text nodes, no matter how broken the input."""
    pages = [
        "<div><b>x<i>y</b>z</i><p>w",
        "</div></div><table><tr><td>a<td>b</table>",
        "<ul><li>1<li>2<ol><li>3</ul><li>4",
    ]
    for html in pages:
        rows = parse_nodes(html)
        ids = [r.node_id for r in rows]
        assert len(ids) == len(set(ids))
        text_rows = [r for r in rows if r.is_text]
        by_seq = [r.text for r in sorted(text_rows, key=lambda r: r.seq)]
        by_desc_id = [r.text for r in sorted(text_rows, key=lambda r: -r.node_id)]
        assert by_seq == by_desc_id


# ------------------------------------------------ seeded mutation fuzz


def _mutate(html: str, rng: random.Random) -> str:
    ops = []
    for _ in range(rng.randint(1, 4)):
        op = rng.choice(["drop_close", "truncate", "corrupt_tag", "stray_close",
                         "attr_garbage", "dup_fragment"])
        ops.append(op)
        if op == "drop_close":
            i = html.find("</", rng.randrange(max(len(html) - 1, 1)))
            if i >= 0:
                j = html.find(">", i)
                if j > 0:
                    html = html[:i] + html[j + 1:]
        elif op == "truncate":
            html = html[: rng.randrange(len(html) // 2, len(html))]
        elif op == "corrupt_tag":
            i = html.find("<", rng.randrange(max(len(html) - 1, 1)))
            if i >= 0:
                html = html[:i] + "<zz" + html[i + 1:]
        elif op == "stray_close":
            i = rng.randrange(len(html))
            html = html[:i] + rng.choice(["</div>", "</p>", "</table>", "</b>"]) + html[i:]
        elif op == "attr_garbage":
            i = html.find("<div", rng.randrange(max(len(html) - 1, 1)))
            if i >= 0:
                html = html[: i + 4] + ' data-x="<>&;' + html[i + 4:]
        elif op == "dup_fragment":
            i = rng.randrange(len(html))
            j = min(len(html), i + rng.randrange(20, 200))
            html = html[:j] + html[i:j] + html[j:]
    return html


def _mutant_pages(n: int = 40, seed: int = 77) -> list[dict]:
    from neuscraper_spark.corpus import gen_pages

    rng = random.Random(seed)
    out = []
    for p in gen_pages(21, n):
        html = p["html"].decode("utf-8")
        out.append({"url": p["url"], "html": _mutate(html, rng).encode("utf-8")})
    return out


def test_fuzz_parser_total_and_stable():
    """Every mutant parses without raising; output is a pure function of
    the bytes (same input -> same rows)."""
    for page in _mutant_pages():
        rows1 = parse_nodes(page["html"].decode("utf-8"))
        rows2 = parse_nodes(page["html"].decode("utf-8"))
        assert [(r.node_id, r.text) for r in rows1] == [
            (r.node_id, r.text) for r in rows2
        ]


def test_fuzz_pipeline_byte_identity_vs_oracle(spark):
    """The DISTRIBUTED plans on broken pages == the single-process
    oracle, byte for byte: fused and staged extraction both survive and
    agree on every mutant."""
    from neuscraper_spark.operators.extract import extract_fused, extract_pipeline
    from neuscraper_spark.oracle import extract_pages

    pages = _mutant_pages()
    want = extract_pages(pages)
    want_map = dict(zip(want["url"], want["text"]))

    wp = spark.createDataFrame(
        [(p["url"], bytearray(p["html"])) for p in pages], "url string, html binary"
    ).repartition(8)
    got_fused = {r["url"]: r["text"] for r in extract_fused(spark, wp).collect()}
    got_staged = {
        r["url"]: r["text"] for r in extract_pipeline(spark, wp).collect()
    }
    assert got_fused == want_map
    assert got_staged == want_map


def test_trailing_text_and_entities_still_flush():
    """The truncated-tag drop must not eat legitimate buffered tails."""
    assert _texts("<body><p>x</p><div>tail text") == ["x", "tail text"]
    assert "".join(_texts("<body><p>ends with amp &")) == "ends with amp &"


def test_literal_trailing_lt_survives_eof():
    """A lone literal '<' (or '< 3'-style text) at EOF is genuine text,
    not a tag fragment — only '<'+letter / '</' / '<!' / '<?' prefixes
    are dropped by the truncation recovery."""
    assert "".join(_texts("<body><p>score was 2 <")) == "score was 2 <"
    assert "".join(_texts("<body><p>i <3 u")) == "i <3 u"
    assert "".join(_texts("<body><p>a < 3")) == "a < 3"
    # genuine tag/comment/decl fragments still dropped
    assert _texts("<html><body><p>kept</p><div cla") == ["kept"]
    assert _texts("<html><body><p>kept</p><!-- trunc") == ["kept"]
    assert _texts("<html><body><p>kept</p></bo") == ["kept"]


def test_trailing_nonascii_after_lt_is_text():
    """HTMLParser's tagfind only matches ASCII [a-zA-Z]; '<é' at EOF is
    literal text mid-stream, so the truncation recovery must flush it
    too (r4 ADVICE #3 — str.isalpha() is Unicode-wide)."""
    assert "".join(_texts("<body><p>i <é")) == "i <é"
    # parity check: the same bytes mid-stream survive as text
    assert "".join(_texts("<body><p>i <é tail</p>")) == "i <é tail"
    # genuine ASCII tag fragments are still dropped
    assert "".join(_texts("<body><p>x</p><di")) == "x"
