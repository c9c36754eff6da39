"""S2 — AnnotateHtml wire-format parser round-trips + Spark zip source."""

import zipfile

import pytest

from neuscraper_spark.sources.annotate_pb import (
    ANNOTATION_TYPES,
    annotations_from_zip,
    encode_annotate_html,
    gold_from_zip,
    parse_annotate_html,
)

REC = {
    "url": "https://example.com/page?q=1",
    "urlhash": "ABCD1234",
    "language": "en",
    "topics": ["news", "tech"],
    "html": b"<html><body><p>hello</p></body></html>",
    "annotations": [(5, 1), (9, 2), (300, 6), (70000, 1)],
    "cw22id": "clueweb22-en0001-01-00001",
}


def test_roundtrip():
    got = parse_annotate_html(encode_annotate_html(REC))
    assert got == REC


def test_unknown_fields_skipped():
    # append an unknown varint field (no 15) and a fixed64 (no 16) — the
    # parser must skip both, as proto3 requires. Field 16's key
    # ((16<<3)|1 = 129) needs TWO varint bytes (0x81 0x01) — the r3
    # strict bounds check caught that this fixture originally encoded
    # it as one byte, which the lenient parser silently tolerated.
    extra = bytes([15 << 3]) + b"\x2a" + bytes([0x81, 0x01]) + b"\x00" * 8
    got = parse_annotate_html(encode_annotate_html(REC) + extra)
    assert got == REC


def test_multibyte_varints():
    rec = dict(REC, annotations=[(2**20 + 3, 6)])
    got = parse_annotate_html(encode_annotate_html(rec))
    assert got["annotations"] == [(2**20 + 3, 6)]


def test_empty_message():
    got = parse_annotate_html(b"")
    assert got["url"] == "" and got["annotations"] == []


def test_gold_from_zip_end_to_end(spark, tmp_path):
    # build a zip whose records carry REAL corpus html + annotations
    # derived from the labels machinery itself, then check the gold
    # table tags exactly the annotated node ids as Primary and feeds
    # the evaluator.
    from neuscraper_spark.corpus import gen_pages
    from neuscraper_spark.operators.labels import gold_rows_for_page

    pages = list(gen_pages(21, 4))
    zp = str(tmp_path / "vdom.zip")
    want_rows = {}
    with zipfile.ZipFile(zp, "w") as z:
        for i, p in enumerate(pages):
            html = p["html"].encode("utf-8") if isinstance(p["html"], str) else p["html"]
            rows = [r for r in gold_rows_for_page(html) if r["is_text_node"]]
            # annotate every 3rd text node as Primary
            primary = [r["node_id"] for j, r in enumerate(rows) if j % 3 == 0]
            url = f"https://gold{i}.example/page"
            want_rows[url] = {(r["node_id"], r["node_id"] in set(primary)) for r in rows}
            z.writestr(
                f"clueweb22-gold-{i:05d}.bin",
                encode_annotate_html(
                    {
                        "url": url,
                        "html": html,
                        "annotations": [(nid, 1) for nid in primary],
                        "cw22id": f"clueweb22-gold-{i:05d}",
                    }
                ),
            )
    gold = gold_from_zip(spark, zp).toPandas()
    assert set(gold["url"]) == set(want_rows)
    for url, want in want_rows.items():
        got = {
            (r["text_node_id"], r["judgment_is_primary"])
            for _, r in gold[gold.url == url].iterrows()
        }
        assert got == want, url
    assert gold["judgment_is_primary"].any()
    assert not gold["judgment_is_primary"].all()


def test_zip_source(spark, tmp_path):
    zp = str(tmp_path / "en0001-01.zip")
    with zipfile.ZipFile(zp, "w") as z:
        for i in range(5):
            rec = dict(
                REC,
                url=f"https://example.com/{i}",
                cw22id=f"clueweb22-en0001-01-{i:05d}",
                annotations=[(i + 1, 1), (i + 2, 4)],
            )
            z.writestr(f"clueweb22-en0001-01-{i:05d}.bin", encode_annotate_html(rec))
    df = annotations_from_zip(spark, zp).toPandas()
    assert len(df) == 10
    assert set(df["ann_type"]) == {"Primary", "Paragraph"}
    one = df[df["cw22id"] == "clueweb22-en0001-01-00003"]
    assert sorted(zip(one["node_id"], one["ann_type"])) == [(4, "Primary"), (5, "Paragraph")]
    assert ANNOTATION_TYPES[1] == "Primary"


def test_wire_parser_fuzz_fails_cleanly():
    """Arbitrary / truncated bytes either parse or raise ValueError —
    never IndexError, never a silently-truncated payload accepted as
    complete (truncated length-delimited fields now raise)."""
    import random

    from neuscraper_spark.sources.annotate_pb import (
        encode_annotate_html, parse_annotate_html,
    )

    rng = random.Random(7)
    good = encode_annotate_html(
        {"url": "https://x", "html": b"<html>ok</html>",
         "annotations": [(3, 1)], "cw22id": "id-1"}
    )
    for _ in range(300):
        case = rng.randrange(3)
        if case == 0:  # random garbage
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(40)))
        elif case == 1:  # truncated valid message
            data = good[: rng.randrange(len(good))]
        else:  # valid message with flipped bytes
            b = bytearray(good)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            data = bytes(b)
        try:
            parse_annotate_html(data)
        except ValueError:
            pass  # includes UnicodeDecodeError

    # the full valid message still round-trips
    rec = parse_annotate_html(good)
    assert rec["url"] == "https://x" and rec["annotations"] == [(3, 1)]
