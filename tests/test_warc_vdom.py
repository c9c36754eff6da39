"""WARC source + VDOM feature parser parity."""

import pandas as pd
import pytest

from neuscraper_spark.functions.vdom import (
    VDOM_FIELDS,
    parse_vdom_py,
    vdom_feature_vector,
    vdom_feature_vector_py,
    with_vdom_features,
)
from neuscraper_spark.sources.warc import build_warc_bytes, parse_warc_bytes, read_warc_responses


RECORDS = [
    ("https://a.example/1", "2024-01-01T00:00:00Z", b"<html><body><p>Alpha page</p></body></html>"),
    ("https://b.example/2", "2024-01-02T12:30:00Z", b"<html><body><p>Beta page</p></body></html>"),
]


def test_parse_warc_bytes_plain_and_gzip():
    for compress in (False, True):
        data = build_warc_bytes(RECORDS, compress=compress)
        rows = parse_warc_bytes(data, "x.warc.gz" if compress else "x.warc")
        assert [r["url"] for r in rows] == [u for u, _, _ in RECORDS]
        assert rows[0]["html"] == RECORDS[0][2]  # HTTP head stripped exactly


def test_non_response_records_filtered():
    data = build_warc_bytes(RECORDS)
    req = data.replace(b"WARC-Type: response", b"WARC-Type: request", 1)
    rows = parse_warc_bytes(req, "x.warc")
    assert len(rows) == 1  # F1: only responses survive


def test_warc_to_pipeline(spark, tmp_path):
    p = tmp_path / "sample.warc.gz"
    p.write_bytes(build_warc_bytes(RECORDS, compress=True))
    df = read_warc_responses(spark, str(p))
    pdf = df.toPandas().sort_values("url").reset_index(drop=True)
    assert list(pdf["url"]) == [u for u, _, _ in RECORDS]
    assert str(pdf["warc_ts"].iloc[0]).startswith("2024-01-01")
    # and it feeds the extractor end-to-end
    from neuscraper_spark.operators.extract import extract_pipeline

    out = extract_pipeline(spark, df).toPandas()
    assert set(out["url"]) <= {u for u, _, _ in RECORDS}


VDOM_SAMPLES = [
    "id5px100py20pw300ph40fs14fw700ca255cr10cg20cb30",
    "id0",
    "",
    "px1ol2ot3ow4oh5cl6ct7cw8ch9lt1di2cu3lh4tt5op90bl1bt2br3bb4fi1fd2",
]


def test_vdom_python_twin_defaults_and_values():
    p = parse_vdom_py(VDOM_SAMPLES[0])
    assert p["node_id"] == 5 and p["position_x"] == 100 and p["font_size"] == 14
    assert p["opacity"] == 0  # default
    assert len(vdom_feature_vector_py("")) == 30
    assert vdom_feature_vector_py("") == [0] * 30


def test_vdom_native_matches_python(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"node_raw_feature": VDOM_SAMPLES})
    )
    got = with_vdom_features(df).withColumn(
        "vec", vdom_feature_vector()
    ).toPandas()
    for i, attr in enumerate(VDOM_SAMPLES):
        want = parse_vdom_py(attr)
        row = got.iloc[i]
        assert row["node_id"] == want["node_id"], attr
        for _, field in VDOM_FIELDS:
            assert row[field] == want[field], (attr, field)
        assert list(row["vec"]) == vdom_feature_vector_py(attr)


def test_warc_malformed_records_fail_soft():
    """Damaged records resync instead of killing the task; a negative
    Content-Length must not loop forever or raise."""
    from neuscraper_spark.sources.warc import (
        build_warc_bytes, parse_warc_bytes, _gunzip_members,
    )

    good = build_warc_bytes(
        [("https://a", "2024-01-01T00:00:00Z", b"<html>a</html>"),
         ("https://b", "2024-01-01T00:00:00Z", b"<html>b</html>")]
    )
    # non-numeric Content-Length in an injected record between the two
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad\r\nContent-Length: oops\r\n\r\n"
        b"garbage body with no length"
    )
    half = good.find(b"WARC/", 5)  # start of record 2
    rows = parse_warc_bytes(good[:half] + bad + good[half:])
    assert [r["url"] for r in rows] == ["https://a", "https://b"]

    # negative length: resync, terminate
    neg = bad.replace(b"oops", b"-7")
    rows = parse_warc_bytes(good[:half] + neg + good[half:])
    assert [r["url"] for r in rows] == ["https://a", "https://b"]

    # truncated trailing record: keeps the complete ones
    rows = parse_warc_bytes(good[: len(good) - 10])
    assert rows[0]["url"] == "https://a"

    # corrupt gzip member: earlier members still decode
    gz = build_warc_bytes(
        [("https://a", "2024-01-01T00:00:00Z", b"<html>a</html>")],
        compress=True,
    )
    rows = parse_warc_bytes(gz + b"\x1f\x8b\x08CORRUPT", path="x.warc.gz")
    assert [r["url"] for r in rows] == ["https://a"]
    assert _gunzip_members(b"\x1f\x8bnot-a-real-member") == b""


def test_gunzip_resync_recovers_tail():
    """A corrupt gzip member in the MIDDLE of a shard drops only itself:
    _gunzip_members resyncs on the next gzip magic and the valid tail
    still decodes (one bad member must not lose the rest of the shard)."""
    from neuscraper_spark.sources.warc import _gunzip_members, build_warc_bytes, parse_warc_bytes

    a = build_warc_bytes(
        [("https://a", "2024-01-01T00:00:00Z", b"<html>a</html>")], compress=True
    )
    b = build_warc_bytes(
        [("https://b", "2024-01-01T00:00:01Z", b"<html>b</html>")], compress=True
    )
    # corrupt member between two good ones (valid magic, garbage body)
    shard = a + b"\x1f\x8b\x08CORRUPT-MEMBER" + b
    rows = parse_warc_bytes(shard, path="x.warc.gz")
    assert [r["url"] for r in rows] == ["https://a", "https://b"]
    # and plain payload check: both members' bytes present
    out = _gunzip_members(shard)
    assert b"https://a" in out and b"https://b" in out
