"""S2 — minimal AnnotateHtml protobuf wire-format reader (no library).

The reference ingests ClueWeb22 vdom records: zip members holding one
serialized ``AnnotateHtml`` proto3 message each
(src/build_test.py:138-147 ParseFromString; descriptor
src/api/AnnotateHtml_pb2.py:17-23). The fields the gold-label pipeline
consumes:

    1 url       string          2 urlhash   string
    3 language  string          4 topic     repeated string
    5 htmlByte  bytes           6 annotations repeated NodeAnnotation
    7 nodeRawFeature rep string 8 cw22id    string
    NodeAnnotation: 1 nodeId int32, 2 type enum(AnnotationType)

proto3 wire format is public (developers.google.com/protocol-buffers/
docs/encoding): varint keys ``(field_no << 3) | wire_type``, wire type
0 = varint, 2 = length-delimited; unknown fields are skipped. ~60 lines
of parsing replaces the protobuf dependency.
"""

from __future__ import annotations

from typing import Iterator

ANNOTATION_TYPES = ("None", "Primary", "Heading", "Title", "Paragraph", "Table", "List")


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError("truncated varint")
        b = data[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _skip(data: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(data, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        n, pos = _read_varint(data, pos)
        pos += n
    elif wire == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    return pos


def _fields(data: bytes) -> Iterator[tuple[int, int, int, int]]:
    """Yields (field_no, wire_type, value_or_start, end) per field."""
    pos = 0
    n = len(data)
    while pos < n:
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(data, pos)
            yield field, wire, val, pos
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            if pos + ln > n:
                # a silently-short data[a:b] slice would hand callers a
                # truncated payload as if it were complete
                raise ValueError("truncated length-delimited field")
            yield field, wire, pos, pos + ln
            pos += ln
        else:
            pos2 = _skip(data, pos, wire)
            if pos2 > n:
                raise ValueError("truncated fixed-width field")
            yield field, wire, pos, (pos := pos2)


def _parse_node_annotation(data: bytes) -> tuple[int, int]:
    node_id = ann_type = 0
    for field, wire, a, _ in _fields(data):
        if field == 1 and wire == 0:
            node_id = a
        elif field == 2 and wire == 0:
            ann_type = a
    return node_id, ann_type


def parse_annotate_html(data: bytes) -> dict:
    """One serialized AnnotateHtml message -> plain dict."""
    out = {
        "url": "", "urlhash": "", "language": "", "topics": [],
        "html": b"", "annotations": [], "cw22id": "",
    }
    for field, wire, a, b in _fields(data):
        if wire != 2:
            continue
        chunk = data[a:b]
        if field == 1:
            out["url"] = chunk.decode("utf-8")
        elif field == 2:
            out["urlhash"] = chunk.decode("utf-8")
        elif field == 3:
            out["language"] = chunk.decode("utf-8")
        elif field == 4:
            out["topics"].append(chunk.decode("utf-8"))
        elif field == 5:
            out["html"] = chunk
        elif field == 6:
            out["annotations"].append(_parse_node_annotation(chunk))
        elif field == 8:
            out["cw22id"] = chunk.decode("utf-8")
    return out


# ----------------------------------------------------------- test encoder


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def encode_annotate_html(rec: dict) -> bytes:
    """Synthetic-fixture encoder (round-trip tests; proto3-compatible)."""
    out = bytearray()
    if rec.get("url"):
        out += _ld(1, rec["url"].encode("utf-8"))
    if rec.get("urlhash"):
        out += _ld(2, rec["urlhash"].encode("utf-8"))
    if rec.get("language"):
        out += _ld(3, rec["language"].encode("utf-8"))
    for t in rec.get("topics", []):
        out += _ld(4, t.encode("utf-8"))
    if rec.get("html"):
        out += _ld(5, rec["html"])
    for node_id, ann_type in rec.get("annotations", []):
        body = _varint(1 << 3) + _varint(node_id) + _varint((2 << 3)) + _varint(ann_type)
        out += _ld(6, body)
    if rec.get("cw22id"):
        out += _ld(8, rec["cw22id"].encode("utf-8"))
    return bytes(out)


# ---------------------------------------------------- gold-label ingestion


def gold_from_zip(spark, zip_path: str):
    """ClueWeb22 vdom zip -> the reference's GoldLabels shape
    (url, text_node_id, text, judgment_is_primary).

    Mirrors src/build_test.py:148-176: parse the record's htmlByte into
    text-node rows (the repo's labels machinery), tag each node Primary
    iff its node id appears in the record's Primary annotations
    (annotation_to_nodeids[1]). Output feeds operators/evaluate.py
    directly."""
    import zipfile

    import pandas as pd

    with zipfile.ZipFile(zip_path) as z:
        names = sorted(z.namelist())
    names_df = spark.createDataFrame(
        pd.DataFrame({"member": names})
    ).repartition(max(1, min(len(names), 64)))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from ..operators.labels import gold_rows_for_page

        with zipfile.ZipFile(zip_path) as z:
            for pdf in batches:
                rows = []
                for member in pdf["member"]:
                    rec = parse_annotate_html(z.read(member))
                    if not rec["html"]:
                        continue
                    primary_ids = {nid for nid, t in rec["annotations"] if t == 1}
                    for r in gold_rows_for_page(rec["html"]):
                        if r["is_text_node"]:
                            rows.append(
                                {
                                    "url": rec["url"],
                                    "text_node_id": r["node_id"],
                                    "text": r["text"],
                                    "judgment_is_primary": r["node_id"] in primary_ids,
                                }
                            )
                yield pd.DataFrame(
                    rows,
                    columns=["url", "text_node_id", "text", "judgment_is_primary"],
                )

    return names_df.mapInPandas(
        run,
        schema=(
            "url string, text_node_id int, text string, "
            "judgment_is_primary boolean"
        ),
    )


# ------------------------------------------------------------ Spark source


def annotations_from_zip(spark, zip_path: str):
    """ClueWeb22 vdom zip -> (cw22id, url, language, node_id, ann_type)
    rows, one task per slice of members (the reference's Pool(64) over
    z.namelist(), build_test.py:182-199). Executors open the zip locally
    — the same shared-filesystem assumption the reference makes."""
    import zipfile

    import pandas as pd

    with zipfile.ZipFile(zip_path) as z:
        names = sorted(z.namelist())
    names_df = spark.createDataFrame(
        pd.DataFrame({"member": names})
    ).repartition(max(1, min(len(names), 64)))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        with zipfile.ZipFile(zip_path) as z:
            for pdf in batches:
                rows = []
                for member in pdf["member"]:
                    rec = parse_annotate_html(z.read(member))
                    cw22id = member[:-4] if member.endswith(".bin") else member
                    for node_id, ann_type in rec["annotations"]:
                        rows.append(
                            {
                                "cw22id": rec["cw22id"] or cw22id,
                                "url": rec["url"],
                                "language": rec["language"],
                                "node_id": node_id,
                                "ann_type": ANNOTATION_TYPES[ann_type]
                                if ann_type < len(ANNOTATION_TYPES)
                                else str(ann_type),
                            }
                        )
                yield pd.DataFrame(
                    rows, columns=["cw22id", "url", "language", "node_id", "ann_type"]
                )

    return names_df.mapInPandas(
        run,
        schema="cw22id string, url string, language string, node_id int, ann_type string",
    )


def pages_from_zip(spark, zip_path: str):
    """ClueWeb22 vdom zip -> (url, html) page rows — the input shape of
    the extraction pipeline, so a zip can be scored and evaluated against
    its own embedded annotations (jobs/build_test.py)."""
    import zipfile

    import pandas as pd

    with zipfile.ZipFile(zip_path) as z:
        names = sorted(z.namelist())
    names_df = spark.createDataFrame(
        pd.DataFrame({"member": names})
    ).repartition(max(1, min(len(names), 64)))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        with zipfile.ZipFile(zip_path) as z:
            for pdf in batches:
                rows = []
                for member in pdf["member"]:
                    rec = parse_annotate_html(z.read(member))
                    if rec["html"]:
                        rows.append({"url": rec["url"], "html": rec["html"]})
                yield pd.DataFrame(rows, columns=["url", "html"])

    return names_df.mapInPandas(run, schema="url string, html binary")
