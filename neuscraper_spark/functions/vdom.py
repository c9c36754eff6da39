"""VDOM visual-feature parsing (ClueWeb22 layer, SURVEY.md §1.b).

The reference encodes 30 small-int visual features per node in a
compact ``<2-letter-key><int>`` attribute string and parses it with
``([a-z][a-z])(\\d+)`` finditer (reference:
src/api/AnnotateHtmlApi.py:13,84-130; zero defaults :767-801). Field
order below is the reference's VdomFeature layout, serialized as
``array<int>[30]`` (:804-837).

Two forms: a pure-python twin (oracle/tests) and a Catalyst-native
column builder (one regexp_extract per key, whole-stage codegen'd — on
well-formed strings each key token is preceded by a digit or start, so
``(^|\\d)key(\\d+)`` equals the reference's scan).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (key, field) in the reference's VdomFeature field order
VDOM_FIELDS: tuple[tuple[str, str], ...] = (
    ("px", "position_x"), ("py", "position_y"), ("pw", "position_w"), ("ph", "position_h"),
    ("ol", "offset_left"), ("ot", "offset_top"), ("ow", "offset_w"), ("oh", "offset_h"),
    ("cl", "client_left"), ("ct", "client_top"), ("cw", "client_w"), ("ch", "client_h"),
    ("ca", "font_color_a"), ("cr", "font_color_r"), ("cb", "font_color_b"), ("cg", "font_color_g"),
    ("fw", "font_weight"), ("fs", "font_size"), ("fi", "font_italic"), ("fd", "font_decoration"),
    ("lt", "list_style"), ("di", "display_style"), ("cu", "cursor_style"), ("lh", "line_height"),
    ("tt", "text_transform"), ("op", "opacity"),
    ("bl", "border_style_left"), ("bt", "border_style_top"),
    ("br", "border_style_right"), ("bb", "border_style_bottom"),
)

_TOKEN_RE = re.compile(r"([a-z][a-z])(\d+)")
_KEY_TO_FIELD = dict(VDOM_FIELDS)


def parse_vdom_py(attribute_str: str) -> dict:
    """(node_id, 30 features) — mirrors parse_node_raw_attribute."""
    out = {field: 0 for _, field in VDOM_FIELDS}
    node_id = 0
    for m in _TOKEN_RE.finditer(attribute_str or ""):
        key, value = m.group(1), int(m.group(2))
        if key == "id":
            node_id = value
        elif key in _KEY_TO_FIELD:
            out[_KEY_TO_FIELD[key]] = value
    return {"node_id": node_id, **out}


def vdom_feature_vector_py(attribute_str: str) -> list[int]:
    parsed = parse_vdom_py(attribute_str)
    return [parsed[field] for _, field in VDOM_FIELDS]


def _extract_key(col: Column, key: str) -> Column:
    got = F.regexp_extract(col, rf"(?:^|\d){key}(\d+)", 1)
    return F.when(got == "", F.lit(0)).otherwise(got.cast("int"))


def with_vdom_features(df, attr_col: str = "node_raw_feature"):
    """Adds ``node_id`` + one int column per VDOM field, all native."""
    col = F.col(attr_col)
    df = df.withColumn("node_id", _extract_key(col, "id"))
    for key, field in VDOM_FIELDS:
        df = df.withColumn(field, _extract_key(col, key))
    return df


def vdom_feature_vector(attr_col: str = "node_raw_feature") -> Column:
    """array<int>[30] column (the protobuf serialization shape)."""
    col = F.col(attr_col)
    return F.array(*[_extract_key(col, key) for key, _ in VDOM_FIELDS])
