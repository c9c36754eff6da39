"""Hypothesis property tests for the leaf functions (SURVEY.md §5.3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from neuscraper_spark.config import PREP_MAX_TOKEN_LEN, STRIP_CHARS
from neuscraper_spark.functions.text import strip_ws_py, unescape_gold_py
from neuscraper_spark.html_parser import parse_nodes
from neuscraper_spark.model import tensorize_chunk
from neuscraper_spark.operators.quality import heuristics_py, langid_scores_py, pii_scrub_py, ppl_py
from neuscraper_spark.tokenizer import tokenize

text_st = st.text(max_size=300)


@given(text_st)
def test_strip_ws_matches_python_strip(s):
    assert strip_ws_py(s) == s.strip(STRIP_CHARS)


@given(text_st)
def test_strip_ws_idempotent(s):
    once = strip_ws_py(s)
    assert strip_ws_py(once) == once


@given(text_st)
def test_tokenize_shape_and_structure(s):
    ids = tokenize(s)
    assert len(ids) == PREP_MAX_TOKEN_LEN
    assert ids[0] == 0  # BOS
    assert 2 in ids  # EOS somewhere
    assert all(0 <= i < 8192 for i in ids)


@given(text_st)
def test_tokenize_short_equals_truncated_long(s):
    full = tensorize_chunk([tokenize(s, 50)])
    short = tensorize_chunk([tokenize(s, 5)])
    assert np.array_equal(full[0], short[0])
    assert np.array_equal(full[1], short[1])


@given(text_st)
def test_unescape_stable(s):
    # unescaping twice == once when no re-composable tokens remain
    once = unescape_gold_py(s)
    if "#" not in once:
        assert unescape_gold_py(once) == once


@settings(max_examples=50, deadline=2000)
@given(st.text(max_size=500))
def test_parser_never_crashes(s):
    rows = parse_nodes(s)
    ids = [r.node_id for r in rows]
    assert len(ids) == len(set(ids))  # ids unique
    if rows:
        assert rows[0].node_id == 0  # root always id 0


@settings(max_examples=50, deadline=2000)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400))
def test_quality_twins_never_crash(s):
    lang, conf = langid_scores_py(s)
    assert isinstance(lang, str) and 0.0 <= conf <= 1.0
    assert ppl_py(s) > 0
    h = heuristics_py(s)
    assert isinstance(h["quality_pass"], bool)
    p = pii_scrub_py(s)
    assert isinstance(p["scrubbed_text"], str)


@given(st.lists(st.integers(0, 8191), min_size=0, max_size=60))
def test_tensorize_arbitrary_token_rows(ids):
    padded = (ids + [1] * 50)[:50]
    t_ids, masks = tensorize_chunk([padded])
    assert t_ids.shape == (384, 5)
    assert t_ids[0, 4] == 2  # EOS appended
    assert not masks[1:].any()
