"""Trainable BPE tokenizer (bpe.py)."""

from __future__ import annotations

import pytest

from neuscraper_spark.bpe import (
    END,
    UNK_ID,
    BPETokenizer,
    train_bpe,
    words_of,
)

# Sennrich et al. 2016 §3.2 worked example
SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _tok(n_merges=10, freqs=SENNRICH):
    merges = train_bpe(freqs, n_merges)
    alphabet = {c for w in freqs for c in w}
    return BPETokenizer(merges, alphabet)


def test_sennrich_first_merges():
    merges = train_bpe(SENNRICH, 4)
    # 'es' (9: newest+widest), then 'est' (9), then 'est</w>' (9) — the
    # published sequence modulo tie order; first merge must be ('e','s')
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    # all merges involve repeating pairs only
    assert len(merges) == 4


def test_training_is_deterministic():
    assert train_bpe(SENNRICH, 8) == train_bpe(dict(reversed(list(SENNRICH.items()))), 8)


def test_merge_floor_stops_at_singletons():
    # every word unique, every pair frequency 1 -> no merges learned
    assert train_bpe({"abc": 1, "def": 1}, 10) == []


def test_encode_decode_roundtrip():
    tok = _tok(50)
    for text in ["low lower newest", "widest low", "newest newest widest"]:
        ids = tok.encode(text)
        assert tok.decode(ids) == " ".join(words_of(text))


def test_frequent_word_becomes_one_token():
    tok = _tok(50)
    # 'newest' is the most frequent word: enough merges collapse it
    assert tok.encode_pieces("newest") == ["newest" + END]
    assert tok.n_tokens("newest") == 1


def test_unknown_symbol_maps_to_unk():
    tok = _tok(5)
    ids = tok.encode("lôw")  # ô not in training alphabet
    assert UNK_ID in ids


def test_ids_disjoint_from_specials_and_stable():
    tok = _tok(8)
    assert min(tok.id_of.values()) >= 4
    # id assignment is sorted-vocab order: rebuilding gives same ids
    tok2 = BPETokenizer(tok.merges, {c for w in SENNRICH for c in w})
    assert tok.id_of == tok2.id_of


def test_serialization_roundtrip():
    tok = _tok(12)
    clone = BPETokenizer.from_dict(tok.to_dict())
    assert clone.encode("newest low") == tok.encode("newest low")
    assert clone.id_of == tok.id_of


def test_tokenize_interface_contract():
    from neuscraper_spark.config import BOS_ID, EOS_ID, PAD_ID

    tok = _tok(20)
    ids = tok.tokenize("low lower", max_len=10)
    assert len(ids) == 10
    assert ids[0] == BOS_ID
    assert EOS_ID in ids
    assert ids[-1] == PAD_ID  # padded tail
    # truncation: long text still fits max_len with EOS present
    long_ids = tok.tokenize("newest " * 50, max_len=10)
    assert len(long_ids) == 10 and long_ids[0] == BOS_ID and EOS_ID in long_ids


def test_spark_train_and_encode_match_driver(spark):
    from neuscraper_spark.bpe import encode_col, train_bpe_on

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox",
        "pack my box with five dozen jugs",
        "the lazy dog sleeps",
    ] * 5
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    tok = train_bpe_on(df, n_merges=64)
    out = encode_col(df, tok).orderBy("doc_id").collect()
    for row in out:
        want = tok.encode(row["text"])
        assert row["bpe_ids"] == want
        assert row["n_bpe_tokens"] == len(want)
    # 'the' dominates the corpus: must be a single piece
    assert tok.n_tokens("the") == 1


def test_encode_col_is_zero_shuffle_and_null_safe(spark):
    from neuscraper_spark.bpe import encode_col

    tok = _tok(10)
    df = spark.createDataFrame([(1, None), (2, "low")], "doc_id long, text string")
    stage = encode_col(df, tok)
    plan = stage._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = {r["doc_id"]: r for r in stage.collect()}
    assert rows[1]["bpe_ids"] is None and rows[1]["n_bpe_tokens"] is None
    assert rows[2]["n_bpe_tokens"] == len(tok.encode("low"))
