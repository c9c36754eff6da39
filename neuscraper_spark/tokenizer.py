"""Deterministic hash subword tokenizer.

Stand-in for the reference's XLM-Roberta `encode_plus(max_length=50,
padding='max_length', truncation=True, add_special_tokens=True)`
(reference: src/tokenization.py:38-68) — transformers is unavailable in
this environment, so we keep the *interface contract* (BOS + piece ids +
EOS, pad id 1, fixed length 50) and replace sentencepiece with a
CRC32-hashed word/punct split. CRC32 is process- and platform-stable
(unlike Python's builtin hash), so executor count can never perturb ids.

The id conventions intentionally match XLM-R's specials so downstream
tensorization (first 4 ids + EOS=2, mask = id != 1;
src/scraper/processing.py:50-51) transfers verbatim.
"""

from __future__ import annotations

import re
import zlib
from functools import lru_cache

from .config import BOS_ID, EOS_ID, PAD_ID, PREP_MAX_TOKEN_LEN, VOCAB_SIZE

_PIECE_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
_WORD_RE = re.compile(r"\w", re.UNICODE)
_N_SPECIALS = 4  # 0=BOS 1=PAD 2=EOS 3=UNK

# Vocabulary layout: punctuation/symbol pieces hash into the low id band
# [4, PUNCT_BAND), word pieces into [PUNCT_BAND, VOCAB_SIZE). Sentencepiece
# vocabularies cluster specials/symbols at low ids too; here the split is
# load-bearing — the model's calibration prior reads symbol density
# straight off the ids (model.py:_calibration_prior), the way a trained
# embedding would encode it.
PUNCT_BAND = 64


@lru_cache(maxsize=65536)
def _piece_id(piece: str) -> int:
    if _WORD_RE.search(piece) is None:  # pure punctuation/symbol piece
        return _N_SPECIALS + zlib.crc32(piece.encode("utf-8")) % (PUNCT_BAND - _N_SPECIALS)
    return PUNCT_BAND + zlib.crc32(piece.encode("utf-8")) % (VOCAB_SIZE - PUNCT_BAND)


def tokenize(text: str, max_len: int = PREP_MAX_TOKEN_LEN) -> list[int]:
    """BOS + hashed pieces + EOS, truncated and padded to ``max_len``.

    Lazily scans only as many pieces as fit (finditer, not findall) —
    at max_len=5 the hot path reads 3 pieces of a paragraph, not all of
    them.
    """
    ids = [BOS_ID]
    budget = max_len - 2
    for m in _PIECE_RE.finditer(text):
        if budget == 0:
            break
        ids.append(_piece_id(m.group()))
        budget -= 1
    ids.append(EOS_ID)
    if len(ids) < max_len:
        ids.extend([PAD_ID] * (max_len - len(ids)))
    return ids
