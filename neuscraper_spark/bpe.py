"""Trainable byte-pair-encoding tokenizer (Sennrich et al. 2016).

The hash-subword tokenizer (tokenizer.py) keeps the reference's
interface contract where transformers is unavailable; this module adds
the real thing a training-data pipeline needs — a BPE vocabulary
TRAINED ON THE CORPUS, used for token budgeting (packing, mixing,
per-document token counts) and stable subword ids.

Scale shape (how GPT-2/XLM-R vocabularies are actually built):

1. ``word_counts``: ONE map-side-combined shuffle over the corpus
   (split -> explode -> groupBy(word).count). At 100 TB this is the
   x1 token-count plan — word keys, partial aggregation, no skew
   (the count cap bounds the collect, not the shuffle).
2. ``train_bpe``: the merge loop runs DRIVER-SIDE over the top-K word
   frequency table (K bounded by contract, default 2^16 rows — a few
   MB). This is not a compromise: pair statistics of the top-K words
   are the training signal every production BPE trainer uses; the
   corpus itself is never moved.
3. ``encode`` / ``encode_col``: greedy lowest-rank merges per word,
   lru-cached; the Spark stage is a zero-shuffle Arrow-batched map with
   the merge table riding the closure (broadcast-sized: vocab_size
   entries). No per-row Python round trips.

Determinism: ties in pair frequency break lexicographically, word
splitting is a fixed regex, and ids are assigned by sorted final
vocabulary — the same corpus always yields the same tokenizer, so
executor count / partitioning cannot perturb token counts anywhere
downstream (the packing/mixing invariant).
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator
from functools import lru_cache

from .config import BOS_ID, EOS_ID, PAD_ID, PREP_MAX_TOKEN_LEN

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
END = "</w>"  # end-of-word sentinel (Sennrich §3.2)
_N_SPECIALS = 4  # 0=BOS 1=PAD 2=EOS 3=UNK
UNK_ID = 3


def words_of(text: str) -> list[str]:
    return _WORD_RE.findall(text)


# --------------------------------------------------------------- training


def train_bpe(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a word -> frequency table.

    Classic algorithm: represent each word as symbols (chars + END),
    repeatedly merge the most frequent adjacent pair. Incremental pair
    counting (only words containing the merged pair are rescanned) keeps
    this O(n_merges * touched-words), fine for top-K tables. Stops early
    when no pair repeats. Ties break lexicographically — deterministic
    across runs and platforms.
    """
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (END,): f for w, f in word_freqs.items() if w
    }
    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set] = {}
    for w, f in vocab.items():
        for pair in zip(w, w[1:]):
            pair_counts[pair] += f
            where.setdefault(pair, set()).add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for pair, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or (-c, pair) < best:
                # max count; ties -> lexicographically FIRST pair (the
                # order Sennrich's worked example follows)
                best = (-c, pair)
        if best is None or -best[0] < 2:
            break  # nothing repeats: further merges are noise
        pair = best[1]
        merges.append(pair)
        joined = pair[0] + pair[1]
        for w in list(where.get(pair, ())):
            f = vocab.pop(w, None)
            if f is None:
                continue
            # un-count old pairs, apply the merge, count new pairs
            for p in zip(w, w[1:]):
                pair_counts[p] -= f
                s = where.get(p)
                if s is not None:
                    s.discard(w)
            nw = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == pair[0] and w[i + 1] == pair[1]:
                    nw.append(joined)
                    i += 2
                else:
                    nw.append(w[i])
                    i += 1
            nw = tuple(nw)
            vocab[nw] = vocab.get(nw, 0) + f
            for p in zip(nw, nw[1:]):
                pair_counts[p] += f
                where.setdefault(p, set()).add(nw)
    return merges


class BPETokenizer:
    """Frozen merge table + id assignment. Picklable by value, so Spark
    closures ship it to executors once per task set (broadcast-sized)."""

    def __init__(self, merges: list[tuple[str, str]], alphabet: set[str]):
        self.merges = list(merges)
        self.ranks = {p: i for i, p in enumerate(self.merges)}
        symbols = set(alphabet) | {END} | {a + b for a, b in self.merges}
        self.id_of = {
            s: _N_SPECIALS + i for i, s in enumerate(sorted(symbols))
        }
        self.symbol_of = {i: s for s, i in self.id_of.items()}
        # bind a per-instance word cache (an lru_cache on the method
        # would key on self and pin instances alive)
        self._encode_word = lru_cache(maxsize=65536)(self._encode_word_raw)

    # the cache wrapper isn't picklable — drop it for the closure ship
    # to executors and rebuild it (cold) on the other side
    def __getstate__(self) -> dict:
        state = dict(self.__dict__)
        state.pop("_encode_word", None)
        return state

    def __setstate__(self, state: dict) -> None:
        self.__dict__.update(state)
        self._encode_word = lru_cache(maxsize=65536)(self._encode_word_raw)

    # -- persistence -------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "merges": [list(p) for p in self.merges],
            "alphabet": sorted(
                s for s in self.id_of if len(s) == 1 and s != END
            ),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "BPETokenizer":
        return cls([tuple(p) for p in d["merges"]], set(d["alphabet"]))

    @property
    def vocab_size(self) -> int:
        return _N_SPECIALS + len(self.id_of)

    # -- encoding ----------------------------------------------------
    def _encode_word_raw(self, word: str) -> tuple[str, ...]:
        syms = list(word) + [END]
        ranks = self.ranks
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return tuple(syms)

    def encode(self, text: str) -> list[int]:
        """Subword ids (no specials); unknown symbols -> UNK_ID."""
        out = []
        get = self.id_of.get
        for w in words_of(text):
            out.extend(get(s, UNK_ID) for s in self._encode_word(w))
        return out

    def encode_pieces(self, text: str) -> list[str]:
        out = []
        for w in words_of(text):
            out.extend(self._encode_word(w))
        return out

    def decode(self, ids: list[int]) -> str:
        pieces = [self.symbol_of.get(i, "�") for i in ids]
        return "".join(pieces).replace(END, " ").rstrip()

    def n_tokens(self, text: str) -> int:
        return sum(len(self._encode_word(w)) for w in words_of(text))

    def tokenize(self, text: str, max_len: int = PREP_MAX_TOKEN_LEN) -> list[int]:
        """tokenizer.tokenize's interface contract (BOS + ids + EOS,
        PAD to max_len) over the trained vocabulary, so the downstream
        tensorization transfers verbatim."""
        ids = [BOS_ID]
        budget = max_len - 2
        for w in words_of(text):
            if budget <= 0:
                break
            for s in self._encode_word(w):
                if budget <= 0:
                    break
                ids.append(self.id_of.get(s, UNK_ID))
                budget -= 1
        ids.append(EOS_ID)
        if len(ids) < max_len:
            ids.extend([PAD_ID] * (max_len - len(ids)))
        return ids


# --------------------------------------------------------- Spark stages


def word_counts(df, text_col: str = "text", top_k: int = 1 << 16):
    """(word, n) frequency table — one map-side-combined shuffle, then
    the bounded top-K collect that feeds the driver-side merge loop."""
    from pyspark.sql import functions as F

    # (?U): Java \w is ASCII-only by default while the Python side
    # (words_of, re.UNICODE) is not — without it 'café' trains as
    # 'caf'+'é' fragments that encode() never produces (r5 review)
    return (
        df.select(
            F.explode(
                F.expr(
                    rf"regexp_extract_all({text_col}, '(?U)\\w+|[^\\w\\s]', 0)"
                )
            ).alias("word")
        )
        .groupBy("word")
        .count()
        .orderBy(F.desc("count"), "word")
        .limit(top_k)
    )


def train_bpe_on(df, text_col: str = "text", n_merges: int = 512,
                 top_k: int = 1 << 16) -> BPETokenizer:
    """Distributed counts -> driver-side merges -> frozen tokenizer."""
    rows = word_counts(df, text_col, top_k).collect()  # <= top_k rows
    freqs = {r["word"]: r["count"] for r in rows}
    alphabet = {c for w in freqs for c in w}
    return BPETokenizer(train_bpe(freqs, n_merges), alphabet)


def encode_col(df, tok: BPETokenizer, text_col: str = "text",
               out_col: str = "bpe_ids"):
    """Zero-shuffle Arrow stage: ids array + token count per row; the
    merge table rides the closure (vocab-sized, broadcast by Spark)."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql.types import (
        ArrayType, IntegerType, StructField, StructType,
    )

    fields = df.schema.fields + [
        StructField(out_col, ArrayType(IntegerType())),
        StructField("n_bpe_tokens", IntegerType()),
    ]
    schema = StructType(fields)
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col]
            ids = [
                tok.encode(t) if isinstance(t, str) else None for t in texts
            ]
            pdf = pdf[cols].copy()
            pdf[out_col] = ids
            pdf["n_bpe_tokens"] = [
                len(x) if x is not None else None for x in ids
            ]
            yield pdf

    return df.mapInPandas(run, schema=schema)
