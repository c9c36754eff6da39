"""neuscraper_spark — a PySpark-native web-corpus curation engine.

A from-scratch rebuild of the capabilities of OpenMatch/NeuScraper
(reference at /root/reference, ACL'24 "Cleaner Pretraining Corpus
Curation with Neural Web Scraping"): parse Common-Crawl-style HTML
into ordered text-node sequences, score nodes with a transformer-style
classifier served in Arrow-vectorized UDFs, assemble primary content
per url, then chain language-ID, perplexity, heuristic quality rules
and PII/toxicity scrubbing into a keep/drop decision — all expressed
as declarative DataFrame plans so Catalyst/AQE own the physical
strategy.

Determinism note: BLAS thread counts are pinned to 1 *before* numpy is
first imported (both on the driver and inside Spark Python workers,
which import this package fresh) so float32 reduction order — and thus
scores near the 0.9 threshold — cannot vary with executor count.
"""

import os as _os

for _v in (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS",
):
    _os.environ.setdefault(_v, "1")

__version__ = "0.1.0"
