"""Deterministic synthetic ``web_pages`` corpus.

The input table mandated by BASELINE.json:15 —
``web_pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` — synthesized at any scale from a seed (no external
data). Two generators:

- :func:`gen_pages` — fully synthetic, seeded templates with
  nav/boilerplate/primary/table/list/noscript/script blocks, four
  languages, and a zipf-skewed host distribution (so the salted
  repartition path has real skew to chew on).
- :func:`web_pages_from_documents` — deterministically wraps the
  driver-provided ``documents`` parquet table into the same page
  template, for the driver's ``entry(spark)`` smoke path.

Everything uses ``random.Random(seed ^ page_id)`` so any row is
reproducible independently of partitioning, worker count or generation
order — a page's bytes are a pure function of (seed, page_id).
"""

from __future__ import annotations

import datetime as dt
import random

WORDS = {
    "en": (
        "the of and to in is was for that with his they at be this from have "
        "or had by word but what some we can out other were all there when up "
        "use your how said each she which their time will way about many then "
        "them write would like these her long make thing see him two has look"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach wird bei "
        "einer um am sind noch wie einem über einen so zum war haben nur oder"
    ).split(),
    "fr": (
        "le de un être et à il avoir ne je son que se qui ce dans en du elle "
        "au pour pas sur faire plus dire me on mon lui nous comme mais pouvoir "
        "avec tout y aller voir bien où sans tu ou leur homme si deux mari"
    ).split(),
    "es": (
        "el la de que y a en un ser se no haber por con su para como estar "
        "tener le lo todo pero más hacer o poder decir este ir otro ese si me "
        "ya ver porque dar cuando muy sin vez mucho saber qué sobre mi alguno"
    ).split(),
}
LANGS = tuple(WORDS)
N_HOSTS = 24
HOST_ZIPF_S = 1.4


def _host(rng: random.Random) -> str:
    # zipf-skewed host pick: host 0 carries a large share of all pages
    weights = [1.0 / (i + 1) ** HOST_ZIPF_S for i in range(N_HOSTS)]
    return f"www.site{rng.choices(range(N_HOSTS), weights=weights)[0]}.example"


def _sentence(rng: random.Random, words: list[str], lo: int, hi: int) -> str:
    n = rng.randint(lo, hi)
    toks = rng.choices(words, k=n)
    return (" ".join(toks)).capitalize() + "."


def _paragraph(rng: random.Random, words: list[str]) -> str:
    return " ".join(_sentence(rng, words, 8, 20) for _ in range(rng.randint(2, 5)))


def gen_page(seed: int, page_id: int) -> dict:
    rng = random.Random((seed << 32) ^ page_id)
    lang = rng.choices(LANGS, weights=[6, 2, 2, 2])[0]
    words = WORDS[lang]
    host = _host(rng)
    url = f"https://{host}/articles/{page_id:08d}.html"
    title = _sentence(rng, words, 3, 7)[:-1]
    heading = _sentence(rng, words, 4, 8)[:-1]
    paras = [_paragraph(rng, words) for _ in range(rng.randint(2, 8))]
    nav_items = "".join(
        f'<li><a href="/{w}">{w.capitalize()}</a></li>' for w in rng.sample(words, 4)
    )
    aside = _sentence(rng, words, 3, 6)

    extra = ""
    kind = rng.randint(0, 3)
    if kind == 0:
        items = "".join(f"<li>{_sentence(rng, words, 4, 9)}</li>" for _ in range(rng.randint(2, 5)))
        extra = f"<ol>{items}</ol>"
    elif kind == 1:
        cells = "".join(
            f"<tr><td>{_sentence(rng, words, 2, 4)}</td><td>{rng.randint(0, 999)}</td></tr>"
            for _ in range(rng.randint(2, 4))
        )
        extra = f"<table>{cells}</table>"
    elif kind == 2:
        pairs = "".join(
            f"<dt>{rng.choice(words)}</dt><dd>{_sentence(rng, words, 3, 7)}</dd>"
            for _ in range(rng.randint(2, 4))
        )
        extra = f"<dl>{pairs}</dl>"

    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)
    html = (
        "<html><head>"
        f"<title>{title}</title>"
        '<meta charset="utf-8"/>'
        "<script>var _q=[];_q.push(['track']);</script>"
        "<style>.x{display:none}</style>"
        "</head><body>\n"
        f"<nav><ul>{nav_items}</ul></nav>\n"
        f"<header><h1>{heading}</h1></header>\n"
        f"<main><article>\n{body_paras}\n{extra}\n</article></main>\n"
        f"<aside><p>{aside}</p></aside>\n"
        "<noscript>Please enable JavaScript to view this site.</noscript>\n"
        f"<footer><p>© 2024 {host}</p></footer>\n"
        "</body></html>"
    )
    text = "\n".join([title, heading] + paras)
    ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        seconds=(page_id * 37) % (365 * 86400)
    )
    return {"url": url, "warc_ts": ts, "html": html.encode("utf-8"), "text": text, "lang": lang}


def gen_pages(seed: int, n_pages: int, start: int = 0) -> list[dict]:
    return [gen_page(seed, i) for i in range(start, start + n_pages)]


# ---------------------------------------------------------------- Spark side

WEB_PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def web_pages_df(spark, seed: int, n_pages: int, partitions: int | None = None):
    """Distributed generation: page ids are parallelized and each worker
    renders its own rows — the generator itself scales like the corpus."""
    from pyspark.sql import functions as F  # noqa: N812

    import pandas as pd

    def render(batches):
        for pdf in batches:
            rows = [gen_page(seed, int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    n_part = partitions or max(spark.sparkContext.defaultParallelism, 1)
    ids = spark.range(0, n_pages, 1, n_part)
    df = ids.mapInPandas(render, schema=WEB_PAGES_DDL)
    return df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))


def _doc_page_html(doc_id: int, text: str, lang: str, source: str) -> str:
    rng = random.Random(doc_id)
    words = text.split()
    title = " ".join(words[:6]) if words else f"document {doc_id}"
    # split text into paragraph-sized runs of 40 words
    paras = [" ".join(words[i : i + 40]) for i in range(0, len(words), 40)] or [""]
    body = "\n".join(f"<p>{p}</p>" for p in paras)
    nav = "".join(f'<li><a href="/{w}">{w}</a></li>' for w in words[:3])
    return (
        f"<html><head><title>{title}</title></head><body>\n"
        f"<nav><ul>{nav}</ul></nav>\n"
        f"<main><article>\n{body}\n</article></main>\n"
        f"<footer><p>source {source} id {rng.randint(0, 9999)}</p></footer>\n"
        "</body></html>"
    )


def web_pages_from_documents(spark, sf_dir: str):
    """Wrap the driver-provided documents table into web_pages rows."""
    import pandas as pd

    def render(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                html = _doc_page_html(int(r.doc_id), r.text or "", r.lang, r.source)
                out.append(
                    {
                        "url": f"https://docs.{r.source}.example/{int(r.doc_id):08d}.html",
                        "warc_ts": dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
                        + dt.timedelta(seconds=int(r.doc_id)),
                        "html": html.encode("utf-8"),
                        "text": r.text,
                        "lang": r.lang,
                    }
                )
            yield pd.DataFrame(out)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.mapInPandas(render, schema=WEB_PAGES_DDL)
