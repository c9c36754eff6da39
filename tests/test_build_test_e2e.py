"""E2E gold chain (VERDICT r2 #9): synthetic ClueWeb22 vdom zip ->
jobs/build_test.py (gold CSV + text-node CSV + prediction TSV + metric
line) -> jobs/run_eval.py over the produced files — the full
build_test -> inference -> run_eval reference chain as two CLIs."""

import os
import re
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRIC_RE = r"Metrics for NeuScraper: Acc: ([0-9.]+) Prec: ([0-9.]+) Rec: ([0-9.]+) F1: ([0-9.]+)"


@pytest.fixture(scope="module")
def vdom_zip(tmp_path_factory):
    from neuscraper_spark.corpus import gen_pages
    from neuscraper_spark.operators.labels import gold_rows_for_page
    from neuscraper_spark.sources.annotate_pb import encode_annotate_html

    zp = str(tmp_path_factory.mktemp("vdom") / "en0001-01.zip")
    pages = list(gen_pages(33, 12))
    # one page with an INTERIOR newline + tab inside a single text node:
    # its gold/text-node CSV field must round-trip through the
    # #N#/#TAB# escaping (a multiline-quoted field would break the
    # single-line readers and desync file metrics from in-process ones)
    pages.append(
        {
            "url": "https://edge.example/multiline",
            "html": (
                "<html><body><div>first line\nsecond\tline with words "
                "enough to be a real paragraph of content here"
                "</div><div>nav</div></body></html>"
            ).encode(),
        }
    )
    with zipfile.ZipFile(zp, "w") as z:
        for i, p in enumerate(pages):
            html = p["html"] if isinstance(p["html"], bytes) else p["html"].encode()
            rows = [r for r in gold_rows_for_page(html) if r["is_text_node"]]
            primary = [r["node_id"] for r in rows if r["labels"][0]]
            z.writestr(
                f"clueweb22-e2e-{i:05d}.bin",
                encode_annotate_html(
                    {
                        "url": p["url"],
                        "html": html,
                        "annotations": [(nid, 1) for nid in primary],
                        "cw22id": f"clueweb22-e2e-{i:05d}",
                    }
                ),
            )
    return zp


def test_build_test_then_run_eval(vdom_zip, tmp_path):
    out = str(tmp_path / "eval_set")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4", "SPARK_DRIVER_MEMORY": "4g"}
    r1 = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "build_test.py"),
         "--vdom-zip", vdom_zip, "--out", out, "--eval"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r1.returncode == 0, r1.stderr[-3000:]
    m1 = re.search(METRIC_RE, r1.stdout)
    assert m1, r1.stdout[-2000:]

    for fn in ("gold.csv", "text_nodes.csv", "predictions.tsv"):
        path = os.path.join(out, fn)
        assert os.path.getsize(path) > 0, fn
    with open(os.path.join(out, "predictions.tsv")) as f:
        first = f.readline().rstrip("\n").split("\t")
    assert len(first) == 3 and first[2] == "Primary"
    # the multiline node's text must be escaped, not multiline-quoted
    with open(os.path.join(out, "text_nodes.csv")) as f:
        tn_raw = f.read()
    assert "first line#N#second#TAB#line" in tn_raw
    assert "first line\nsecond" not in tn_raw

    # the file-driven eval CLI reproduces the in-process metric line
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_eval.py"),
         "--predictions", os.path.join(out, "predictions.tsv"),
         "--text-nodes", os.path.join(out, "text_nodes.csv"),
         "--gold", os.path.join(out, "gold.csv")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    m2 = re.search(METRIC_RE, r2.stdout)
    assert m2, r2.stdout[-2000:]
    assert m1.groups() == m2.groups()
    # the synthetic annotations come from the label machinery, so the
    # pipeline must actually find primary content (sanity, not a gate)
    assert float(m1.group(3)) > 0.5
