"""Paired A/B benchmark of extract_curate_fused between two checkouts.

The host shows external load bursts (other tenants, invisible from
inside the container) that swing 32-wide measurements by ±40%, so
single numbers cannot attribute a throughput delta to code. This
harness alternates child probes A,B,A,B,... in time (each pair shares a
noise window), gates each child on 1-min loadavg, and reports per-round
pairs plus the median of the paired ratios — the statistic that
survives window drift.

Two essentials found the hard way (see BENCH/BASELINE.md):
- PYTHONPATH must point at the checkout under test: python workers
  resolve `neuscraper_spark` via their own sys.path, not the driver's,
  and cloudpickle pickles module-level functions BY REFERENCE — without
  this, both sides silently run the same worker code.
- Steady-state: each child builds the plan once and re-executes
  (best-of-k), so Catalyst/codegen/JIT serial costs are not measured.

Usage:
  python tools/ab_fused.py <repoA> <repoB> [master] [cores] [rounds] [runs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

PROBE = r"""
import json, sys, time
repo, master, runs, out, corpus = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5]
sys.path.insert(0, repo)
from neuscraper_spark.session import get_spark
try:
    from neuscraper_spark.session import warm_python_workers
except ImportError:
    warm_python_workers = None
from neuscraper_spark.operators.extract import extract_curate_fused
spark = get_spark("ab_probe", master=master)
wp = spark.read.parquet(corpus)
n_pages = wp.count()
if warm_python_workers:
    warm_python_workers(spark)
fused = extract_curate_fused(spark, wp).filter("keep")
samples = []
for _ in range(runs):
    t0 = time.time(); fused.count(); samples.append(round(time.time() - t0, 3))
best = min(samples)
json.dump({"master": master, "samples": samples, "best_sec": best,
           "docs_per_sec": round(n_pages / best, 2)}, open(out, "w"))
spark.stop()
"""


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def wait_quiet(thresh: float = 3.0, max_wait: float = 180.0) -> float:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        la = loadavg()
        if la < thresh:
            return la
        time.sleep(10)
    return loadavg()


def main() -> None:
    repoA, repoB = os.path.abspath(sys.argv[1]), os.path.abspath(sys.argv[2])
    master = sys.argv[3] if len(sys.argv) > 3 else "local[32]"
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    runs = int(sys.argv[6]) if len(sys.argv) > 6 else 3
    corpus = os.environ.get(
        "AB_CORPUS", "/tmp/neuscraper_bench/web_pages_seed42_n32000.parquet"
    )
    tmp = tempfile.mkdtemp(prefix="ab_fused_")
    probe_py = os.path.join(tmp, "probe.py")
    with open(probe_py, "w") as f:
        f.write(PROBE)

    def probe(repo: str, tag: str, i: int) -> dict:
        out = os.path.join(tmp, f"{tag}_{i}.json")
        la = wait_quiet()
        cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, probe_py,
               repo, master, str(runs), out, corpus]
        env = {**os.environ, "PYTHONPATH": repo}
        subprocess.run(cmd, check=True, cwd=tmp, env=env,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open(out) as f:
            res = json.load(f)
        res["loadavg_pre"] = la
        return res

    A, B = [], []
    for i in range(rounds):
        order = [("A", repoA), ("B", repoB)] if i % 2 == 0 else [("B", repoB), ("A", repoA)]
        got = {}
        for tag, repo in order:
            got[tag] = probe(repo, tag, i)
        A.append(got["A"])
        B.append(got["B"])
        print(json.dumps({
            "round": i, "A": got["A"]["docs_per_sec"], "B": got["B"]["docs_per_sec"],
            "ratio_B_over_A": round(got["B"]["docs_per_sec"] / got["A"]["docs_per_sec"], 3),
            "loadavg": [got["A"]["loadavg_pre"], got["B"]["loadavg_pre"]],
        }), flush=True)

    ra = [x["docs_per_sec"] for x in A]
    rb = [x["docs_per_sec"] for x in B]
    print(json.dumps({
        "A_median": round(statistics.median(ra), 2),
        "B_median": round(statistics.median(rb), 2),
        "A_best": max(ra), "B_best": max(rb),
        "paired_ratio_median": round(
            statistics.median(b / a for a, b in zip(ra, rb)), 3),
        "A_samples": ra, "B_samples": rb,
    }), flush=True)


if __name__ == "__main__":
    main()
