"""Extra measurement harness for optimization round 6 (guide §1).

NOT the frozen bench.py: this file exists so the round's before/after
evidence can be gathered without touching the driver-timed harness.
Times each registered bench query steady-state (build once, count()
repeatedly, best-of — the same methodology bench.py uses) and captures
.explain('formatted') per query into plans/r06/.

Usage:
  python bench_extra.py [--tag before|after] [--runs 3] [name ...]
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "a1_ordered_concat", "j1_left_join", "a2_distinct_set",
    "w2_row_number", "t_tumbling_window",
    "t1_t2_temporal_joins", "t3_rollup_cascade", "d3_d4_d5_sketches",
    "q_substring_dedup", "q_cluster_assign",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--runs", type=lambda v: max(1, int(v)), default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from neuscraper_spark.queries import all_queries
    from neuscraper_spark.session import get_spark, warm_python_workers

    spark = get_spark("bench_extra")
    warm_python_workers(spark)
    qs = all_queries()
    names = args.names or BENCH_QUERIES
    times: dict[str, float] = {}
    for name in names:
        if name not in qs:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        df = qs[name](spark, SF_DIR)
        if args.tag:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{REPO}/plans/r06/{name}_{args.tag}.txt", "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(name)
        best = float("inf")
        samples = []
        for _ in range(args.runs):
            t0 = time.time()
            df.count()
            dt = time.time() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        spark.sparkContext.setJobDescription(None)
        times[name] = round(best, 3)
        print(f"{name}: best={best:.3f}s samples={samples}", file=sys.stderr)
    line = {"sf_dir": SF_DIR, "runs": args.runs, "queries": times}
    print(json.dumps(line))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(line, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
