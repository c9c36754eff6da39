"""Takedown / right-to-be-forgotten maintenance job.

    spark-submit --py-files neuscraper_spark.zip jobs/erase.py \
        --table /path/curated_table --where "pii_count > 0" \
        [--key-col url] [--materialize]

Phase 1 (always): write a delete file — instant, no data rewritten;
every read of the table hides the matching rows from then on. Two
flavors:
  default (equality, --key-col): a TAKEDOWN — the key stays hidden
  even if a later re-crawl appends it again;
  --positions: pin exactly the rows matching NOW by (file, row-index)
  address — later appends of the same content are unaffected (fix a
  bad batch without embargoing its keys).
Phase 2 (--materialize): rewrite every partition with the deletes
applied and retire the delete files — the rows are gone from storage,
completing the erasure (run it in the maintenance window; it is the
expensive full-table pass). Required eventually for --positions:
compaction refuses to rewrite files while position deletes are
pending.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="TableWriter root")
    ap.add_argument("--where", required=True,
                    help="SQL predicate selecting rows to erase")
    ap.add_argument("--key-col", default="url",
                    help="equality-delete key column")
    ap.add_argument("--positions", action="store_true",
                    help="position delete (exact rows, no re-ingest "
                    "embargo) instead of an equality takedown")
    ap.add_argument("--partition-col", default="host_bucket")
    ap.add_argument("--materialize", action="store_true",
                    help="also rewrite partitions and retire the delete "
                    "files (storage-level erasure)")
    args = ap.parse_args()

    from neuscraper_spark.session import get_spark
    from neuscraper_spark.sources.writer import TableWriter

    spark = get_spark("neuscraper_erase")
    w = TableWriter(args.table, partition_col=args.partition_col)
    if args.positions:
        snap = w.delete_positions(spark, args.where)
        print(f"delete {snap['delete']['name']}: {snap['delete']['n_keys']} "
              "row addresses hidden from all reads")
    else:
        snap = w.delete_where(spark, args.where, key_col=args.key_col)
        print(f"delete {snap['delete']['name']}: {snap['delete']['n_keys']} "
              f"keys ({args.key_col}) hidden from all reads")
    if args.materialize:
        res = w.compact(spark, apply_deletes=True)
        print(f"materialized: {res.get('materialized_deletes', [])} across "
              f"{len(res['compaction'])} partitions — rows erased from storage")
    spark.stop()


if __name__ == "__main__":
    main()
