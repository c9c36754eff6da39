"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB
at sf0.01, then compares row count, sorted-column schema, and an
order-insensitive value hash — approximating CORRECTNESS_r{N}.json so
mismatches surface before the round boundary.

Usage: python tools/check_queries.py [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    norm = df.copy()
    for c in norm.columns:
        col = norm[c]
        if col.dtype == object:
            norm[c] = col.astype(str)
        elif str(col.dtype).startswith("float"):
            norm[c] = col.round(6).map(lambda v: f"{v:.6f}")
        elif str(col.dtype).startswith("datetime"):
            norm[c] = col.astype(str)
        else:
            norm[c] = col.astype(str)
    rows = sorted("\x1f".join(r) for r in norm.astype(str).values.tolist())
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def main(names: list[str] | None = None) -> int:
    from neuscraper_spark.queries import all_oracles, all_queries
    from neuscraper_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    spark = get_spark("check_queries", master="local[8]")
    qs = all_queries()
    oracles = all_oracles()
    failures = 0
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"okro {name}: rows-only, {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} != {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(ddf.columns)}")
        elif value_hash(sdf) != value_hash(ddf):
            problems.append("value hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
            if "value hash mismatch" in problems and len(sdf) == len(ddf):
                s = sdf.reindex(sorted(sdf.columns), axis=1).sort_values(list(sorted(sdf.columns))).reset_index(drop=True)
                d = ddf.reindex(sorted(ddf.columns), axis=1).sort_values(list(sorted(ddf.columns))).reset_index(drop=True)
                neq = (s.astype(str) != d.astype(str)).any(axis=1)
                print(s[neq].head(3))
                print(d[neq].head(3))
        else:
            print(f"ok   {name}: {len(sdf)} rows")
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:] or None))
