#!/usr/bin/env python3
"""Audit every oracle's OUTPUT column types in DuckDB.

The driver's canonicalizer is stricter than tools/check.py about
integer width: a DuckDB HUGEINT (INT128) output column — produced by
sum(BIGINT), or by `//` chains over such sums — can hash differently
from Spark's BIGINT even when the values are equal.  This script runs
each oracle with `DESCRIBE` (types only, no data movement) and flags
any output column whose type is HUGEINT / UHUGEINT / DECIMAL(38,*).

Usage: python3 tools/oracle_type_audit.py <sfDir> <verifyOutDir>
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL(38")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_flag = 0
    for name in sorted(oracles):
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_flag += 1
            continue
        bad = [(c, ty) for c, ty, *_ in desc if any(b in ty for b in BAD)]
        if bad:
            print(f"FLAG {name}: {bad}")
            n_flag += 1
    print(f"\n{n_flag} flagged of {len(oracles)} oracles")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
