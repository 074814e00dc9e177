#!/usr/bin/env python3
"""Empty-corpus correctness axis (r13, the null axis's sibling).

Writes a copy of an sf dir in which every table has ZERO rows (same
schema). At 100 TB an empty source/partition/day is a routine data
condition, not an error — every query must answer (its SQL-natural
empty/zero shape), never crash on a driver-side scalar build, and
match the oracle on the same empty parquet. First run caught 13:
four driver-side crashes (require/NPE/ANSI-divide) and nine
divergences (NULL aggregate sums vs counted zeros, vacuous
certificates, Spark grouping-sets emitting no rows on empty input
where ANSI/DuckDB emit the grand-total row).

Usage: python3 tools/emptify.py <src_sf_dir> <dst_dir>
Then:  sbt "runMain graft.Verify <dst_dir> <out>" && python3 tools/check.py <dst_dir> <out>
"""
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{os.path.join(src, t)}.parquet') LIMIT 0) "
            f"TO '{os.path.join(dst, t)}.parquet' (FORMAT PARQUET)")
    print(f"empty copy of {src} written to {dst}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
