#!/usr/bin/env python3
"""Adversarial-skew correctness axis (r13).

At 100 TB, key skew is a fact of life — one bot user, one dominant
crawl domain. The soak tier already measures skew THROUGHPUT
(HOT_USER/HOT_DOC/HOT_PHRASE axes); this axis grades skew
CORRECTNESS: with AQE's skew-join splitting and partition coalescing
re-planning around the hot keys, every query must still hash-match
the oracle — a result that depends on how a hot partition was split
is a determinism bug. Deterministic rewrites (key-modulus, no RNG):

  * events: user_id := 1 for event_id % 2 = 0 — one user owns half
    the event stream (sessions, windows, rolling aggregates, HAU all
    get a giant per-user partition);
  * documents: source := 'hotdomain' for doc_id % 10 != 0 — one
    domain owns 90% of the corpus (per-source aggregates, mixture
    rates, grouped splits all get one giant group).

Everything else copies through byte-identical. Both engines read the
same skewed parquet, so any mismatch is a real cross-engine (or
plan-dependent) divergence.

Usage: python3 tools/skewify.py <src_sf_dir> <dst_dir>
Then:  sbt "runMain graft.Verify <dst_dir> <out>" && python3 tools/check.py <dst_dir> <out>
"""
import os
import shutil
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        dp = os.path.join(dst, f"{t}.parquet")
        if t == "events":
            con.execute(f"""
                COPY (SELECT event_id, ts,
                             CASE WHEN event_id % 2 = 0 THEN 1 ELSE user_id END AS user_id,
                             event_type, value, props
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        elif t == "documents":
            con.execute(f"""
                COPY (SELECT doc_id, text, lang,
                             CASE WHEN doc_id % 10 != 0 THEN 'hotdomain' ELSE source END AS source,
                             n_chars
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        else:
            if os.path.isdir(sp):
                shutil.copytree(sp, dp, dirs_exist_ok=True)
            else:
                shutil.copy2(sp, dp)
    for t, col in [("events", "user_id"), ("documents", "source")]:
        top = con.execute(f"""
            SELECT {col}, count(*) FROM read_parquet('{os.path.join(dst, t)}.parquet')
            GROUP BY 1 ORDER BY 2 DESC LIMIT 1""").fetchone()
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{os.path.join(dst, t)}.parquet')"
        ).fetchone()[0]
        print(f"{t}.{col}: hottest key {top[0]!r} holds {top[1]}/{n} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
