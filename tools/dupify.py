#!/usr/bin/env python3
"""Duplicate-flood correctness axis (r13).

At 100 TB, heavy duplication is the NORMAL state of a crawl corpus —
boilerplate, mirrors, templated spam. The driver testdata is almost
duplicate-free, so the dedup tiers' cap logic, the window/top-k
tie-breaks, and the survivor-selection rules have only ever been
oracle-graded on sparse-duplicate data. This axis writes a copy where
~6/7 of documents.text and ~4/5 of embeddings.embedding are exact
copies of a group anchor:

  * documents: text := text of anchor (doc_id - doc_id % 7), LEFT
    JOIN + coalesce, so a doc keeps its OWN text when the anchor id is
    absent OR the anchor's text is NULL (deterministic, no RNG — note
    the NULL case means composing this axis on top of a null-injected
    copy delivers less duplicate pressure than the headline ~6/7);
  * embeddings: embedding := embedding of anchor (vec_id - vec_id % 5),
    same fallback. label/vec_id untouched.

Everything else copies through byte-identical. Any gate mismatch on
the copy is a real cross-engine divergence — the likely classes are
incomplete tie-breaks (massive ties in every text ranking/window) and
cap-rule drift (every dedup bucket now overflows its pair cap).

Usage: python3 tools/dupify.py <src_sf_dir> <dst_dir>
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
        if t == "documents":
            con.execute(f"""
                COPY (SELECT d.doc_id, coalesce(a.text, d.text) AS text,
                             d.lang, d.source, d.n_chars
                      FROM read_parquet('{sp}') d
                      LEFT JOIN read_parquet('{sp}') a
                        ON a.doc_id = d.doc_id - d.doc_id % 7
                      ORDER BY d.doc_id) TO '{dp}' (FORMAT PARQUET)""")
        elif t == "embeddings":
            con.execute(f"""
                COPY (SELECT e.vec_id, coalesce(a.embedding, e.embedding) AS embedding,
                             e.label
                      FROM read_parquet('{sp}') e
                      LEFT JOIN read_parquet('{sp}') a
                        ON a.vec_id = e.vec_id - e.vec_id % 5
                      ORDER BY e.vec_id) TO '{dp}' (FORMAT PARQUET)""")
        else:
            if os.path.isdir(sp):
                shutil.copytree(sp, dp, dirs_exist_ok=True)
            else:
                shutil.copy2(sp, dp)
    for t, col, key in [("documents", "text", "doc_id"),
                        ("embeddings", "embedding", "vec_id")]:
        n, dis = con.execute(f"""
            SELECT count(*), count(DISTINCT {col}::VARCHAR)
            FROM read_parquet('{os.path.join(dst, t)}.parquet')""").fetchone()
        print(f"{t}: {n} rows, {dis} distinct {col} values")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
