#!/usr/bin/env python3
"""Unicode/multibyte correctness axis (r13).

The driver testdata is pure ASCII, so every text kernel's unicode
behavior (casing, code-point vs UTF-16 iteration, regex classes) was
at best spec-covered and never oracle-graded — yet a real 100 TB
corpus is full of CJK, astral-plane emoji, Greek final-sigma casing
contexts, Turkish dotted/dotless I, and combining marks. As with the
null axis, the gate compares engine-vs-engine over the SAME parquet,
so a unicode-injected copy of an sf dir is a legitimate determinism
axis: any hash mismatch is a REAL cross-engine divergence.

Divergence classes each snippet targets:
  * doc_id % 41: CJK + ideographic space (U+3000) + fullwidth forms —
    multibyte tokenization, \\s ASCII-vs-unicode regex class parity.
  * doc_id % 43: astral-plane emoji + mathematical alphanumerics —
    every char is 2 UTF-16 code units but 1 code point; catches any
    kernel iterating String chars where the oracle counts code points.
  * doc_id % 47: Greek all-caps words ending in sigma — Java
    String.toLowerCase applies SpecialCasing (context-dependent final
    sigma: ΑΣ -> ας) while DuckDB/utf8proc maps per code point
    (ΑΣ -> ασ).
  * doc_id % 59: Turkish İ (U+0130) + combining acute vs precomposed —
    Java full lowercase of İ is 2 code points (i + U+0307),
    utf8proc's simple mapping is 1. İNGEST is chosen so the
    lowered-run-vs-raw-run BPE segmentation also diverges (ingest = 2
    merge units, ngest = 3) — İSTANBUL alone passes that by
    coincidence.
  * doc_id % 61: German ß / ẞ — no simple uppercase mapping for ß,
    full mapping is SS; lowercase of ẞ differs by mapping table.
    r14: + U+A7C7/U+A7C9/U+A7F5, the ONLY code points where JDK 17 and
    DuckDB 1.0 utf8proc simple-lowercase disagree (exhaustive sweep;
    Unicode-13 additions utf8proc lacks) — UnicodeText.lowerCp pins
    identity, this grades the pin end-to-end.
  * doc_id % 67: NBSP + ideographic space INSIDE words — both Java and
    RE2 define \\s as ASCII-only, so these must NOT split tokens on
    either engine (a parity check, expected green).

r14 (VERDICT #3): the axis now reaches beyond documents.text — string
kernels also consume part.p_name (levenshtein blocking in
q_fuzzy_name_pairs / q_entity_resolution, first-token block keys,
substring_index keywords, min() collation) and events.event_type
(grouping/sort/concat keys), and none were ever graded on multibyte:
  * p_partkey % 31: APPEND 'é你' (2 code points, 5 UTF-8 bytes) to the
    row's name. Other rows keep the unmodified name, so the distinct-
    name table holds near-duplicate pairs at code-point distance 2 but
    BYTE distance 5 — inside the ≤4 match cutoff under the pinned
    code-point contract, outside it under byte semantics. A byte-based
    levenshtein on either side (DuckDB's builtin is one) flips the
    pair set and the gate goes red — this arm found the oracle's
    builtin-levenshtein byte semantics on its first run.
  * p_partkey % 37: PREPEND '你好 ' so the BLOCK key itself (first
    space-token) is multibyte — grades split/groupBy/join on
    multibyte keys.
  * event_id % 71: append '✓𝒳' (BMP + astral) to event_type — new
    groups through every per-type aggregate, sort, transition pair,
    and path concat.

Injection is deterministic (key-modulus, no RNG); snippets are
APPENDED so documents stay realistic mixed-script text. Everything
else copies through byte-identical. n_chars is left at its original
value — both engines read the same column, and no graded query
asserts n_chars == length(text).

Usage: python3 tools/unicodify.py <src_sf_dir> <dst_dir>
Then:  sbt "runMain graft.Verify <dst_dir> <out>" && python3 tools/check.py <dst_dir> <out>
"""
import os
import shutil
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SNIPPETS = [
    # r14 (ADVICE): U+000B vertical tab — Java regex \s matches it,
    # RE2/DuckDB \s does NOT; the pinned contract is RE2's class
    # (UnicodeText.WsClass), so 'a\x0Bb' is ONE token of 3 chars on
    # both engines and \x0B counts as a symbol char, never whitespace
    (73, " a\x0bb \x0b"),
    (41, " 你好　世界 日本語テスト ＦＵＬＬ"),
    (43, " \U0001f600\U0001f680\U0001f525 \U0001d54a\U0001d561\U0001d552\U0001d563\U0001d55c"),
    (47, " ΑΣ ΚΟΣΜΟΣ ΟΔΟΣ"),
    (59, " İSTANBUL İNGEST ışık café café"),
    (61, " straße STRAẞE GROSS ß ꟇꟉꟵ"),
    (67, " x y　z"),
]


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    case = "text"
    for mod, snip in SNIPPETS:
        lit = snip.replace("'", "''")
        case = f"CASE WHEN doc_id % {mod} = 0 THEN {case} || '{lit}' ELSE {case} END"
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        dp = os.path.join(dst, f"{t}.parquet")
        if t == "documents":
            con.execute(f"""
                COPY (SELECT doc_id, {case} AS text, lang, source, n_chars
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        elif t == "part":
            con.execute(f"""
                COPY (SELECT p_partkey,
                             CASE WHEN p_partkey % 31 = 0 THEN p_name || 'é你'
                                  WHEN p_partkey % 37 = 0 THEN '你好 ' || p_name
                                  ELSE p_name END AS p_name,
                             p_brand, p_type, p_size, p_retailprice
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        elif t == "events":
            con.execute(f"""
                COPY (SELECT event_id, ts, user_id,
                             CASE WHEN event_id % 71 = 0
                                  THEN event_type || '✓\U0001d4b3'
                                  ELSE event_type END AS event_type,
                             value, props
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        else:
            if os.path.isdir(sp):
                shutil.copytree(sp, dp, dirs_exist_ok=True)
            else:
                shutil.copy2(sp, dp)
    for mod, _ in SNIPPETS:
        n, hit = con.execute(f"""
            SELECT count(*), count(*) FILTER (doc_id % {mod} = 0)
            FROM read_parquet('{os.path.join(dst, "documents.parquet")}')""").fetchone()
        print(f"mod {mod}: {hit}/{n} docs injected")
    for t, c in [("part", "p_name"), ("events", "event_type")]:
        n, hit = con.execute(f"""
            SELECT count(*), count(*) FILTER (strlen({c}) <> length({c}))
            FROM read_parquet('{os.path.join(dst, t)}.parquet')""").fetchone()
        print(f"{t}.{c}: {hit}/{n} rows multibyte")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
