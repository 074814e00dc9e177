#!/usr/bin/env python3
"""Null-injection correctness axis (r13).

The driver testdata carries ZERO nulls in the hot columns, so every
query's null behavior was spec-covered at best and never oracle-graded.
But the gate's comparison is engine-vs-engine over the SAME parquet —
so a null-injected copy of an sf dir is a legitimate new determinism
axis: Spark and DuckDB both read the injected files, and any hash
mismatch is a REAL cross-engine divergence (the NaN-ordering class's
sibling: SQL three-valued logic vs Scala-kernel null handling).

Injection is DETERMINISTIC (key-modulus, no RNG): documents.text NULL
for doc_id % 53 == 0; events.value NULL for event_id % 47 == 0;
events.event_type NULL for event_id % 59 == 0; events.user_id NULL
for event_id % 61 == 0 (r13b — the per-user battery: sessions,
rolling windows, paths, HAU, stickiness had never been graded with
null users; all moduli co-prime so the combinations occur).
r14: additionally user_id NULL for EVERY event in the corpus's first
hour — a modulus can never construct a group whose every member is
null, and that is exactly the shape that makes distinct-count
denominators zero (q_events_hau_approx's within_bound 0/0 — the r13
VERDICT #2 class). The sibling all-null MONTH (q_events_stickiness's
mau=0) cannot be injected here — the driver corpus spans exactly one
month at every SF, so the arm would null the entire column; that
contract is pinned by WindowOpsSpec's two-month fixture instead.

r14b: events.props DIRTY-JSON arms — the schema-on-read column had
never been graded on anything but clean '{"k": N}' payloads, and the
engines' native paths disagree on every dirty form (DuckDB ->>
ERRORS on malformed JSON, Spark ANSI CAST throws on non-numeric,
DuckDB TRY_CAST('3.7') ROUNDS where Spark try_cast is NULL):
  %37 -> '{broken'            (malformed: lenient NULL, never an error)
  %43 -> NULL                 (null propagates)
  %53 -> '{"k": "37"}'        (string-typed int: parses on both)
  %29 -> '{"k": 3.7}'         (float: NULL on both -- never rounded)
  %31 -> '{"k": " 42 "}'      (padded string: Spark trimAll semantics)
  %23 -> '{"k": 99999999999}' (int32 overflow: NULL on both)

r14c: events.value NaN/±Inf arms (%41 NaN, %67 +inf, %73 -inf) — the
READ-boundary contract (Tables.events): garbage floats ≡ NULL value,
inheriting the pinned null-value semantics (count-not-sum) instead of
crashing ANSI decimal casts / the rolling kernel's BigDecimal decode
or silently rotating ntile orderings; the 8 value-reading oracles
mirror via Tables.eventsValueSanCte.

r14e: events.ts NULL for event_id %83 — the READ-boundary contract
(Tables.events) DROPS timeless events: an event without a time cannot
enter event-time analysis, and keeping it would force a null-placement
pin into every per-user window on both engines (Spark ASC NULLS FIRST
vs DuckDB NULLS LAST). Every events-reading oracle consumes the same
boundary through the shadow CTE SparkEntry applies centrally.

r14f: money/measure arms — the TPC-H-shape DOUBLE columns had never
been injected, and a NaN there crashes every ANSI decimal cast:
lineitem l_quantity NaN (l_orderkey %101), l_extendedprice +inf
(%103); orders o_totalprice NaN (o_orderkey %107); part p_retailprice
-inf (p_partkey %43); customer c_acctbal NaN (c_custkey %29);
supplier s_acctbal +inf (s_suppkey %13). The read boundary
(Tables.measureCols) pins garbage floats to NULL, mirrored per table
by the central shadow CTEs.

r15b: DATE arms — the last never-dirtied surface (r14 VERDICT #6).
lineitem l_shipdate: NULL (l_orderkey %109), far-future
'9999-12-31 23:59:59.999999' (%127), proleptic deep past '0001-01-01'
(%131); orders o_orderdate: NULL (o_orderkey %113), epoch zero
'1970-01-01' (%137). CONTRACT: dates are NOT sanitized at the read
boundary — unlike measures, a row with an unknown date still carries
valid quantities for every non-temporal aggregate, so dropping or
nulling would corrupt q1-class sums; NULL dates ride ordinary SQL
three-valued semantics (filters drop them, groupBy forms a NULL
group identically on both engines) and extreme epochs are legal
instants under proleptic-Gregorian micros on both engines. Any
divergence the arms surface is pinned per-query, not boundary-wide.

r15a: embeddings ±Inf-component arms — vec_id %101 gets a +Inf third
component, %103 a -Inf seventh. The one non-finite input the r14
NaN/zero guards never reached: an Inf component drives nsq to +Inf,
which PASSED guardedSim's isnan/zero check, and the resulting raw-NaN
quotient sorts FIRST under Spark's desc while the oracle's
isnan(...)→NULL ranks it LAST (r14 VERDICT #3). guardedSim now pins
nsq = +Inf to NULL too.

r14d: embeddings arms — vec_id %89 gets a NaN first component, %97
becomes the all-zero vector. The NaN-cosine / zero-norm guards
(NOT-isnan pair filters, the NaN-ranks-first assignment contract,
signBucket's NaN>0=false plane) were fixture-pinned since r11 but
never corpus-graded through the whole semantic/ANN battery at once.
Everything else copies through byte-identical.

Usage: python3 tools/nullify.py <src_sf_dir> <dst_dir>
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
                COPY (SELECT doc_id,
                             CASE WHEN doc_id % 53 = 0 THEN NULL ELSE text END AS text,
                             lang, source, n_chars
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        elif t == "events":
            con.execute(f"""
                COPY (SELECT event_id,
                             CASE WHEN event_id % 83 = 0 THEN NULL ELSE ts END AS ts,
                             CASE WHEN event_id % 61 = 0
                                    OR date_trunc('hour', ts) =
                                       (SELECT min(date_trunc('hour', ts)) FROM read_parquet('{sp}'))
                                  THEN NULL ELSE user_id END AS user_id,
                             CASE WHEN event_id % 59 = 0 THEN NULL ELSE event_type END AS event_type,
                             CASE WHEN event_id % 47 = 0 THEN NULL
                                  WHEN event_id % 41 = 0 THEN CAST('nan' AS DOUBLE)
                                  WHEN event_id % 67 = 0 THEN CAST('inf' AS DOUBLE)
                                  WHEN event_id % 73 = 0 THEN CAST('-inf' AS DOUBLE)
                                  ELSE value END AS value,
                             CASE WHEN event_id % 37 = 0 THEN '{{broken'
                                  WHEN event_id % 43 = 0 THEN NULL
                                  WHEN event_id % 53 = 0 THEN '{{"k": "37"}}'
                                  WHEN event_id % 29 = 0 THEN '{{"k": 3.7}}'
                                  WHEN event_id % 31 = 0 THEN '{{"k": " 42 "}}'
                                  WHEN event_id % 23 = 0 THEN '{{"k": 99999999999}}'
                                  ELSE props END AS props
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        elif t == "lineitem":
            con.execute(f"""
                COPY (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
                             CASE WHEN l_orderkey % 101 = 0 THEN CAST('nan' AS DOUBLE)
                                  ELSE l_quantity END AS l_quantity,
                             CASE WHEN l_orderkey % 103 = 0 THEN CAST('inf' AS DOUBLE)
                                  ELSE l_extendedprice END AS l_extendedprice,
                             l_discount, l_tax, l_returnflag, l_linestatus,
                             CASE WHEN l_orderkey % 109 = 0 THEN CAST(NULL AS TIMESTAMP)
                                  WHEN l_orderkey % 127 = 0 THEN TIMESTAMP '9999-12-31 23:59:59.999999'
                                  WHEN l_orderkey % 131 = 0 THEN TIMESTAMP '0001-01-01 00:00:00'
                                  ELSE l_shipdate END AS l_shipdate
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        elif t == "orders":
            con.execute(f"""
                COPY (SELECT o_orderkey, o_custkey, o_orderstatus,
                             CASE WHEN o_orderkey % 107 = 0 THEN CAST('nan' AS DOUBLE)
                                  ELSE o_totalprice END AS o_totalprice,
                             CASE WHEN o_orderkey % 113 = 0 THEN CAST(NULL AS TIMESTAMP)
                                  WHEN o_orderkey % 137 = 0 THEN TIMESTAMP '1970-01-01 00:00:00'
                                  ELSE o_orderdate END AS o_orderdate,
                             o_orderpriority
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        elif t == "part":
            con.execute(f"""
                COPY (SELECT p_partkey, p_name, p_brand, p_type, p_size,
                             CASE WHEN p_partkey % 43 = 0 THEN CAST('-inf' AS DOUBLE)
                                  ELSE p_retailprice END AS p_retailprice
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        elif t == "customer":
            con.execute(f"""
                COPY (SELECT c_custkey, c_name, c_nationkey,
                             CASE WHEN c_custkey % 29 = 0 THEN CAST('nan' AS DOUBLE)
                                  ELSE c_acctbal END AS c_acctbal,
                             c_mktsegment
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        elif t == "supplier":
            con.execute(f"""
                COPY (SELECT s_suppkey, s_name, s_nationkey,
                             CASE WHEN s_suppkey % 13 = 0 THEN CAST('inf' AS DOUBLE)
                                  ELSE s_acctbal END AS s_acctbal
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        elif t == "embeddings":
            con.execute(f"""
                COPY (SELECT vec_id,
                             CASE WHEN vec_id % 89 = 0
                                    THEN list_transform(embedding,
                                         (x, i) -> CASE WHEN i = 1 THEN 'nan'::FLOAT ELSE x END)
                                  WHEN vec_id % 97 = 0
                                    THEN list_transform(embedding, x -> 0.0::FLOAT)
                                  WHEN vec_id % 101 = 0
                                    THEN list_transform(embedding,
                                         (x, i) -> CASE WHEN i = 3 THEN 'inf'::FLOAT ELSE x END)
                                  WHEN vec_id % 103 = 0
                                    THEN list_transform(embedding,
                                         (x, i) -> CASE WHEN i = 7 THEN '-inf'::FLOAT ELSE x END)
                                  ELSE embedding END AS embedding,
                             label
                      FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)""")
        else:
            if os.path.isdir(sp):
                shutil.copytree(sp, dp, dirs_exist_ok=True)
            else:
                shutil.copy2(sp, dp)
    for t, col in [("documents", "text"), ("events", "value"),
                   ("events", "event_type"), ("events", "user_id")]:
        n, nn = con.execute(
            f"SELECT count(*), count({col}) FROM read_parquet('{os.path.join(dst, t)}.parquet')"
        ).fetchone()
        print(f"{t}.{col}: {n - nn}/{n} nulls injected")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
