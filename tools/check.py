#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle in
<verifyOutDir>/oracle_sql.json, and compares against the Spark parquet
dump in <verifyOutDir>/<name>/ — columns sorted by name, rows sorted by
all columns, values hashed (floats rounded to 9 significant-ish digits
to avoid engine summation-order noise; the real driver may be stricter,
so queries should round explicitly where it matters).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append("\x01".join(canon(r[i]) for i in order))
    out.sort()
    return sorted(cols), out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    present = sorted(d.name for d in Path(out_dir).iterdir() if d.is_dir())
    manifest_path = Path(out_dir) / "queries.json"
    if manifest_path.exists():
        for name in json.loads(manifest_path.read_text()):
            if name not in present:
                results[name] = {"status": "missing_result", "ok": False}
    for name in present:
        spark_rel = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        s_cols = [c[0] for c in spark_rel.description]
        s_rows = spark_rel.fetchall()
        if name not in oracle:
            results[name] = {"status": "rows_only", "rows": len(s_rows), "ok": len(s_rows) > 0}
            continue
        try:
            rel = con.execute(oracle[name])
            o_cols = [c[0] for c in rel.description]
            o_rows = rel.fetchall()
        except Exception as e:
            results[name] = {"status": "oracle_error", "error": str(e)[:300], "ok": False}
            continue
        sc, sr = table_sig(s_cols, s_rows)
        oc, orr = table_sig(o_cols, o_rows)
        ok = sc == oc and sr == orr
        res = {"status": "compared", "ok": ok, "rows": len(s_rows), "oracle_rows": len(o_rows)}
        if not ok:
            if sc != oc:
                res["schema"] = {"spark": sc, "oracle": oc}
            else:
                diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
                only_s = [r for r in sr if r not in set(orr)][:3]
                only_o = [r for r in orr if r not in set(sr)][:3]
                res["first_diffs"] = diff
                res["only_spark"] = only_s
                res["only_oracle"] = only_o
        results[name] = res
    n_ok = sum(1 for r in results.values() if r["ok"])
    print(json.dumps(results, indent=2, default=str))
    print(f"\n{n_ok}/{len(results)} OK")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
