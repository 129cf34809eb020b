#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dir in
OUT_DIR, run the matching oracle SQL from oracle_sql.json in DuckDB over the
same sf parquet tables, and compare (schema-by-name, row multiset, and
row order). Usage: compare.py <sfDir> <verifyOutDir>

Dev tool only — not part of the library.
"""
import json, math, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list): return "[" + ",".join(canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"): return v.isoformat()
    from decimal import Decimal
    if isinstance(v, Decimal): return repr(float(v))
    return repr(v)

def rows_of_table(tbl, colnames):
    cols = [tbl.column(c).to_pylist() for c in colnames]
    return [tuple(canon(c[i]) for c in cols) for i in range(tbl.num_rows)]

def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for qdir in sorted(p for p in out.iterdir() if p.is_dir()):
        name = qdir.name
        spark_tbl = pq.read_table(qdir)
        if name not in oracle:
            print(f"  SKIP {name}: no oracle (rows={spark_tbl.num_rows})")
            continue
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"✗ FAIL {name}: oracle errored: {e}")
            n_fail += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"✗ FAIL {name}: columns {s_cols} vs {d_cols}")
            n_fail += 1
            continue
        s_rows = rows_of_table(spark_tbl, s_cols)
        d_rows = rows_of_table(duck, d_cols)
        if s_rows == d_rows:
            print(f"✓ pass {name} ({len(s_rows)} rows, ordered)")
            n_pass += 1
        elif sorted(s_rows) == sorted(d_rows):
            # a HARD failure since round 10: every query declares a total
            # order, and order-contract oracles (message_summaries_by_ids
            # rank preservation) are only certified if order mismatches
            # cannot sweep green
            print(f"✗ FAIL {name}: values match but ROW ORDER DIFFERS "
                  f"({len(s_rows)} rows) — fix the orderBy on one side")
            n_fail += 1
        else:
            n_fail += 1
            s_set, d_set = set(s_rows), set(d_rows)
            only_s = list(s_set - d_set)[:3]
            only_d = list(d_set - s_set)[:3]
            print(f"✗ FAIL {name}: rows {len(s_rows)} vs {len(d_rows)}")
            for r in only_s: print(f"    spark-only: {r}")
            for r in only_d: print(f"    duck-only : {r}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
