#!/usr/bin/env python3
"""Time every oracle SQL from a Verify dump in DuckDB (warm, best-of-2) —
the apples-to-apples single-node comparison for BENCH/BASELINE. The
oracles are the same computations the Spark queries run (same casts,
same ordering), so per-query ratios are meaningful.

Usage: duckbench.py <sfDir> <verifyOutDir> [threads] [skip,names]
Dev tool only — not part of the library.

Note: since round 10 the near-dup oracles run over a deterministic
bounded draw (~500 docs at any SF), so the skip list is normally empty —
every oracle is tractable at sf0.1.
"""
import json, sys, time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir, threads=32, skip=()):
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    con.execute(f"SET threads = {threads}")
    for t in TABLES:
        # materialize: warm in-memory tables, mirroring the Spark bench's
        # cacheAll (BASELINE.md methodology)
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    results = {}
    for name in sorted(oracle):
        if name in skip:
            results[name] = None
            continue
        sql = oracle[name]
        try:
            con.execute(sql).fetchall()  # warm (plan + any caches)
            times = []
            for _ in range(2):
                t0 = time.time()
                con.execute(sql).fetchall()
                times.append(time.time() - t0)
            results[name] = round(min(times), 6)
        except Exception as e:
            results[name] = None
            print(f"  ERR {name}: {str(e)[:80]}", file=sys.stderr)
    total = sum(v for v in results.values() if v is not None)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "queries": results, "sf": sf_dir,
                      "threads": threads}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 32,
         tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else ())
