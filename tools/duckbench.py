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

# Ratio-hygiene buckets (r15, BASELINE "bucketed head-to-head"): the 2x
# gate is quoted on the COMPUTE bucket only.
#  - io_roundtrip: the Spark query performs real file/staging IO (write +
#    read-back) its oracle replays as pure SQL, or vice versa — wall-clock
#    there measures storage, not the engine.
#  - neardup_quadratic: only expressible in DuckDB as O(n^2) all-pairs
#    (Spark runs LSH/band blocking) — the historical tractable-cut skip.
BUCKETS = {
    "io_roundtrip": {
        "etl_sink_roundtrip", "etl_jsonl_roundtrip", "export_roundtrip",
        "deletion_staging", "stream_compacted_read", "pack_write_roundtrip",
    },
    "neardup_quadratic": {
        "dedup_clusters", "dedup_cluster_survivor", "dedup_minhash",
        "dedup_incremental",
    },
}


def bucket_of(name):
    for b, names in BUCKETS.items():
        if name in names:
            return b
    return "compute"


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

    # Throughput mode (r14 gate convention, BASELINE.md): the whole
    # oracle suite once more through N concurrent client threads over
    # the SAME warm connection pool — the saturated-suite wall to set
    # against the Spark bench's "throughput" block. DuckDB releases the
    # GIL during execution, so python threads genuinely overlap;
    # per-query threads are lowered so clients*threads ~ cores.
    clients = 8
    per_q = max(1, threads // clients)
    import threading
    # the FULL oracle set minus only the explicit skip list — mirroring
    # the Spark bench's throughput block, which attempts every query and
    # counts failures; excluding serially-errored oracles here would
    # compare unequal workloads (r14 review find)
    names = [n for n in sorted(oracle) if n not in skip]
    # cursors share the ONE warm in-memory database (same tables the
    # serial pass materialized) — DuckDB's documented multi-thread
    # pattern; per-query thread budget lowered so clients*threads≈cores
    con.execute(f"SET threads = {per_q}")
    cons = [con.cursor() for _ in range(clients)]
    idx = {"i": 0}
    lock = threading.Lock()
    failed = {"n": 0}

    def worker(c):
        while True:
            with lock:
                i = idx["i"]; idx["i"] += 1
            if i >= len(names):
                return
            try:
                c.execute(oracle[names[i]]).fetchall()
            except Exception:
                with lock:
                    failed["n"] += 1
    t0 = time.time()
    ts = [threading.Thread(target=worker, args=(c,)) for c in cons]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    tp_wall = time.time() - t0

    buckets = {}
    for name, v in results.items():
        if v is not None:
            b = bucket_of(name)
            buckets[b] = round(buckets.get(b, 0.0) + v, 3)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "queries": results, "sf": sf_dir,
                      "threads": threads, "buckets": buckets,
                      "throughput": {"clients": clients,
                                     "per_query_threads": per_q,
                                     "wall_sec": round(tp_wall, 2),
                                     "n": len(names),
                                     "failed": failed["n"]}}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 32,
         tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else ())
