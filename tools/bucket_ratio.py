#!/usr/bin/env python3
"""Per-bucket Spark-vs-DuckDB ratio report (r15 ratio hygiene).

Takes the Spark bench sidecar (bench_full.json — full per-query map) and
a duckbench.py output JSON, sums both per-query maps under the SAME
bucket taxonomy (duckbench.BUCKETS), and prints per-bucket totals +
ratios. The 2x gate is quoted on the `compute` bucket: io_roundtrip
walls measure storage, and neardup_quadratic measures DuckDB's missing
LSH, not engine speed.

Usage: bucket_ratio.py <spark_sidecar.json> <duckbench_out.json>
Dev tool only — not part of the library.
"""
import json, sys

from duckbench import bucket_of


def sums(queries):
    out = {}
    for name, v in queries.items():
        if name == "other" or v is None or v < 0:
            continue
        b = bucket_of(name)
        out[b] = out.get(b, 0.0) + v
    return out


def main(spark_path, duck_path):
    spark = json.loads(open(spark_path).read().strip().splitlines()[-1])
    duck = json.loads(open(duck_path).read().strip().splitlines()[-1])
    s, d = sums(spark["queries"]), sums(duck["queries"])
    only_s = set(spark["queries"]) - set(duck["queries"])
    only_d = set(duck["queries"]) - set(spark["queries"])
    if only_s:
        print(f"note: spark-only (bench witnesses, no oracle): {sorted(only_s)}")
    if only_d:
        print(f"note: duck-only: {sorted(only_d)}")
    print(f"{'bucket':<20} {'spark_s':>9} {'duck_s':>9} {'spark/duck':>11}")
    for b in sorted(set(s) | set(d)):
        sv, dv = s.get(b, 0.0), d.get(b, 0.0)
        ratio = f"{sv / dv:10.2f}x" if dv > 0 else "        n/a"
        print(f"{b:<20} {sv:9.2f} {dv:9.2f} {ratio}")
    st, dt = sum(s.values()), sum(d.values())
    print(f"{'TOTAL':<20} {st:9.2f} {dt:9.2f} {st / dt:10.2f}x")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
