#!/usr/bin/env python3
"""Like-for-like pair report: Spark sweep JSON vs DuckDB baseline JSON.

Usage: python3 tools/pair.py <spark_bench.json> <duck_baseline.json>
Prints the common-query totals, the ratio, the non-closure cut (the
closure family = rows whose DuckDB side is a recursive-CTE transitive
closure), and every row >= 2x.
"""
import json, sys

CLOSURE = {"dedup_clusters", "dedup_clusters_sketch", "dedup_prune",
           "dedup_clusters_incremental", "dedup_clusters_incremental_serve",
           "dedup_semantic"}


def load(path):
    with open(path) as f:
        txt = f.read()
    # tolerate sbt "[info] " prefixes
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main(spark_path, duck_path):
    s = load(spark_path)["queries"]
    d = load(duck_path)["queries"]
    common = sorted(set(s) & set(d))
    st = sum(s[q] for q in common)
    dt = sum(d[q] for q in common)
    nc = [q for q in common if q not in CLOSURE]
    snc = sum(s[q] for q in nc)
    dnc = sum(d[q] for q in nc)
    wins = [q for q in common if s[q] < d[q]]
    flagged = sorted(((q, s[q], d[q], s[q] / d[q]) for q in common
                      if s[q] >= 2 * d[q]), key=lambda r: -r[3])
    print(f"common {len(common)} queries: spark {st:.2f} vs duck {dt:.2f} "
          f"= {st/dt:.3f}x  (spark row wins: {len(wins)})")
    print(f"non-closure cut ({len(nc)}): spark {snc:.2f} vs duck {dnc:.2f} "
          f"= {snc/dnc:.3f}x")
    for q, sv, dv, r in flagged:
        print(f"  >=2x: {q}: {sv:.2f} vs {dv:.2f} = {r:.2f}x")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
