#!/usr/bin/env python3
"""Like-for-like pair report: Spark sweep JSON vs DuckDB baseline JSON.

Usage: python3 tools/pair.py <spark_bench.json> <duck_baseline.json> [out.json]
Prints the common-query totals, the ratio, the non-closure cut (the
closure family = rows whose DuckDB side is a recursive-CTE transitive
closure), and every row >= 2x. With [out.json] (r18, r17 verdict item
6) it also WRITES the per-query pair artifact — spark_s and duck_s per
common query plus both sessions' metadata — so the >=2x membership
claims are auditable from the committed file without re-running either
engine (commit as bench_out/pair_r{N}.json each round).
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


def main(spark_path, duck_path, out_path=None):
    sj = load(spark_path)
    dj = load(duck_path)
    s = sj["queries"]
    d = dj["queries"]
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
    if out_path:
        meta_keys = ("sf", "cpus", "threads", "reps", "git", "host",
                     "failed", "surviving_queries")
        artifact = {
            "rows": {q: {"spark_s": s[q], "duck_s": d[q],
                         "ratio": round(s[q] / d[q], 4)} for q in common},
            "spark_total": round(st, 4), "duck_total": round(dt, 4),
            "ratio": round(st / dt, 4),
            "nonclosure_spark": round(snc, 4), "nonclosure_duck": round(dnc, 4),
            "nonclosure_ratio": round(snc / dnc, 4),
            "spark_row_wins": len(wins),
            "spark_only": sorted(set(s) - set(d)),
            "duck_only": sorted(set(d) - set(s)),
            "spark_meta": {k: sj[k] for k in meta_keys if k in sj},
            "duck_meta": {k: dj[k] for k in meta_keys if k in dj},
        }
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
