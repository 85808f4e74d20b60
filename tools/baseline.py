#!/usr/bin/env python3
"""Measure the single-node native-engine baseline for BASELINE.md.

The reference is an in-memory single-process Go service; there is no Go
toolchain in this container, so the baseline engine is DuckDB executing
the *exact oracle SQL* each graft query is verified against, over the
same parquet files. DuckDB is a state-of-the-art single-node columnar
engine — matching or beating it at the same scale factor is a stronger
claim than matching the reference's map-loop Go code.

Usage: python3 tools/baseline.py <sfDir> <verifyOutDir> [reps]
(verifyOutDir only needs oracle_sql.json — run graft.Verify first.)
Prints one JSON line: {"queries": {name: best_sec}, "total": sec}.
"""
import os, sys, json, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, reps: int = 3) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata = single file; graft.ScaleData output = a
        # directory of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    timings = {}
    for name in sorted(oracles):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    print(json.dumps({"queries": timings,
                      "total": round(sum(timings.values()), 4),
                      "sf": sf_dir, "reps": reps}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 3))
