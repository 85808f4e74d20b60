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
    # Pin the thread count explicitly so the protocol is stated, not
    # inherited from the machine. Default = all cores, matching the
    # driver's 32-cpu Bench runs (symmetric protocol, pinned r7).
    threads = int(os.environ.get("DUCKDB_THREADS", os.cpu_count()))
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        # driver testdata = single file; graft.ScaleData output = a
        # directory of part files. ScaleData subsets (e.g. the sf100
        # dress-rehearsal dirs) carry only the tables their queries
        # read — skip the rest, the oracle subset won't reference them.
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Optional comma-separated subset (e.g. the sf10 heavy-query ladder,
    # where running every oracle — ngram alone is ~470 s — is pointless).
    subset = os.environ.get("BASELINE_QUERIES")
    if subset:
        want = {q.strip() for q in subset.split(",") if q.strip()}
        unknown = want - set(oracles)
        if unknown:
            raise SystemExit(f"BASELINE_QUERIES not in oracle_sql.json: {sorted(unknown)}")
        oracles = {k: v for k, v in oracles.items() if k in want}
    timings = {}
    failed = {}
    for name in sorted(oracles):
        best = float("inf")
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                best = min(best, time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 - a DNF (e.g. out-of-disk
            # spill on the sim_knn_exact all-pairs SQL at sf1) must not
            # lose the whole column: record it and keep timing the rest.
            failed[name] = f"{type(e).__name__}: {e}"[:200]
            print(f"[baseline] {name} DNF: {failed[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 4)
    out = {"queries": timings, "total": round(sum(timings.values()), 4),
           "sf": sf_dir, "reps": reps, "threads": threads}
    if failed:
        # A DNF makes the bare total non-comparable against an engine
        # total that includes the query (r12 ADVICE: the silent shrink
        # reads as a speedup). Null the headline total and emit the
        # surviving set explicitly so any pairing is forced to drop the
        # same queries on both sides; the per-query cells stay usable.
        out["failed"] = failed
        out["total"] = None
        out["total_surviving"] = round(sum(timings.values()), 4)
        out["surviving_queries"] = sorted(timings)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 3))
