#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads each Spark
result parquet from Verify's outDir, runs the corresponding oracle SQL in
DuckDB over the same fixture tables, and compares row counts, column
names, and values (columns sorted by name, like the driver's hash).

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_skip = 0
    for name, sql in sorted(oracle.items()):
        # a SPARK_GRAFT_VERIFY_ONLY run dumps a subset; absent dirs are
        # "not run this time", not failures
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
            gcols, wcols = sorted(got.columns), sorted(want.columns)
            if gcols != wcols:
                print(f"FAIL {name}: columns {gcols} vs {wcols}")
                n_bad += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
                n_bad += 1
                continue
            g = got[gcols].values.tolist()
            w = want[wcols].values.tolist()
            bad = None
            for i, (gr, wr) in enumerate(zip(g, w)):
                if [canon(x) for x in gr] != [canon(x) for x in wr]:
                    bad = (i, gr, wr)
                    break
            if bad:
                print(f"FAIL {name}: row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
                n_bad += 1
            else:
                print(f"ok   {name} ({len(got)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed" + (f", {n_skip} not dumped" if n_skip else ""))
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
