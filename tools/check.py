#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Mimics the driver: registers each parquet table as a DuckDB view, runs
every oracle SQL from oracle_sql.json, and compares against the parquet
the Spark Verify main wrote (columns sorted by name, rows sorted, exact
value equality; doubles compared bit-exact with a fallback report of max
abs diff). Purely a builder-side self-check — not part of the library.
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
            got_files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not got_files:
                print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
            got = pd.concat([pd.read_parquet(f) for f in sorted(got_files)])
            exp, got = canon(exp), canon(got)
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
                n_fail += 1;  continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
                n_fail += 1;  continue
            ok = True
            for c in exp.columns:
                e, g = exp[c].values, got[c].values
                # the driver's hash is type-sensitive: an int column on one
                # side vs float on the other (e.g. an uncast DuckDB SUM ->
                # HUGEINT -> float64) fails the driver even when values are
                # identical.  int32 vs int64 and datetime unit differences
                # are known-tolerated; int-vs-float is known-fatal.
                ek, gk = exp[c].dtype.kind, got[c].dtype.kind
                if (ek in "iu") != (gk in "iu") and "f" in (ek + gk):
                    print(f"FAIL {name}: col {c} dtype oracle={exp[c].dtype} "
                          f"spark={got[c].dtype} — driver hash will diverge "
                          f"(cast the oracle aggregate, e.g. CAST(... AS BIGINT))")
                    ok = False
                if np.issubdtype(exp[c].dtype, np.floating) or np.issubdtype(got[c].dtype, np.floating):
                    e = e.astype(float); g = g.astype(float)
                    same = (e == g) | (np.isnan(e) & np.isnan(g))
                    if not same.all():
                        bad = ~same
                        print(f"FAIL {name}: col {c} {bad.sum()} mismatches, "
                              f"max abs diff {np.nanmax(np.abs(e[bad]-g[bad]))}")
                        ok = False
                elif "datetime" in str(exp[c].dtype) or "datetime" in str(got[c].dtype):
                    e = pd.to_datetime(exp[c]).astype("datetime64[us]")
                    g = pd.to_datetime(got[c]).astype("datetime64[us]")
                    if not (e.values == g.values).all():
                        print(f"FAIL {name}: col {c} timestamp mismatch")
                        ok = False
                else:
                    same = pd.Series(e).astype(str).values == pd.Series(g).astype(str).values
                    if not same.all():
                        i = int(np.argmax(~same))
                        print(f"FAIL {name}: col {c} mismatch e.g. exp={e[i]!r} got={g[i]!r}")
                        ok = False
            if ok:
                print(f"PASS {name} ({len(exp)} rows)");  n_pass += 1
            else:
                n_fail += 1
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}");  n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
