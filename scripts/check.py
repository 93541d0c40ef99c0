#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
For each result parquet in outDir, runs the matching oracle SQL from
outDir/oracle_sql.json in DuckDB over the same sfDir tables, then
compares: row count, column names (sorted), and value hash (rows
sorted, columns sorted by name). Reports exact and tolerant-float
comparisons separately.
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first").reset_index(drop=True)
    return df

def values_equal(a, b, tol=1e-9):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noora = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        try:
            got = canon(pd.read_parquet(path))
        except Exception as e:
            print(f"FAIL {name}: cannot read result parquet: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            n_noora += 1
            continue
        try:
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if list(got.columns) != list(exp.columns):
            ok = False
            msgs.append(f"columns differ: spark={list(got.columns)} duck={list(exp.columns)}")
        elif len(got) != len(exp):
            ok = False
            msgs.append(f"rowcount differ: spark={len(got)} duck={len(exp)}")
        else:
            exact = True
            for c in got.columns:
                gv, ev = got[c].tolist(), exp[c].tolist()
                for i, (g, e) in enumerate(zip(gv, ev)):
                    sg, se = str(g), str(e)
                    if sg != se:
                        exact = False
                        if not values_equal(g, e):
                            ok = False
                            msgs.append(f"col {c} row {i}: spark={g!r} duck={e!r}")
                            break
                if not ok:
                    break
            if ok and not exact:
                msgs.append("WARN: tolerant-only match (exact string compare failed)")
        status = "PASS" if ok else "FAIL"
        extra = ("  " + "; ".join(msgs)) if msgs else ""
        print(f"{status} {name}: rows={len(got)}{extra}")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
