#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: reads the graft.Verify
output dir (per-query parquet + oracle_sql.json), runs each oracle SQL in
DuckDB over the same testdata parquet, and diffs. Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = normalize(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            exp = normalize(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        bad = []
        for c in got.columns:
            g, e = got[c], exp[c]
            if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
                gn = pd.to_numeric(g, errors="coerce")
                en = pd.to_numeric(e, errors="coerce")
                neq = ~((gn == en) | (gn.isna() & en.isna()))
                if neq.any():
                    idx = neq.idxmax()
                    bad.append(f"{c}: {neq.sum()} diffs, first@{idx}: {g[idx]!r} vs {e[idx]!r}, maxabs={ (gn-en).abs().max() }")
            else:
                neq = ~((g == e) | (g.isna() & e.isna()))
                if neq.any():
                    idx = neq.idxmax()
                    bad.append(f"{c}: {neq.sum()} diffs, first@{idx}: {g[idx]!r} vs {e[idx]!r}")
        # dtype mismatches worth flagging even when values match
        dt = [f"{c}: {got[c].dtype} vs {exp[c].dtype}" for c in got.columns
              if str(got[c].dtype) != str(exp[c].dtype)]
        if bad:
            print(f"FAIL {name}: " + " | ".join(bad)); n_fail += 1
        else:
            flag = f"  [dtype: {'; '.join(dt)}]" if dt else ""
            print(f"PASS {name} ({len(got)} rows){flag}"); n_pass += 1
    # queries without oracle → rows-only
    import os
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
            print(f"ROWS {name}: {n}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
