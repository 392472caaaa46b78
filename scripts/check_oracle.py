#!/usr/bin/env python3
"""Dev-time mimic of the driver's correctness gate: run graft.Verify
output against the DuckDB oracle and diff per query.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and not any(name.startswith(x) for x in only): continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        got = pd.read_parquet(f"{outdir}/{name}")
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g = got[sorted(got.columns)].reset_index(drop=True)
        e = exp[sorted(exp.columns)].reset_index(drop=True)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        if len(g) == 0:
            print(f"WARN {name}: 0 rows (vacuous pass)")
        bad = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            # Dtype-KIND-strict: the driver's hash is type-sensitive
            # across kinds (DuckDB HUGEINT -> float64 vs Spark BIGINT ->
            # int64 is a real driver-side FAIL even when values match:
            # "5.0" vs "5") but canonicalizes within a kind (int32 vs
            # int64 passes — CORRECTNESS_r01 q07/q12/q13/q33). So fail
            # on kind mismatch, allow width differences.
            def kind(s):
                k = s.dtype.kind
                return "i" if k in "iu" else k
            if kind(gv) != kind(ev):
                bad.append(f"{c}: DTYPE KIND mismatch {gv.dtype} vs {ev.dtype} "
                           f"(driver hash is type-sensitive across kinds)")
                continue
            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
                ga = gv.astype(float).to_numpy(); ea = ev.astype(float).to_numpy()
                neq = ~((ga == ea) | (np.isnan(ga) & np.isnan(ea)))
                if neq.any():
                    i = int(np.argmax(neq))
                    bad.append(f"{c}: {neq.sum()} diffs, first@{i}: {ga[i]!r} vs {ea[i]!r} (maxabs {np.nanmax(np.abs(ga-ea)):.3e})")
            else:
                gs, es = gv.astype(str), ev.astype(str)
                neq = (gs != es).to_numpy()
                if neq.any():
                    i = int(np.argmax(neq))
                    bad.append(f"{c}: {neq.sum()} diffs, first@{i}: {gs.iloc[i]!r} vs {es.iloc[i]!r} (dtypes {gv.dtype}/{ev.dtype})")
        if bad:
            print(f"FAIL {name}:")
            for b in bad: print(f"    {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
             sys.argv[3].split(',') if len(sys.argv) > 3 else None))
