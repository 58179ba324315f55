#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read the Verify
output dir (parquet per query + oracle_sql.json), run each oracle SQL
in DuckDB over the testdata parquet tables, and compare row counts,
schemas (column names), and value hashes (columns sorted by name,
rows sorted, values canonicalized). Usage:
    python3 tools/local_check.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints vs floats: exact-integer floats -> int64 where safe
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.astype(str)
        elif np.issubdtype(s.dtype, np.floating):
            df[c] = s.round(9)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"[MISS ] {name}: no parquet written")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"[ROWS ] {name}: rows={len(got)} (no oracle; rows-only check)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[OERR ] {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        g, w = canon(got.copy()), canon(want.copy())
        if list(g.columns) != list(w.columns):
            print(f"[SCHEMA] {name}: spark={list(g.columns)} duckdb={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"[COUNT] {name}: spark={len(g)} duckdb={len(w)}")
            n_fail += 1
            continue
        # compare dtypes loosely: compare values as strings after round
        eq = True
        for c in g.columns:
            gv, wv = g[c], w[c]
            if np.issubdtype(gv.dtype, np.number) and np.issubdtype(wv.dtype, np.number):
                gf, wf = gv.astype(float).values, wv.astype(float).values
                # signbit check: the driver hashes values, so -0.0 vs
                # +0.0 IS a mismatch there (bit CORRECTNESS_r03's three
                # curvature queries); allclose alone can't see it
                both = ~(np.isnan(gf) | np.isnan(wf))
                sign0 = np.any(np.signbit(gf[both]) != np.signbit(wf[both]))
                if not np.allclose(gf, wf, rtol=0, atol=0, equal_nan=True) or sign0:
                    eq = False
                    neq = (gf != wf) & both
                    neq |= both & (np.signbit(gf) != np.signbit(wf))
                    bad = np.where(neq)[0][:5]
                    print(f"  col {c}: first diffs at rows {bad}:")
                    for i in bad:
                        print(f"    spark={gv.iloc[i]!r} duckdb={wv.iloc[i]!r}")
            else:
                if not (gv.astype(str) == wv.astype(str)).all():
                    eq = False
                    bad = np.where(gv.astype(str).values != wv.astype(str).values)[0][:5]
                    for i in bad:
                        print(f"  col {c} row {i}: spark={gv.iloc[i]!r} duckdb={wv.iloc[i]!r}")
        if eq:
            print(f"[PASS ] {name}: {len(g)} rows")
            n_pass += 1
        else:
            print(f"[VALUE] {name}: value mismatch")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
