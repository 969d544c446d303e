#!/usr/bin/env python3
"""Dev-only harness (mirrors the driver's correctness gate; NOT part of the
engine): run graft.Verify first, then compare each query's parquet output
against its DuckDB oracle on the same corpus.

Usage: python3 tools/check_oracle.py [sfdir] [outdir]
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    produced = {os.path.basename(p)
                for p in glob.glob(f"{OUT}/*") if os.path.isdir(p)}

    n_pass = n_fail = n_weak = 0
    for name in sorted(produced):
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = pd.read_parquet(f"{OUT}/{name}")
        if name not in oracle:
            status = "ok" if len(got) >= 0 else "?"
            print(f"WEAK {name}: no oracle, rows={len(got)}")
            n_weak += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        dt_mismatch = [(c, str(g[c].dtype), str(e[c].dtype))
                       for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
        if dt_mismatch:
            print(f"DTYPE {name}: {dt_mismatch}")
        # value compare: exact on strings/ints, tiny tolerance report on floats
        bad = None
        for c in g.columns:
            gs, es = g[c], e[c]
            try:
                if gs.dtype.kind == "f" or es.dtype.kind == "f":
                    import numpy as np
                    ga = gs.to_numpy(dtype=float)
                    ea = es.to_numpy(dtype=float)
                    nan_ok = (pd.isna(ga) == pd.isna(ea)).all()
                    eq = nan_ok and np.allclose(
                        ga, ea, rtol=0, atol=0, equal_nan=True)
                    if not eq:
                        close = nan_ok and np.allclose(
                            ga, ea, rtol=1e-12, equal_nan=True)
                        bad = (c, "float-exact" if close else "float", close)
                        break
                else:
                    gl = gs.apply(lambda x: str(x))
                    el = es.apply(lambda x: str(x))
                    if not (gl == el).all():
                        i = (gl != el).idxmax()
                        bad = (c, f"row {i}: {gl[i]!r} != {el[i]!r}", False)
                        break
            except Exception as ex:
                bad = (c, f"compare error {ex}", False)
                break
        if bad is None:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: col {bad[0]}: {bad[1]}")
            n_fail += 1

    missing = set(oracle) - produced
    for name in sorted(missing):
        print(f"FAIL {name}: oracle declared but no output produced")
        n_fail += 1
    print(f"\n== {n_pass} pass, {n_weak} weak(no-oracle), {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
