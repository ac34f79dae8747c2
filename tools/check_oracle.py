#!/usr/bin/env python3
"""Local replica of the driver's t2 check: for each query output parquet in
OUTDIR, run the corresponding oracle SQL from oracle_sql.json in DuckDB with
the sf tables registered as views, and compare schema/rows/values.

Usage: check_oracle.py SFDIR OUTDIR
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        # a table may be a single parquet file (driver testdata) or a
        # Spark-written directory of part files (stress corpora)
        p = f"{sfdir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{outdir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            n_fail += 1
            continue
        # Strict arrow-type comparison — the driver hashes typed values, so
        # e.g. DuckDB HUGEINT (decimal128) vs Spark BIGINT must FAIL here
        # even when the integer values are equal (round-1 lesson: q22/q23/q55
        # were locally green but driver-red purely on this).
        garrow = con.execute(
            f"SELECT * FROM parquet_scan('{outdir}/{name}/*.parquet')").arrow()
        warrow = con.execute(sql).arrow()
        # Integer WIDTH differences hash equal on the driver (round-1 q10/
        # q12/q21/q63 were int32-vs-int64 and green), so normalize those —
        # but decimal128 (DuckDB HUGEINT) vs int64 hashed DIFFERENT, so
        # keep every other distinction.
        def ntype(t):
            s = str(t)
            return "int64" if s in ("int8", "int16", "int32", "int64",
                                    "uint8", "uint16", "uint32") else s
        gtypes = {f.name: ntype(f.type) for f in garrow.schema}
        wtypes = {f.name: ntype(f.type) for f in warrow.schema}
        type_mismatch = [
            (c, gtypes[c], wtypes[c]) for c in gcols if gtypes[c] != wtypes[c]
        ]
        if type_mismatch:
            print(f"FAIL {name}: arrow type mismatch {type_mismatch}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        g = got[gcols].sort_values(gcols).reset_index(drop=True)
        w = want[wcols].sort_values(wcols).reset_index(drop=True)
        bad = None
        for c in gcols:
            gv, wv = list(g[c]), list(w[c])
            for i, (x, y) in enumerate(zip(gv, wv)):
                x, y = norm(x), norm(y)
                if x is None and y is None:
                    continue
                try:
                    import pandas as pd
                    if pd.isna(x) and pd.isna(y):
                        continue
                except (TypeError, ValueError):
                    pass
                if x != y:
                    delta = ""
                    if isinstance(x, float) and isinstance(y, float):
                        delta = f" (delta={abs(x-y):.3e})"
                    bad = f"col {c} row {i}: spark={x!r} duck={y!r}{delta}"
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
