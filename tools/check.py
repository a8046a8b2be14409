#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads each <outDir>/<name> parquet (Spark output) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with views over the
sfDir tables; compares after sorting columns by name and rows by all
columns. Exact value equality (mirrors the driver's hash compare).
"""
import sys, json, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # decimals -> float; array cells (numpy arrays / lists) ->
            # tuples so they are hashable+orderable as sort keys
            df[c] = df[c].apply(
                lambda v: float(v) if hasattr(v, "as_tuple")
                else tuple(v) if isinstance(v, (np.ndarray, list)) else v)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def compare(name, a, b):
    if sorted(a.columns) != sorted(b.columns):
        return f"schema mismatch: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"row count: spark={len(a)} oracle={len(b)}"
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        # dtype-strict: an int column on one side vs float on the other
        # would hash differently in the driver even when values match
        fa, fb = pd.api.types.is_float_dtype(av), pd.api.types.is_float_dtype(bv)
        ia, ib = pd.api.types.is_integer_dtype(av), pd.api.types.is_integer_dtype(bv)
        if (fa and ib) or (ia and fb):
            return f"col '{c}' dtype kind mismatch: spark={av.dtype} oracle={bv.dtype}"
        if fa or fb:
            av = av.astype("float64"); bv = bv.astype("float64")
            # sign-of-zero strict: the driver hashes raw bytes, so
            # DuckDB's -0.0 vs Spark's +0.0 is a real mismatch even
            # though -0.0 == 0.0 (bit us in round 2, q70_stats)
            sgn_eq = np.signbit(av.fillna(0.0).values) == np.signbit(bv.fillna(0.0).values)
            neq = ~((av.isna() & bv.isna()) | ((av == bv) & sgn_eq))
        else:
            neq = ~((av.isna() & bv.isna()) | (av.astype(object) == bv.astype(object)))
        if neq.any():
            i = int(np.argmax(neq.values))
            return (f"col '{c}' differs at sorted-row {i}: "
                    f"spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r} "
                    f"({int(neq.sum())}/{len(a)} rows differ)")
    return None

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    # rows-only check for non-oracle queries (mirrors the driver)
    import glob, os
    for path in sorted(glob.glob(f"{out}/*")):
        name = os.path.basename(path)
        if not os.path.isdir(path) or name in oracle:
            continue
        try:
            n = len(con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df())
            if n > 0: print(f"PASS {name} (rows-only, {n} rows)"); n_pass += 1
            else: print(f"FAIL {name}: rows-only check, 0 rows"); n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: unreadable output ({str(e)[:90]})"); n_fail += 1
    for name in sorted(oracle):
        try:
            spark_df = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({str(e)[:90]})"); n_fail += 1; continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        # the REAL driver crashes sorting array cells (unhashable numpy
        # arrays) — flag them even though this replica tolerates them
        for c in spark_df.columns:
            # first NON-NULL cell: a null/scalar first row would hide
            # array cells further down (ADVICE r3)
            nn = spark_df[c].dropna() if spark_df[c].dtype == object else []
            if len(nn) and isinstance(nn.iloc[0], (np.ndarray, list)):
                print(f"WARN {name}: column '{c}' is array-typed — the "
                      f"driver's comparator cannot sort it; join to string")
        err = compare(name, spark_df, duck_df)
        if err: print(f"FAIL {name}: {err}"); n_fail += 1
        else: print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
