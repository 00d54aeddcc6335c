#!/usr/bin/env python3
"""Local DuckDB-parity checker (mimics the driver's correctness gate).

Usage: python3 tools/check_parity.py <verify_out_dir> <sf_dir> [query ...]

For each query result parquet under <verify_out_dir>, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the raw tables in <sf_dir>,
then compares: columns sorted by name, rows sorted by all columns, values
hashed. Reports per-query MATCH / MISMATCH with a diff preview.
"""
import sys, os, json, glob, decimal
import duckdb
import pandas as pd
import numpy as np
import pyarrow.parquet as pq
import pyarrow as pa

# The driver's oracle path surfaces DuckDB DECIMAL(>18,x)/HUGEINT as
# float64, which rounds above 2^53 while Spark's parquet decimal stays
# exact — the hash then diverges even when both engines computed the
# same integer (r8's q308). Flag the whole class as a hard failure:
#  * any Spark output column whose parquet type is DECIMAL with
#    precision > 18 (the float64-coercion trigger on the oracle side);
#  * any integer/decimal column, either side, with |value| >= 2^53;
#  * any float64 column whose values are all integral with |max| >= 2^53
#    (precision already silently lost in transit).
TWO53 = 2 ** 53

def wide_magnitude_flags(name, spark_paths, spark_df, duck_df):
    msgs = []
    for p in spark_paths:
        sch = pq.read_schema(p)
        for f in sch:
            if pa.types.is_decimal(f.type) and f.type.precision > 18:
                msgs.append(f"spark col={f.name}: parquet DECIMAL"
                            f"({f.type.precision},{f.type.scale}) — oracle-side "
                            f"pandas coerces >18-digit decimals to float64; "
                            f"emit VARCHAR or a <2^53 magnitude")
        break  # schema identical across part files
    for side, df, other in (("spark", spark_df, duck_df),
                            ("duck", duck_df, spark_df)):
        for c in df.columns:
            s = df[c].dropna()
            if s.empty:
                continue
            if np.issubdtype(s.dtype, np.integer):
                # int64-vs-int64 is hash-exact at any magnitude (BIGINT
                # survives the pandas surface; q28's simhash relies on
                # this). Only flag >=2^53 ints when the OTHER side isn't
                # also exact-integer — then some coercion is in play.
                other_int = (c in other.columns and
                             np.issubdtype(other[c].dtype, np.integer))
                if not other_int and int(s.abs().max()) >= TWO53:
                    msgs.append(f"{side} col={c}: int |max| >= 2^53 with "
                                f"non-integer dtype on the other side — "
                                f"float64 coercion would round it")
            elif s.dtype == object and isinstance(s.iloc[0], decimal.Decimal):
                if max(abs(v) for v in s) >= decimal.Decimal(TWO53):
                    msgs.append(f"{side} col={c}: DECIMAL magnitude >= 2^53 — "
                                f"emit VARCHAR or rescale")
            elif np.issubdtype(s.dtype, np.floating):
                mx = s.abs().max()
                if np.isfinite(mx) and mx >= TWO53 and (s == s.round()).all():
                    msgs.append(f"{side} col={c}: integer-valued float64 "
                                f"|max| >= 2^53 — exactness already lost")
    return msgs

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: dates → iso strings, timestamps → iso, floats stay
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver hashes raw value representations: int64 99111 vs
        # float64 99111.0 hash-differ even when numerically equal. Flag
        # integer-vs-float dtype splits as a hard mismatch so local green
        # predicts driver green (DuckDB HUGEINT sums surface as float64).
        a_int = np.issubdtype(av.dtype, np.integer)
        b_int = np.issubdtype(bv.dtype, np.integer)
        a_flt = np.issubdtype(av.dtype, np.floating)
        b_flt = np.issubdtype(bv.dtype, np.floating)
        if (a_int and b_flt) or (a_flt and b_int):
            return (f"DTYPE MISMATCH col={c} spark={av.dtype} duck={bv.dtype} "
                    f"(would hash-fail on driver: int vs float repr)")
        if a_flt or b_flt:
            av = av.astype(float); bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
        else:
            eq = (av.astype(str).fillna("<NULL>") == bv.astype(str).fillna("<NULL>"))
        if not eq.all():
            bad = (~eq).idxmax()
            n_bad = int((~eq).sum())
            return (f"VALUE MISMATCH col={c} rows_bad={n_bad} "
                    f"first@{bad}: spark={a[c][bad]!r} duck={b[c][bad]!r}")
    return None

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_ok = n_bad = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        res_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not res_glob:
            print(f"[MISSING ] {name}: no spark result parquet"); n_bad += 1
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in sorted(res_glob)],
                             ignore_index=True)
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[ORAERR  ] {name}: {e}"); n_bad += 1
            continue
        err = compare(name, spark_df, duck_df)
        wide = wide_magnitude_flags(name, sorted(res_glob), spark_df, duck_df)
        if err:
            print(f"[MISMATCH] {name}: {err}"); n_bad += 1
        elif wide:
            for w in wide:
                print(f"[WIDEMAG ] {name}: {w}")
            n_bad += 1
        else:
            print(f"[ok      ] {name} ({len(spark_df)} rows)"); n_ok += 1
    # queries with no oracle: report rows-only
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(os.path.join(out_dir, d)) and d not in oracles:
            n = sum(len(pd.read_parquet(p)) for p in
                    glob.glob(os.path.join(out_dir, d, "*.parquet")))
            print(f"[no-oracle] {d}: {n} rows")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
