"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("int64", errors="ignore")
        elif pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = pd.to_datetime(s).astype("datetime64[us]")
        else:
            pdf[c] = s.astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def value_hash(pdf: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(canon(pdf), index=False).sum())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from towhee_spark.session import get_spark

    spark = get_spark("correctness", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        try:  # DuckDB binds views eagerly; a missing optional table should
            # only fail the queries that reference it
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception as e:  # noqa: BLE001
            print(f"WARN  view {t}: {str(e)[:100]}")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:  # a typo must not print ALL PASS with zero queries run
        print(f"FAIL  unknown query names: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            d = fn(spark, sf_dir)
            got = d.toPandas()
            from towhee_spark.functions.dedup import release_cached
            release_cached(d)  # don't accumulate cached shingle frames
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        if name not in os_:
            print(f"ROWS  {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = con.execute(os_[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {str(e)[:200]}")
            failures.append(name)
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = False
        if ok_rows and ok_cols:
            cg, ce = canon(got), canon(exp)
            ok_hash = value_hash(got) == value_hash(exp)
            if not ok_hash:
                diff_cols = [c for c in cg.columns if not cg[c].equals(ce[c])]
                mism = {}
                for c in diff_cols[:3]:
                    if pd.api.types.is_float_dtype(cg[c]):
                        neq = pd.Series(~np.isclose(cg[c], ce[c], equal_nan=True))
                    else:
                        neq = pd.Series((cg[c] != ce[c]).to_numpy())
                    idx = neq[neq].index[:3].tolist()
                    mism[c] = [
                        (cg[c].iloc[i], ce[c].iloc[i]) for i in idx
                    ] or f"dtype {cg[c].dtype} vs {ce[c].dtype}"
                print(f"FAIL  {name}: hash mismatch in {diff_cols[:5]} samples={mism}")
                failures.append(name)
                continue
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS  {name}: {len(got)} rows")
        else:
            print(f"FAIL  {name}: rows {len(got)} vs {len(exp)}; cols {sorted(got.columns)} vs {sorted(exp.columns)}")
            failures.append(name)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
