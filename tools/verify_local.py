"""Local oracle harness — mimics the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet, then compares
row count, schema width, and an order-insensitive value comparison
(columns sorted by name, rows sorted by all columns, exact equality
with a float diff report on mismatch).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        # unify float32/float64, int variants
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last").reset_index(
            drop=True
        )
    return df


def compare(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pd) != len(duck_pd):
        problems.append(f"rowcount spark={len(spark_pd)} duck={len(duck_pd)}")
    s_cols, d_cols = sorted(spark_pd.columns), sorted(duck_pd.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pd), normalize(duck_pd)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv):
            both_nan = sv.isna() & dv.isna()
            eq = (sv == dv) | both_nan
            if not eq.all():
                bad = (~eq).idxmax()
                close = np.isclose(
                    sv.fillna(0), dv.fillna(0), rtol=1e-9, atol=1e-12
                ).all()
                problems.append(
                    f"col {c}: {int((~eq).sum())} diffs, first@{bad} "
                    f"spark={sv[bad]!r} duck={dv[bad]!r} "
                    f"({'CLOSE (float noise)' if close else 'NOT CLOSE'})"
                )
        else:
            eq = (sv == dv) | (sv.isna() & dv.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                problems.append(
                    f"col {c}: {int((~eq).sum())} diffs, first@{bad} "
                    f"spark={sv[bad]!r} duck={dv[bad]!r}"
                )
    # dtype report (schema-ish check)
    for c in s.columns:
        if s[c].dtype != d[c].dtype:
            problems.append(f"dtype {c}: spark={s[c].dtype} duck={d[c].dtype}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from projet_big_data_boutin_danre_spark.session import get_spark

    spark = get_spark("verify_local")
    con = duck_conn(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows-only: {len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        dt = time.time() - t0
        if problems:
            failures += 1
            print(f"FAIL  {name} ({dt:.1f}s, {len(sdf)} rows)")
            for p in problems[:6]:
                print(f"      - {p}")
        else:
            print(f"ok    {name} ({dt:.1f}s, {len(sdf)} rows)")
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
