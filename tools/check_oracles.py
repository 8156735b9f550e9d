"""Driver-contract self-check: run each __spark_entry__ query at sf0.01
and compare against its DuckDB oracle (row count, column names, and
order-insensitive value comparison), mirroring CORRECTNESS_r{N}.json.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402
from crfsuite_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else str(v))
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (no oracle)")
            if len(got) == 0 and name != "dedup_minhash":
                failures.append((name, "0 rows"))
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            continue
        g, e = normalize(got), normalize(exp)
        # the driver harness hashes VALUES, so a bigint-vs-hugeint(float)
        # representation difference is a real mismatch even when the
        # numbers are equal — flag dtype divergence loudly
        for c in set(g.columns) & set(e.columns):
            kg, ke = g[c].dtype.kind, e[c].dtype.kind
            # object columns were already stringified by normalize();
            # flag only numeric-kind divergence (int vs float is what the
            # driver's value hash trips on)
            if kg != ke and "O" not in (kg, ke):
                failures.append((name, f"dtype {c}: {g[c].dtype} vs {e[c].dtype}"))
                print(f"FAIL  {name}: dtype mismatch on {c}: {g[c].dtype} vs {e[c].dtype}")
        if any(f[0] == name for f in failures):
            continue
        if list(g.columns) != list(e.columns):
            failures.append((name, f"columns {list(g.columns)} vs {list(e.columns)}"))
            print(f"FAIL  {name}: column mismatch {list(g.columns)} vs {list(e.columns)}")
            continue
        if len(g) != len(e):
            failures.append((name, f"rows {len(g)} vs {len(e)}"))
            print(f"FAIL  {name}: row count {len(g)} vs {len(e)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, atol=1e-6)
            print(f"OK    {name}: {len(g)} rows")
        except AssertionError as err:
            failures.append((name, "value mismatch"))
            print(f"FAIL  {name}: value mismatch\n{str(err)[:500]}")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
