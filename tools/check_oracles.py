"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry and its oracle_sql() twin at a given
scale factor, compare row count, schema (column names), and
order-insensitive values (sorted columns, sorted rows).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    import __spark_entry__ as mod
    from distributed_graph_analytics_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = mod.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        spark_rows = sdf.toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows={len(spark_rows):8d}  (no oracle, rows-only) "
                  f"spark={t_spark:.1f}s")
            continue
        t0 = time.time()
        want = con.execute(oracles[name]).df()
        t_duck = time.time() - t0
        ok, msg = compare(spark_rows, want)
        status = "OK " if ok else "FAIL"
        print(f"{name:24s} rows={len(spark_rows):8d}  {status} {msg} "
              f"spark={t_spark:.1f}s duckdb={t_duck:.1f}s")
        if not ok:
            failures.append(name)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle comparisons passed")


def compare(got, want):
    import pandas as pd

    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        return False, f"schema {list(g.columns)} != {list(w.columns)}"
    if len(g) != len(w):
        return False, f"rowcount {len(g)} != {len(w)}"
    for df in (g, w):
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float64").round(9)
            else:
                try:
                    df[c] = pd.to_numeric(df[c]).astype("int64")
                except (ValueError, TypeError):
                    df[c] = df[c].astype(str)
    gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    ws = w.sort_values(by=list(w.columns)).reset_index(drop=True)
    if not gs.equals(ws):
        diff = (gs != ws).any(axis=1)
        n = int(diff.sum())
        first = gs[diff].head(2).to_dict("records"), ws[diff].head(2).to_dict("records")
        return False, f"{n} differing rows; first: {first}"
    return True, "values match"


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    main(sf, names)
