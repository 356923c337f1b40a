"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count,
schema width, and an order-insensitive value hash (columns sorted by name,
values stringified). Run: python tools/check_entry.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from trefoil_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df) -> str:
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        rows.append("|".join(_norm(v) for v in row))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def _norm(v) -> str:
    import numpy as np

    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="check_entry", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # smoke: entry()
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"entry(): OK rows={n} schema={[f.name for f in edf.schema.fields]}")

    qs = entrymod.queries()
    if len(sys.argv) > 2:
        only = set(sys.argv[2].split(","))
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:24s} rows={len(sdf):6d}  (no oracle — rows-only)")
            continue
        odf = con.execute(oracles[name]).df()
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(sdf.columns) == sorted(odf.columns)
        hs, ho = value_hash(sdf), value_hash(odf)
        ok_hash = hs == ho
        status = "OK " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:24s} {status} rows={len(sdf)}/{len(odf)} "
            f"schema={'=' if ok_schema else sorted(sdf.columns) + ['!='] + sorted(odf.columns)} "
            f"hash={'=' if ok_hash else hs + '!=' + ho}"
        )
        if not ok_hash and ok_rows and ok_schema:
            # show first few value diffs for debugging
            import pandas as pd

            s2 = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)[0]).reset_index(drop=True)
            o2 = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)[0]).reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(s2, o2, check_dtype=False)
                print("   (frames equal under pandas compare — hash norm diff)")
            except AssertionError as e:
                print("   diff:", str(e).split("\n")[-2:])
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
