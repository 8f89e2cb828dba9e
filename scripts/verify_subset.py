"""Spot-verify a subset of suite queries against their DuckDB oracles
(same comparison as tests/test_oracle_parity.py / the driver gate).

Usage: python scripts/verify_subset.py name1,name2 [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(val):
    if isinstance(val, float) and math.isnan(val):
        return "NaN"
    return val


def _rows(records, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        (tuple(_canon(rec[i]) for i in order) for rec in records), key=repr)


def main() -> None:
    names = sys.argv[1].split(",")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    from reactivedb_spark.session import get_spark
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    fails = 0
    for name in names:
        sdf = qs[name](spark, sf)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(os_[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_n = len(srows) == len(drows)
        sc, dc = _rows(srows, scols), _rows(drows, dcols)
        bad = [i for i, (x, y) in enumerate(zip(sc, dc)) if x != y]
        status = "OK" if (ok_cols and ok_n and not bad) else "FAIL"
        fails += status == "FAIL"
        print(f"{name}: {status} rows={len(srows)}/{len(drows)} cols_ok={ok_cols}")
        if not ok_cols:
            print(f"  cols spark={scols} duck={dcols}")
        if bad:
            i = bad[0]
            print(f"  {len(bad)} mismatches; first spark={sc[i]} duck={dc[i]}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
