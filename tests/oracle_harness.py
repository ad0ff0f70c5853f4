"""Replica of the driver's correctness gate: run every __spark_entry__
query on Spark AND its oracle_sql on DuckDB, compare row-count + schema
(column names) + order-insensitive value equality.

Usage: python tests/oracle_harness.py [sf0.001|sf0.01|sf0.1] [query ...]
Exits nonzero on any mismatch. Stricter than the driver (full value
compare, not just a hash) so driver mismatches can't surprise us.
"""

from __future__ import annotations

import math
import sys


TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _norm(v):
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    return v


def compare(name: str, spark_df, duck_rows, duck_cols) -> list[str]:
    errs = []
    s_cols = list(spark_df.columns)
    s_rows = spark_df.collect()
    if sorted(s_cols) != sorted(duck_cols):
        errs.append(f"{name}: schema mismatch spark={sorted(s_cols)} duck={sorted(duck_cols)}")
        return errs
    if len(s_rows) != len(duck_rows):
        errs.append(f"{name}: rowcount spark={len(s_rows)} duck={len(duck_rows)}")
    from collections import Counter

    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    duck_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_set = Counter(tuple(_norm(r[i]) for i in order) for r in s_rows)
    d_set = Counter(tuple(_norm(r[i]) for i in duck_order) for r in duck_rows)
    if s_set != d_set:
        diff_s = list((s_set - d_set).keys())[:3]
        diff_d = list((d_set - s_set).keys())[:3]
        errs.append(
            f"{name}: VALUE mismatch; spark-only={diff_s} duck-only={diff_d}"
        )
    return errs


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    only = set(sys.argv[2:])
    sf_dir = f"/root/testdata/{sf}"

    sys.path.insert(0, "/root/repo")
    import duckdb

    import __spark_entry__ as entrymod
    from logspark.session import get_spark

    # HARNESS_ANSI=1 replicates the driver's Spark-4 ANSI-on session so that
    # queries passing here cannot fail the driver on cast semantics.
    import os

    extra = (
        {"spark.sql.ansi.enabled": "true"}
        if os.environ.get("HARNESS_ANSI") == "1"
        else None
    )
    spark = get_spark(cores=8, app="oracle-harness", extra=extra)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures: list[str] = []
    import time

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: SPARK ERROR {e}")
            continue
        if name not in oracles:
            n = sdf.count()
            print(f"  {name}: rows-only check, {n} rows  [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: DUCKDB ERROR {e}")
            continue
        errs = compare(name, sdf, duck_rows, duck_cols)
        failures.extend(errs)
        status = "FAIL" if errs else "ok"
        print(f"  {name}: {status} ({len(duck_rows)} rows)  [{time.time()-t0:.1f}s]")

    missing = [n for n in oracles if n not in queries]
    if missing:
        failures.append(f"oracle_sql keys missing from queries(): {missing}")
    print()
    if failures:
        print("FAILURES:")
        for f in failures:
            print(" ", f[:2000])
        return 1
    print(f"ALL {len([n for n in queries if not only or n in only])} queries match at {sf}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
