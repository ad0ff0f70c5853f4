"""Z-order (Morton) clustering layout — multi-dimensional data skipping.

The IVF index (simsearch.build_ivf_index) prunes on ONE derived key via
hive partitioning. Z-ordering is the other physical-layout primitive a
100 TB table needs: when queries filter on TWO independent columns
(user_id AND date; source AND status), partitioning by either one leaves
the other unclustered. Interleaving the bits of both into one Morton key
and range-clustering files by that key bounds EVERY file's min/max range
on BOTH dimensions at once, so the reader's ordinary min/max-statistics
pruning (parquet row-group stats, Iceberg/Delta file stats) skips on
either predicate — this is exactly what Delta's OPTIMIZE ZORDER BY and
Iceberg's sort-order rewrite do; here it is expressed as a plain Spark
plan: derive z, repartitionByRange(z), sortWithinPartitions(z), write.

The key math is a pure per-row fold (aggregate HOF over the bit index),
JVM-side, and stated independently in DuckDB (list_sum over the same bit
schedule) so the interleave itself is value-verified cross-engine.

The range-exchange + local sort IS a total order on z — deliberate and
correct for a write-once clustering pass (identical to what OPTIMIZE
ZORDER executes); it is never on a query path. Sampling for the range
boundaries is Spark's standard reservoir pass; at 100 TB the same plan
runs per partition-window (cluster yesterday's files only), which is how
production table services batch it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key_expr(a: str, b: str, bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` of two non-negative ints
    (a in even positions, b in odd). A left fold over the bit index keeps
    the expression tree tiny (same Janino-limit rationale as
    simsearch._dot_sql); everything stays in whole-stage codegen."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc"
        f" + shiftleft(shiftright(CAST({a} AS BIGINT), i) & 1, 2 * i)"
        f" + shiftleft(shiftright(CAST({b} AS BIGINT), i) & 1, 2 * i + 1))"
    )


def duck_zorder_sql(a: str, b: str, bits: int = 16) -> str:
    """The same interleave stated independently for the DuckDB oracle."""
    return (
        f"CAST(list_sum(list_transform(range(0, {bits}), i -> "
        f"(((CAST({a} AS BIGINT) >> i) & 1) << (2 * i))"
        f" + (((CAST({b} AS BIGINT) >> i) & 1) << (2 * i + 1)))) AS BIGINT)"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    bits: int = 16,
    files: int = 16,
) -> None:
    """Cluster ``df`` into ``files`` z-ordered parquet files. Each output
    file covers one contiguous Morton range, so its footer min/max stats
    are tight on BOTH ``a`` and ``b`` — the property tests/test_layout
    asserts directly from the parquet metadata (the exact stats any
    min/max-pruning reader consumes)."""
    (
        df.withColumn("z", zorder_key_expr(a, b, bits))
        .repartitionByRange(files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_locality(df: DataFrame, a: str, b: str, bits: int = 16) -> DataFrame:
    """Per-z-bucket locality profile: bucket rows by the Morton key's high
    bits (z >> 10: 1024 z-values per bucket) and emit each bucket's row count and
    min/max envelope on both source dimensions — the statistics view of
    what a z-clustered file layout gives every file. One bounded-key
    count shuffle; the fold is per-row math."""
    z = zorder_key_expr(a, b, bits)
    return (
        df.select(
            F.shiftright(z, 10).alias("z_bucket"),
            F.col(a).cast("long").alias("av"),
            F.col(b).cast("long").alias("bv"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.min("av").alias("min_a"),
            F.max("av").alias("max_a"),
            F.min("bv").alias("min_b"),
            F.max("bv").alias("max_b"),
        )
    )
