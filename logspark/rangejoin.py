"""Bucketized range join — the scale pattern for interval predicates.

A naive range join (``b.ts BETWEEN a.ts AND a.ts + W``) has no equi-key, so
Spark plans it as a broadcast-nested-loop / cartesian-per-key scan — O(n·m)
at any scale. The bucketized form restores a hash-partitionable equi-key:

  1. bin the time axis into W-sized buckets;
  2. any qualifying pair (gap <= W) lands in the SAME or ADJACENT bucket
     (monotone binning with bucket width = window; true for any fixed
     alignment), so the probe side is exploded to cover (bucket, bucket-1)
     and candidates come from ONE equi-join on (key, bucket) — a plain hash
     shuffle that partitions evenly;
  3. the exact interval predicate refines the candidates.

No O(n·m) stage; each pair is produced exactly once (the build row's single
bucket matches exactly one of the probe row's two keys). DuckDB's plain
range-predicate join serves as the independent oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def self_range_join_forward(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    window_sec: int = 1800,
    id_col: str = "event_id",
) -> DataFrame:
    """Pairs (a, b) with equal ``key`` and ``a.ts < b.ts <= a.ts + window``.

    Returns (key, id_a, id_b, us_gap). The bucket id uses any consistent
    monotone second-granularity map of the timestamp — bucket ALIGNMENT is
    irrelevant, only the width matters for the adjacent-bucket guarantee —
    while the refine predicate compares the raw timestamps directly."""
    # TZ-FREE epoch microseconds (timeutil): session-TZ mappings
    # (unix_timestamp, and timestampdiff too — it routes NTZ through the
    # session zone) are non-monotone across DST transitions, which can push
    # a within-window pair >1 bucket apart and silently drop it
    from logspark.timeutil import ntz_epoch_us_sql

    base = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id"),
        F.col(ts).alias("t"),
    ).withColumn(
        "_us", F.expr(ntz_epoch_us_sql("t"))
    ).withColumn(
        "_b", F.floor(F.col("_us") / (window_sec * 1_000_000))
    )
    probe = base.select(
        "k",
        F.col("id").alias("id_b"),
        F.col("_us").alias("us_b"),
        F.explode(F.array(F.col("_b"), F.col("_b") - 1)).alias("_b"),
    )
    build = base.select(
        "k", F.col("id").alias("id_a"), F.col("_us").alias("us_a"), "_b"
    )
    cand = build.join(probe, ["k", "_b"])
    gap = F.col("us_b") - F.col("us_a")
    refined = cand.filter((gap > 0) & (gap <= window_sec * 1_000_000))
    return refined.select(
        F.col("k").alias(key),
        "id_a",
        "id_b",
        gap.alias("us_gap"),
    )
