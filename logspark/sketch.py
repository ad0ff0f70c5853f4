"""KMV (k-minimum-values) distinct-count sketch — deterministic + portable.

Spark's approx_count_distinct (HLL++) and DuckDB's approx sketches use
different algorithms, so they can never cross-check each other. KMV over the
PORTABLE 32-bit hash (logspark.portable_hash: md5-derived, identical in both
engines) is fully deterministic: both engines compute the SAME sketch and
the SAME estimate, so the oracle check is exact — a sketch with value-level
cross-engine parity.

Estimator (Bar-Yossef et al. 2002): keep the k smallest distinct hash
values per group; if fewer than k distinct values exist the count is exact;
otherwise estimate (k-1) * 2^32 / h_k where h_k is the k-th smallest hash.

Scale shape: distinct (group, hash) is one hash-shuffle; the per-group
top-k is a window row_number (sort within partition) over ONLY the distinct
hashes; state per group is bounded by k — this is the point of a sketch:
memory O(k) per group regardless of group size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from logspark import portable_hash as ph

HASH_SPACE = 2**32


def kmv_distinct(
    df: DataFrame, group: str, col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV sketch + estimate. Returns
    (group, kmv_n, kmv_hk, kmv_estimate)."""
    # NULL values are excluded EXPLICITLY (COUNT DISTINCT semantics): a
    # NULL hash would otherwise rank first in Spark (NULLS FIRST) but last
    # in DuckDB, skewing kmv_n/h_k differently per engine
    h = (
        df.filter(F.col(col).isNotNull())
        .select(group, F.md5(F.col(col)).alias("_dg"))
        .withColumn("_h", F.expr(ph.hex32_from_digest_sql("_dg")))
        .select(group, "_h")
        .distinct()
    )
    w = W.partitionBy(group).orderBy("_h")
    topk = h.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    agg = topk.groupBy(group).agg(
        F.count("*").alias("kmv_n"), F.max("_h").alias("kmv_hk")
    )
    est = (
        F.when(F.col("kmv_n") < k, F.col("kmv_n").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)) / F.col("kmv_hk")
        )
    )
    return agg.select(
        group, "kmv_n", "kmv_hk", est.alias("kmv_estimate")
    )


def duck_kmv_sql(rel: str, group: str, col: str, k: int = 64) -> str:
    """DuckDB oracle for the same sketch (identical hashing + arithmetic)."""
    h32 = ph.hex32_from_digest_sql("_dg")
    return f"""
WITH h AS (
  SELECT DISTINCT {group}, {h32} AS _h
  FROM (SELECT {group}, md5({col}) AS _dg FROM {rel}
        WHERE {col} IS NOT NULL) d0),
topk AS (
  SELECT {group}, _h,
         row_number() OVER (PARTITION BY {group} ORDER BY _h) AS _rn
  FROM h),
agg AS (
  SELECT {group}, COUNT(*) AS kmv_n, MAX(_h) AS kmv_hk
  FROM topk WHERE _rn <= {k} GROUP BY {group})
SELECT {group}, kmv_n, kmv_hk,
  CASE WHEN kmv_n < {k} THEN CAST(kmv_n AS DOUBLE)
       ELSE {float(k - 1)} * {float(HASH_SPACE)} / kmv_hk END AS kmv_estimate
FROM agg"""
