"""Fan-out per-sink writes: visits / downloads / outlinks / errors (+ignored).

Reference analog: row inserts into per-class MySQL counters (/root/reference/
models/declarative.py:33-42) — here the routed classes become partitioned
table writes (BASELINE.json north_star sinks).

Scale design:
  * ONE pass over the routed rows — ``partitionBy('sink')`` fan-out, never
    five filtered re-scans.
  * Write skew: ``visits`` is ~50% of rows (hot partition). We salt the
    physical write distribution with a bucket column derived from doc_id
    (pmod(xxhash64, k)) and repartition on (sink, bucket) so k tasks share
    each hot sink instead of one straggler (explicit skew handling per
    north_rule; AQE coalesces the small sinks' buckets).
  * Idempotent re-runs: dynamic partition overwrite — re-processing a
    partition replaces exactly its own files (parquet fallback for Iceberg's
    atomic overwritePartitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SINK_COLUMNS = [
    "doc_id",
    "source",
    "fmt",
    "route",
    "ip",
    "ts",
    "method",
    "path",
    "status",
    "nbytes",
    "referrer",
    "user_agent",
    "tokens",
    "n_tok",
]


def write_fanout(
    routed: DataFrame,
    out_dir: str,
    write_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    cols = [c for c in SINK_COLUMNS if c in routed.columns] + ["sink"]
    df = routed.select(*cols).withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(write_buckets)).cast("int")
    )
    (
        df.repartition("sink", "bucket")
        .write.partitionBy("sink")
        .mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(out_dir)
    )


def read_sink(spark: SparkSession, out_dir: str, sink: str) -> DataFrame:
    return spark.read.parquet(out_dir).filter(F.col("sink") == sink)
