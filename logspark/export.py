"""Training-data delivery: deterministic hash-sharded export + manifest.

The last write of the pipeline: the curated/tokenized corpus is dealt into
``n_shards`` deterministic shards (portable hash of doc_id — re-runs and
backfills deal identically, no rand()) and written one file per shard, with
a MANIFEST the reader can verify offline: per-shard doc count, token count
and an order-free token checksum. This is the file-level accounting
discipline of the reference's per-file status rows (per-file line counts
verified after load, /root/reference/libs/lib_database.py:101-117) lifted
to shard manifests.

Scale shape: shard assignment is a narrow per-row map; the write is ONE
shuffle on the shard key (same 'partitioned' distribution as the sink
fan-out — bounded file count: exactly one file per shard directory), and
the manifest is the same single shuffle's aggregate. Shard count is chosen
by the operator (10^12 rows -> O(10k) shards of ~100M rows); the hash deal
keeps shards balanced regardless of source skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logspark import portable_hash as ph


def with_shard(corpus: DataFrame, n_shards: int = 64) -> DataFrame:
    """Append the deterministic shard id (pure doc_id map, never a join)."""
    return corpus.withColumn(
        "dg", F.md5(F.concat(F.lit("shard:"), F.col("doc_id")))
    ).withColumn(
        "shard", (F.expr(ph.hex32_from_digest_sql("dg")) % n_shards)
    ).drop("dg")


def manifest(corpus: DataFrame, n_shards: int = 64) -> DataFrame:
    """Per-shard accounting: docs, tokens, order-free token checksum."""
    d = with_shard(corpus, n_shards)
    return d.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tok").cast("long")).alias("n_tokens"),
        F.sum(
            F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x)
        ).alias("token_checksum"),
    )


def export_shards(
    corpus: DataFrame, out_dir: str, n_shards: int = 64
) -> DataFrame:
    """Write the sharded corpus (one file per shard directory) and return
    the manifest computed FROM THE INPUT; the test asserts the read-back
    equals it — write-path verification, reference lib_database.py:101-117."""
    d = with_shard(corpus, n_shards)
    (
        d.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    return manifest(corpus, n_shards)
