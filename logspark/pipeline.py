"""End-to-end pipeline wiring: corpus -> detokenize -> parse -> enrich ->
route -> aggregate, with observe()-based counters and per-partition lineage.

This is the Spark-native re-expression of the reference's whole control loop
(SURVEY.md §3, E1/E2): what the reference reconstructed by parsing importer
stdout (/root/reference/libs/lib_summary.py:94-111) are first-class aggregates
here; what it tracked in MySQL control tables is an Iceberg/parquet checkpoint
table (logspark/control.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from logspark import gen_sql, parse, route, tokens


def build_corpus_df(
    spark: SparkSession, rel: str, with_token_arrays: bool = True
) -> DataFrame:
    """Materialize the deterministic corpus (doc_id, source, tokens, n_tok[,
    line]) from a portable-SQL relation (documents table or range())."""
    df = spark.sql(gen_sql.corpus_sql(rel)).select("doc_id", "source", "line")
    if with_token_arrays:
        df = tokens.with_tokens(df, "line").drop("line")
    return df


def detokenized(df: DataFrame, mode: str = "jvm", keep_tokens: bool = True) -> DataFrame:
    """Attach the reconstructed ``line`` column.

    Default is the pure-JVM expression codec: measured on the 4M-row corpus
    (32-core box, this sandbox), the whole-pipeline throughput is higher AND
    scales 0.84-0.87 efficiency from 8->32 cores, while the Arrow/Python
    boundary path saturates at ~8 cores (jstack shows Unsafe.copyMemory /
    ArrowWriter — the row<->Arrow copy chain is memory-bandwidth-bound).
    'arrow' remains the right choice for true BPE vocabularies where
    detokenization needs a Python-side lookup table.
    """
    if "line" in df.columns:
        return df
    if mode == "pandas":
        return df.withColumn("line", tokens.detokenize_pandas(F.col("tokens")))
    if mode == "jvm":
        return df.withColumn("line", tokens.detokenize_expr("tokens"))
    return tokens.detokenize_map_in_arrow(df, keep_tokens=keep_tokens)


def routed_hits(
    spark: SparkSession,
    corpus: DataFrame,
    detokenize_mode: str = "jvm",
    observation: Observation | None = None,
    keep_tokens: bool = True,
) -> DataFrame:
    """corpus(doc_id, source, tokens, n_tok) -> routed hit rows.

    Narrow pipeline: zero shuffles until the caller aggregates or writes.
    ``observation`` (if given) collects per-route counters in the SAME pass —
    the engine-native accumulator metrics required by north_rule.
    ``keep_tokens=False`` omits the token arrays from the routed output
    (aggregate-only consumers; halves the Arrow->JVM transfer).
    """
    df = detokenized(corpus, detokenize_mode, keep_tokens=keep_tokens)
    df = parse.parse_lines(df, "line")
    df = parse.enriched_ext_kind(df, spark)
    df = df.withColumn(
        "route",
        route.route_expr(
            F.col("parsed_ok"),
            F.col("status"),
            F.col("user_agent"),
            F.col("stem"),
            F.col("query"),
            F.col("source"),
            F.col("ts"),
            F.col("ext_kind"),
        ),
    ).withColumn("sink", route.sink_expr(F.col("route")))
    if observation is not None:
        df = df.observe(
            observation,
            F.count(F.lit(1)).alias("rows_total"),
            *[
                F.sum(F.when(F.col("route") == r, 1).otherwise(0)).alias(f"route_{r}")
                for r in route.ROUTES
            ],
        )
    return df


def partition_lineage(routed: DataFrame) -> DataFrame:
    """Per-partition lineage counts (north_rule): which physical partition
    produced how many rows of each route."""
    return (
        routed.groupBy(F.spark_partition_id().alias("partition_id"), "route")
        .agg(F.count("*").alias("cnt"))
        .orderBy("partition_id", "route")
    )


def run_counts(
    spark: SparkSession, corpus: DataFrame, detokenize_mode: str = "jvm"
) -> DataFrame:
    """The flagship aggregate: per-(source, route, sink) counts."""
    r = routed_hits(spark, corpus, detokenize_mode, keep_tokens=False)
    return (
        r.groupBy("source", "route", "sink")
        .agg(F.count("*").alias("cnt"))
        .orderBy("source", "route")
    )
