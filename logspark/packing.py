"""Fixed-length training-sequence packing over the tokenized corpus.

The last mile of a pretraining data pipeline: documents (variable-length
token arrays) are packed, in deterministic corpus order, into fixed-length
training sequences of ``seq_len`` tokens. A document's bin is decided by
the number of tokens that precede it — a global prefix sum over the doc
order.

Scale design — the prefix sum is the whole problem. The naive form is ONE
global ordered window (``SUM(n_tok) OVER (ORDER BY d)``), which Spark
executes as a single-partition sort: a non-starter at 10^12 rows. We
compute the identical result as a two-level prefix sum:

  1. per-chunk totals   — groupBy ``d div chunk`` (table shrinks by the
     chunk factor; production chunk ~1M rows -> a ~10^6-row totals table
     from 10^12 docs),
  2. chunk prefix       — ordered cumsum over the SMALL totals table (the
     only ordered window, over metadata-sized input),
  3. broadcast back     — map-side join, no shuffle of the corpus,
  4. intra-chunk cumsum — window PARTITIONED by chunk (bounded partitions,
     shuffles on a balanced key).

Every number is integer math, so the DuckDB oracle (plain global-window
form) matches bit-for-bit; ``pack_checksum`` makes the comparison
order-sensitive: Σ offset_in_bin × tok_sum changes if any document lands
at a different offset.

Reference parity: generalizes the reference's sequential per-file offset
bookkeeping (progress summaries, /root/reference/libs/lib_summary.py:60-74)
from line space to token space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_bins(
    corpus: DataFrame, seq_len: int = 2048, chunk: int = 8192
) -> DataFrame:
    """Greedy in-order packing: doc d's bin = (tokens before d) div seq_len
    (a doc straddling a boundary belongs to the bin where it starts).

    Input: (doc_id, tokens:array<int>, n_tok) with doc_id = 'doc-' || d.
    Output per bin: n_docs, total_tokens, first/last doc, pack_checksum
    (Σ offset-in-bin × token-sum — order-sensitive evidence).
    """
    d = F.expr("CAST(substr(doc_id, 5) AS BIGINT)")
    c = corpus.select(
        "doc_id",
        d.alias("d"),
        F.col("n_tok").cast("long").alias("n_tok"),
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
    ).withColumn("cd", F.expr(f"d div {chunk}"))

    totals = c.groupBy("cd").agg(F.sum("n_tok").alias("chunk_tok"))
    w_chunks = Window.orderBy("cd").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.select(
        "cd",
        F.coalesce(F.sum("chunk_tok").over(w_chunks), F.lit(0))
        .cast("long")
        .alias("chunk_off"),
    )

    w_intra = (
        Window.partitionBy("cd")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        c.join(F.broadcast(prefix), "cd")
        .withColumn(
            "off",
            F.col("chunk_off")
            + F.coalesce(F.sum("n_tok").over(w_intra), F.lit(0)).cast("long"),
        )
        .withColumn("bin_id", F.expr(f"off div {seq_len}"))
    )
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum(
            (F.col("off") - F.col("bin_id") * seq_len) * F.col("tok_sum")
        ).alias("pack_checksum"),
    )


def chunk_sequences(
    corpus: DataFrame, chunk_len: int = 128, stride: int = 96
) -> DataFrame:
    """Sliding-window chunking of token arrays into fixed-length training
    windows with overlap (``chunk_len`` tokens, step ``stride``, so
    consecutive chunks share ``chunk_len - stride`` tokens of context) —
    the other standard sequence-shaping policy next to ``pack_bins``:
    packing concatenates short docs, chunking splits long ones. Every
    token position is covered; the final chunk may be short. Emits one
    row per chunk with an order-sensitive checksum (Σ token_j × j over
    the chunk) so the cross-engine comparison pins the exact token
    content and order of every window, not just counts.

    Reference parity: the reference replays files in fixed-size line
    batches (import loop, /root/reference/proc/load_logs.py) — this is
    the same windowing contract lifted to token space.

    Scale shape: zero shuffles. The per-doc chunk count is explode of a
    bounded sequence (``1 + ceil((n_tok - chunk_len)/stride)``), the
    slice/zip_with/aggregate HOFs are narrow JVM expressions, and no
    stage needs global order — chunk identity is (doc_id, chunk_idx),
    not a corpus-wide offset. 10^12 docs chunk embarrassingly parallel."""
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.col("n_tok") - chunk_len, F.lit(0)) / float(stride)
    ).cast("int")
    d = corpus.filter(F.col("n_tok") >= 1).select(
        "doc_id",
        "tokens",
        "n_tok",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.lit(1) + F.col("chunk_idx") * stride
    n = F.least(F.lit(chunk_len), F.col("n_tok") - F.col("chunk_idx") * stride)
    d = d.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("chunk_start"),
        n.cast("int").alias("chunk_n"),
        F.slice("tokens", start, n).alias("chunk"),
    )
    checksum = F.aggregate(
        F.zip_with(
            "chunk",
            F.sequence(F.lit(1), F.col("chunk_n")),
            lambda x, j: x.cast("long") * j,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return d.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        "chunk_n",
        F.element_at("chunk", 1).alias("first_token"),
        F.element_at("chunk", F.col("chunk_n")).alias("last_token"),
        checksum.alias("chunk_checksum"),
    )


LENGTH_BUCKET_EDGES = [16, 32, 64, 128, 256, 512]


def length_buckets(corpus: DataFrame) -> DataFrame:
    """Padded-batch length-bucketing readout: assign every sequence to the
    smallest power-of-two bucket >= n_tok and report, per bucket, the
    sequence count, real token count, padded token count (n_seqs x
    bucket_len) and the padding waste — the numbers that decide between
    bucketed padding and sequence_pack-style concatenation for a training
    run (dynamic-batching fertility, the same readout HF's
    group_by_length / length-grouped samplers optimize against).
    Sequences longer than the top edge land in bucket_len = -1
    ("chunk-first": they go through chunk_sequences before batching, so
    their padded cost is counted as 0, not a fictitious giant bucket).

    Shape: a pure CASE map over n_tok then ONE bounded-key (<=7 buckets)
    map-side-combined aggregate — zero joins, no corpus shuffle beyond
    the 7-row rollup. Integer math only."""
    edges = LENGTH_BUCKET_EDGES
    bucket = F.expr(
        "CASE "
        + " ".join(
            f"WHEN n_tok <= {e} THEN {e}" for e in edges
        )
        + " ELSE -1 END"
    )
    b = corpus.select(F.col("n_tok").cast("long").alias("n_tok"), bucket.alias("bucket_len"))
    return (
        b.groupBy("bucket_len")
        .agg(
            F.count("*").alias("n_seqs"),
            F.sum("n_tok").alias("real_tok"),
        )
        .select(
            "bucket_len",
            "n_seqs",
            "real_tok",
            F.expr(
                "IF(bucket_len = -1, CAST(0 AS BIGINT), bucket_len * n_seqs)"
            ).alias("padded_tok"),
            F.expr(
                "IF(bucket_len = -1, CAST(0 AS BIGINT), bucket_len * n_seqs - real_tok)"
            ).alias("waste_tok"),
        )
    )
