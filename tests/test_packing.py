"""sequence packing: two-level prefix sum == naive global-window form."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from logspark import gen_sql, packing, pipeline


def _naive_pack(corpus, seq_len):
    d = F.expr("CAST(substr(doc_id, 5) AS BIGINT)")
    c = corpus.select(
        "doc_id",
        d.alias("d"),
        F.col("n_tok").cast("long").alias("n_tok"),
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    b = c.withColumn(
        "off", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
    ).withColumn("bin_id", F.expr(f"off div {seq_len}"))
    return b.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum(
            (F.col("off") - F.col("bin_id") * seq_len) * F.col("tok_sum")
        ).alias("pack_checksum"),
    )


import pytest


@pytest.mark.parametrize("chunk", [1, 37, 10_000])
def test_pack_matches_naive_and_conserves(spark, chunk):
    # chunk=1: every doc its own chunk (prefix entirely from the totals
    # cumsum); chunk=10k: single chunk (prefix entirely intra-window);
    # chunk=37: the mixed general case
    corpus = pipeline.build_corpus_df(spark, gen_sql.rel_from_range(300))
    got = sorted(
        packing.pack_bins(corpus, seq_len=512, chunk=chunk).collect()
    )
    want = sorted(_naive_pack(corpus, 512).collect())
    assert got == want
    # conservation: every doc lands in exactly one bin
    assert sum(r["n_docs"] for r in got) == 300
    assert sum(r["total_tokens"] for r in got) == (
        corpus.agg(F.sum("n_tok")).collect()[0][0]
    )
    # bins are contiguous and doc ranges never interleave
    by_bin = sorted(got, key=lambda r: r["bin_id"])
    assert [r["bin_id"] for r in by_bin] == list(range(len(by_bin)))
    for a, b in zip(by_bin, by_bin[1:]):
        assert a["last_doc"] < b["first_doc"]
