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


def test_chunk_sequences_windows_cover_and_overlap(spark):
    # doc 1: 300 tokens -> chunks at starts 1, 97, 193 (ceil(172/96)=2, so
    # 3 windows); doc 2: 50 tokens -> one short chunk; doc 3: exactly 128
    # -> one full chunk
    rows = [
        (1, list(range(1, 301))),
        (2, list(range(1, 51))),
        (3, list(range(1, 129))),
    ]
    corpus = spark.createDataFrame(
        [(d, t, len(t)) for d, t in rows],
        "doc_id long, tokens array<int>, n_tok int",
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in packing.chunk_sequences(corpus).collect()
    }
    assert sorted(out) == [(1, 0), (1, 1), (1, 2), (2, 0), (3, 0)]
    # full middle window of doc 1: tokens 97..224, checksum = sum (96+j)*j
    mid = out[(1, 1)]
    assert (mid["chunk_start"], mid["chunk_n"]) == (97, 128)
    assert (mid["first_token"], mid["last_token"]) == (97, 224)
    assert mid["chunk_checksum"] == sum((96 + j) * j for j in range(1, 129))
    # tail window of doc 1 covers through the last token
    tail = out[(1, 2)]
    assert tail["chunk_start"] + tail["chunk_n"] - 1 == 300
    assert tail["last_token"] == 300
    # consecutive windows overlap by chunk_len - stride = 32 tokens
    assert mid["chunk_start"] - out[(1, 0)]["chunk_start"] == 96
    short = out[(2, 0)]
    assert (short["chunk_n"], short["first_token"], short["last_token"]) == (
        50,
        1,
        50,
    )
    assert out[(3, 0)]["chunk_n"] == 128
