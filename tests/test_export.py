"""Sharded export: manifest == read-back accounting, one file per shard."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from logspark import export, gen_sql, pipeline


def test_export_shards_roundtrip(spark, tmp_path):
    corpus = pipeline.build_corpus_df(spark, gen_sql.rel_from_range(400))
    out = str(tmp_path / "shards")
    man = {r["shard"]: r for r in export.export_shards(corpus, out, n_shards=8).collect()}

    back = spark.read.parquet(out)
    got = {
        r["shard"]: r
        for r in back.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tok").cast("long")).alias("n_tokens"),
            F.sum(
                F.aggregate(
                    "tokens", F.lit(0).cast("long"), lambda a, x: a + x
                )
            ).alias("token_checksum"),
        )
        .collect()
    }
    assert set(got) == set(man)
    for shard, r in man.items():
        g = got[shard]
        assert (g["n_docs"], g["n_tokens"], g["token_checksum"]) == (
            r["n_docs"],
            r["n_tokens"],
            r["token_checksum"],
        )
    assert sum(r["n_docs"] for r in man.values()) == 400

    # bounded file count: exactly one parquet file per shard directory
    for d in glob.glob(os.path.join(out, "shard=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)

    # determinism: re-deal assigns identical shards
    a = export.with_shard(corpus, 8).select("doc_id", "shard")
    b = export.with_shard(corpus, 8).select("doc_id", "shard")
    assert a.exceptAll(b).isEmpty()
