"""Z-order layout: the written files' parquet footer stats must be tight
on BOTH dimensions — the exact metadata a min/max-pruning reader (parquet
row-group skip, Iceberg/Delta file skip) consumes. Asserted directly from
the footers, against a row-hash baseline layout that cannot bound either
dimension."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from logspark import layout


def _per_file_spans(path: str, cols: tuple[str, str]) -> dict[str, float]:
    """Average (max-min) per file for each column, from footer stats."""
    spans = {c: [] for c in cols}
    files = sorted(glob.glob(path + "/*.parquet"))
    assert files
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(j).name for j in range(md.num_columns)]
        for c in cols:
            j = names.index(c)
            mn = min(md.row_group(i).column(j).statistics.min for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(j).statistics.max for i in range(md.num_row_groups))
            spans[c].append(mx - mn)
    return {c: sum(v) / len(v) for c, v in spans.items()}


@pytest.fixture(scope="module")
def two_dim_df(spark):
    # two independent pseudo-uniform dims over [0, 256)
    return spark.range(20000).select(
        ((F.col("id") * 2654435761) % 256).alias("a"),
        ((F.col("id") * 40503 + 7) % 256).alias("b"),
    )


def test_zorder_files_bound_both_dims(spark, two_dim_df, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zorder"))
    layout.write_zordered(two_dim_df, base + "/z", "a", "b", bits=8, files=16)
    two_dim_df.repartition(16).write.mode("overwrite").parquet(base + "/rand")

    z = _per_file_spans(base + "/z", ("a", "b"))
    r = _per_file_spans(base + "/rand", ("a", "b"))
    # 16 files over a 256x256 morton space -> contiguous z-ranges cover
    # ~64x64 tiles: both dims bounded well under half the global span
    assert z["a"] < 0.45 * 255 and z["b"] < 0.45 * 255, z
    # the row-hash baseline bounds NEITHER dim (spans stay ~global)
    assert r["a"] > 0.9 * 255 and r["b"] > 0.9 * 255, r
    # and the clustered layout is strictly tighter on both
    assert z["a"] < r["a"] / 2 and z["b"] < r["b"] / 2


def test_zorder_key_is_exact_interleave(spark):
    """The fold must equal the reference bit-interleave for arbitrary
    pairs (including the 0 and max-bits edges)."""
    rows = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (200, 13)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", layout.zorder_key_expr("a", "b", bits=8)
    )

    def ref(a, b):
        return sum(((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1) for i in range(8))

    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    assert got == {(a, b): ref(a, b) for a, b in rows}
