"""Similarity search over embedding columns (array<float>, 64-dim).

Two paths (per-round brief):
  * brute-force cosine top-k — the exact baseline. Dot products are unrolled
    left-associative sums over element_at() so the DuckDB oracle computes
    bit-identical doubles (no reliance on engine-specific list_* kernels).
  * IVF-style bucketed ANN — sign-pattern of the first B dims as the coarse
    quantizer (2^B buckets); the probe only scans the query's bucket. At
    10^9+ vectors this is the shuffle-free scale path: bucket is a pure
    function of the row, so the table can be written bucketed/clustered by
    it and a probe prunes to one partition.

At 100TB the brute-force path stays useful as a final re-rank within
candidate buckets; Spark-side both are single narrow scans + TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIMS = 64


def _dot_sql(a: str, b: list[float] | str, dims: int = DIMS) -> str:
    """Unrolled left-assoc dot product (portable IEEE ordering)."""
    terms = []
    for i in range(1, dims + 1):
        if isinstance(b, str):
            rhs = f"CAST(element_at({b}, {i}) AS DOUBLE)"
        else:
            rhs = repr(float(b[i - 1]))
        terms.append(f"CAST(element_at({a}, {i}) AS DOUBLE) * {rhs}")
    return "(" + " + ".join(terms) + ")"


def _norm_sql(a: str, dims: int = DIMS) -> str:
    terms = [
        f"CAST(element_at({a}, {i}) AS DOUBLE) * CAST(element_at({a}, {i}) AS DOUBLE)"
        for i in range(1, dims + 1)
    ]
    return "sqrt(" + " + ".join(terms) + ")"


def duck_dot_sql(a: str, b: str, dims: int = DIMS) -> str:
    terms = [
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, dims + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def duck_norm_sql(a: str, dims: int = DIMS) -> str:
    terms = [
        f"CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE)"
        for i in range(1, dims + 1)
    ]
    return "sqrt(" + " + ".join(terms) + ")"


def cosine_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact top-k by cosine similarity to the embedding of query_vec_id.

    The query vector comes from the table itself (broadcast single-row cross
    join) so the DuckDB oracle reads the identical floats; the unrolled
    left-assoc dot keeps doubles bit-identical across engines.
    TakeOrderedAndProject (no full sort); deterministic vec_id tiebreak."""
    q = F.broadcast(
        emb.filter(F.col("vec_id") == query_vec_id).select(
            F.col("embedding").alias("qv")
        )
    )
    j = emb.crossJoin(q)
    sim = F.expr(_dot_sql("embedding", "qv")) / (
        F.expr(_norm_sql("embedding")) * F.expr(_norm_sql("qv"))
    )
    return (
        j.select("vec_id", "label", sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def sign_bucket_expr(col: str = "embedding", bits: int = 8):
    """IVF coarse quantizer: sign pattern of the first `bits` dims."""
    terms = [
        F.when(F.expr(f"CAST(element_at({col}, {i + 1}) AS DOUBLE)") > 0, 2**i).otherwise(0)
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("int")


def duck_sign_bucket_sql(col: str = "embedding", bits: int = 8) -> str:
    terms = [
        f"(CASE WHEN CAST({col}[{i + 1}] AS DOUBLE) > 0 THEN {2 ** i} ELSE 0 END)"
        for i in range(bits)
    ]
    return "CAST((" + " + ".join(terms) + ") AS INT)"


def ivf_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 5, bits: int = 8
) -> DataFrame:
    """ANN probe: scan only the query's sign bucket, exact rank inside."""
    q = F.broadcast(
        emb.filter(F.col("vec_id") == query_vec_id).select(
            F.col("embedding").alias("qv")
        )
    )
    bucketed = emb.withColumn("bucket", sign_bucket_expr("embedding", bits))
    cand = bucketed.crossJoin(q).filter(
        F.col("bucket") == sign_bucket_expr("qv", bits)
    )
    sim = F.expr(_dot_sql("embedding", "qv")) / (
        F.expr(_norm_sql("embedding")) * F.expr(_norm_sql("qv"))
    )
    return (
        cand.select("vec_id", "label", "bucket", sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def bucket_histogram(emb: DataFrame, bits: int = 8) -> DataFrame:
    """IVF bucket occupancy (skew diagnostics for the ANN index)."""
    return (
        emb.withColumn("bucket", sign_bucket_expr("embedding", bits))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )
