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
    """Dot product as a higher-order fold (Spark side).

    aggregate() folds left starting at 0.0, so the IEEE association order is
    ((0.0 + t1) + t2) + ... == t1 + t2 + ... — bit-identical to the DuckDB
    oracle's unrolled left-assoc sum (duck_dot_sql). Round 1 unrolled this
    into 64 explicit terms, which blew Janino's 64 KB method limit and
    silently dropped the whole stage to interpreted mode; the fold keeps the
    expression tree tiny (the HOF loop evaluates off-codegen, the REST of
    the stage stays whole-stage-codegen'd)."""
    rhs = b if isinstance(b, str) else (
        "array(" + ", ".join(repr(float(x)) for x in b) + ")"
    )
    return (
        f"aggregate(zip_with({a}, {rhs}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm_sql(a: str, dims: int = DIMS) -> str:
    """L2 norm via the same left fold (see _dot_sql for bit-equality)."""
    return (
        f"sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), "
        f"(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


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
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qv"))
        .withColumn("qn", F.expr(_norm_sql("qv")))
    )
    j = emb.crossJoin(q)
    # query norm is hoisted INTO the broadcast side (computed once, not per
    # scanned row); the scanned row's norm is necessarily per-row. Values
    # are identical wherever computed, so the oracle needs no change.
    sim = F.expr(_dot_sql("embedding", "qv")) / (
        F.expr(_norm_sql("embedding")) * F.col("qn")
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
    """ANN probe over an UNINDEXED corpus: compute every row's sign bucket
    in the scan, keep only the query's bucket, exact rank inside. The
    query's own bucket is hoisted INTO the broadcast side (computed once,
    not re-derived per scanned row). This form still scans all vectors —
    it is the oracle-checkable semantics; the scale path is
    build_ivf_index + ivf_topk_indexed, where the same bucket function is
    a physical partition key and the probe prunes at file listing."""
    q = F.broadcast(
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qv"))
        .withColumn("qn", F.expr(_norm_sql("qv")))
        .withColumn("qb", sign_bucket_expr("qv", bits))
    )
    bucketed = emb.withColumn("bucket", sign_bucket_expr("embedding", bits))
    cand = bucketed.crossJoin(q).filter(F.col("bucket") == F.col("qb"))
    sim = F.expr(_dot_sql("embedding", "qv")) / (
        F.expr(_norm_sql("embedding")) * F.col("qn")
    )
    return (
        cand.select("vec_id", "label", "bucket", sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def sign_bucket_py(vec, bits: int = 8) -> int:
    """Python mirror of sign_bucket_expr — the probe side of the IVF index
    computes the query's bucket CLIENT-SIDE (it is a pure function of the
    query vector), so the index scan can carry a literal partition filter."""
    return sum(1 << i for i in range(bits) if float(vec[i]) > 0)


def build_ivf_index(emb: DataFrame, path: str, bits: int = 8) -> None:
    """Materialize the IVF index: the corpus physically PARTITIONED by the
    sign bucket (one directory per bucket, hive-style `bucket=<id>`).

    This is what makes the probe's docstring claim REAL: `bucket` is a pure
    row function, so writing the table clustered by it turns every probe
    into a partition-pruned scan — file listing skips all other buckets and
    the executed plan shows the literal in PartitionFilters (pinned by
    tests/test_plans.py). Iceberg analog: a `bucket`/identity partition
    transform in the table spec + the same literal predicate. The
    repartition bounds files to one per bucket directory."""
    (
        emb.withColumn("bucket", sign_bucket_expr("embedding", bits))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark,
    index_path: str,
    query_vec,
    k: int = 5,
    bits: int = 8,
) -> DataFrame:
    """Probe a build_ivf_index table: the query's bucket is computed
    client-side (sign_bucket_py), so the scan carries a LITERAL partition
    filter and reads exactly one `bucket=` directory regardless of corpus
    size — the 10^9-vector serving shape. Exact cosine rank inside the
    bucket; same tie-break and fold arithmetic as ivf_topk, so on the same
    data the two return identical rows."""
    qb = sign_bucket_py(query_vec, bits)
    qn = sum(float(x) * float(x) for x in query_vec) ** 0.5
    scan = spark.read.parquet(index_path).filter(F.col("bucket") == qb)
    sim = F.expr(_dot_sql("embedding", [float(x) for x in query_vec])) / (
        F.expr(_norm_sql("embedding")) * F.lit(qn)
    )
    return (
        scan.select("vec_id", "label", "bucket", sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def multiprobe_buckets_py(vec, bits: int = 8) -> list[int]:
    """The query's sign bucket plus its ``bits`` Hamming-distance-1
    neighbors (one sign bit flipped each) — the standard multi-probe
    LSH schedule (Lv et al., VLDB 2007): a vector near a bucket boundary
    on dimension i lands in the bucket that differs only in bit i, so
    probing the 1-flip neighbors recovers exactly those boundary misses."""
    qb = sign_bucket_py(vec, bits)
    return [qb] + [qb ^ (1 << i) for i in range(bits)]


def ivf_topk_indexed_multiprobe(
    spark,
    index_path: str,
    query_vec,
    k: int = 5,
    bits: int = 8,
) -> DataFrame:
    """Multi-probe serving path over a build_ivf_index table: probe the
    query's bucket AND its Hamming-1 neighbors (multiprobe_buckets_py) —
    the recall-vs-cost knob of sign-LSH ANN. Single-bucket probing misses
    a true neighbor whenever one of its first ``bits`` components sits on
    the other side of zero from the query's; each 1-bit flip recovers one
    such boundary, so this reads (bits+1)/2^bits of the corpus (9/256
    directories at bits=8) instead of 1/2^bits, for strictly higher
    recall at a bounded, still partition-pruned cost — the IN-list of
    literal bucket ids is resolved at file listing time exactly like the
    single-bucket probe's equality filter (pinned in tests/test_plans.py).
    Same fold arithmetic and (cosine, vec_id) tie-break as every other
    probe, so results are bit-identical cross-engine; the DuckDB oracle
    states the probe set independently as bit_count(xor(bucket(e),
    bucket(q))) <= 1 rather than trusting this function's bucket list."""
    probes = multiprobe_buckets_py(query_vec, bits)
    qn = sum(float(x) * float(x) for x in query_vec) ** 0.5
    scan = spark.read.parquet(index_path).filter(F.col("bucket").isin(probes))
    sim = F.expr(_dot_sql("embedding", [float(x) for x in query_vec])) / (
        F.expr(_norm_sql("embedding")) * F.lit(qn)
    )
    return (
        scan.select("vec_id", "label", "bucket", sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def batch_topk_bucketed(
    emb: DataFrame, n_queries: int = 16, k: int = 5, bits: int = 8
) -> DataFrame:
    """Batch ANN serving: EVERY query probes in ONE bucket equi-join.

    The single-query probes (ivf_topk / ivf_topk_indexed) answer one vector
    per job; the production shapes — dedup-against-index, retrieval-augmented
    scoring, embedding-join between two corpora — arrive with MILLIONS of
    query vectors at once. Issuing per-query scans would be Q jobs; the batch
    form is one plan: both sides compute the same coarse sign bucket, a hash
    equi-join on (bucket == qb) restricts scoring to same-bucket candidates
    (the IVF pruning, expressed relationally), and a per-query window rank
    keeps top-k. Here the query side (n_queries rows) is broadcast, so the
    corpus never shuffles for the join; at large Q the IDENTICAL logical plan
    degrades gracefully to a shuffled equi-join where each side exchanges on
    the bucket key once — still never all-pairs. The only other exchange is
    the candidate-set-sized window partition on q_id.

    Same fold arithmetic (_dot_sql left fold) and (cosine DESC, vec_id) rank
    tie-break as every other probe, so results are bit-identical to the
    DuckDB oracle's unrolled-sum ROW_NUMBER form. Self-matches excluded
    (vec_id != q_id) as in ann_recall_eval.
    """
    from pyspark.sql.window import Window

    q = F.broadcast(
        emb.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
        .withColumn("qn", F.expr(_norm_sql("qv")))
        .withColumn("qb", sign_bucket_expr("qv", bits))
    )
    bucketed = emb.withColumn("bucket", sign_bucket_expr("embedding", bits))
    cand = bucketed.join(
        q, (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("q_id"))
    )
    sim = F.expr(_dot_sql("embedding", "qv")) / (
        F.expr(_norm_sql("embedding")) * F.col("qn")
    )
    scored = cand.select("q_id", "vec_id", "label", sim.alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


def hard_negatives(
    emb: DataFrame, n_queries: int = 16, k: int = 5, bits: int = 8
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most-similar vectors with a DIFFERENT label — the
    near-misses a bi-encoder trains against (DPR / SimCSE-style negative
    mining). Identical physical shape to batch_topk_bucketed — one bucket
    equi-join with the broadcast query side, per-query window rank — with
    the label-mismatch predicate folded into the join condition, so
    same-label rows are dropped BEFORE any scoring (at 100 TB the mislabel
    filter is join-time pruning, not a post-filter over scored pairs).

    Same fold arithmetic and (cosine DESC, vec_id) tie-break as every
    other probe — bit-identical to the DuckDB oracle."""
    from pyspark.sql.window import Window

    q = F.broadcast(
        emb.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qv"),
            F.col("label").alias("q_label"),
        )
        .withColumn("qn", F.expr(_norm_sql("qv")))
        .withColumn("qb", sign_bucket_expr("qv", bits))
    )
    bucketed = emb.withColumn("bucket", sign_bucket_expr("embedding", bits))
    cand = bucketed.join(
        q,
        (F.col("bucket") == F.col("qb"))
        & (F.col("vec_id") != F.col("q_id"))
        & (F.col("label") != F.col("q_label")),
    )
    sim = F.expr(_dot_sql("embedding", "qv")) / (
        F.expr(_norm_sql("embedding")) * F.col("qn")
    )
    scored = cand.select(
        "q_id", "q_label", "vec_id", "label", sim.alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


def band_bucket_expr(col: str, band: int, bits_per_band: int):
    """Sign pattern of dims [band*r, band*r + r) as an int bucket id."""
    r = bits_per_band
    terms = [
        F.when(
            F.expr(f"CAST(element_at({col}, {band * r + i + 1}) AS DOUBLE)") > 0,
            2**i,
        ).otherwise(0)
        for i in range(r)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("int")


def duck_band_bucket_sql(col: str, band: int, bits_per_band: int) -> str:
    r = bits_per_band
    terms = [
        f"(CASE WHEN CAST({col}[{band * r + i + 1}] AS DOUBLE) > 0 "
        f"THEN {2 ** i} ELSE 0 END)"
        for i in range(r)
    ]
    return "CAST((" + " + ".join(terms) + ") AS INT)"


def neardup_exact(
    emb: DataFrame, threshold: float = 0.45, max_rows: int = 1_000_000
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact O(n^2) baseline.

    Broadcast-nested-loop self-join on vec_id ordering; only viable as a
    final re-rank / small-partition step at scale — the banded variant
    (neardup_pairs) is the 10^9-vector path. Analog of the dedup family
    the reference's pipeline implies for training corpora (per-round brief);
    no counterpart in /root/reference (it has no vector ops at all).

    HARD CEILING: the whole table is broadcast — 64 dims x 8B + row
    overhead is ~600B/row, so 1M rows is already ~0.6 GB in EVERY
    executor (and n^2/2 = 5*10^11 comparisons). ``max_rows`` guards the
    broadcast with one cheap count and raises instead of OOM-ing the
    executors; pass a larger value only for a deliberately-sized re-rank
    slice. Corpus-scale runs belong to neardup_pairs.

    Execution is an Arrow-vectorized BLOCK "matmul": the full table is
    broadcast (exactly what Spark's own broadcast join does — driver
    collect + torrent broadcast, bounded here by ``max_rows``) and each
    streamed Arrow batch scores its rows against the broadcast matrix in
    numpy. Crucially the reduction over dims is a SEQUENTIAL python loop
    (vectorized across the PAIR axis, scalar across the 64 dims), i.e.
    acc = (acc + a_i*b_i) in IEEE order — the identical left fold to
    _dot_sql's aggregate() and the DuckDB oracle's unrolled sum, so the
    cosines are bit-for-bit equal across all three (np.dot's pairwise/SIMD
    summation would NOT be). Measured at 2k vectors x 64 dims (2M pairs):
    interpreted HOF-per-pair 25s -> 0.9s vectorized.
    """
    import numpy as np
    import pandas as pd

    rows = emb.select("vec_id", "embedding").na.drop()
    n = rows.count()
    if n > max_rows:
        raise ValueError(
            f"neardup_exact is the O(n^2) BROADCAST baseline: {n} rows "
            f"exceeds max_rows={max_rows} (~{600 * n >> 20} MiB broadcast "
            "per executor). Use neardup_pairs (banded sign-LSH) at scale, "
            "or raise max_rows for a deliberately-sized re-rank slice."
        )
    spark = emb.sparkSession
    sc = spark.sparkContext
    collected = rows.collect()
    ids_b = np.array([r["vec_id"] for r in collected], dtype=np.int64)
    B = np.array([r["embedding"] for r in collected], dtype=np.float64)
    nb = np.zeros(len(ids_b))
    for i in range(B.shape[1]):  # sequential over dims: fold-order norms
        nb += B[:, i] * B[:, i]
    nb = np.sqrt(nb)
    bc = sc.broadcast((ids_b, B, nb))
    # bound the m x n accumulator to ~80 MB per block regardless of n
    block = max(1, 10_000_000 // max(1, len(ids_b)))

    def score(batches):
        ids_all, Bm, nbv = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            for s in range(0, len(pdf), block):
                chunk = pdf.iloc[s : s + block]
                A = np.stack(chunk["embedding"].to_numpy()).astype(
                    np.float64, copy=False
                )
                ids_a = chunk["vec_id"].to_numpy(dtype=np.int64)
                m = len(ids_a)
                acc = np.zeros((m, len(ids_all)))
                na = np.zeros(m)
                for i in range(A.shape[1]):  # dim-sequential = exact fold
                    ai = A[:, i]
                    na += ai * ai
                # Cache-blocked over the BROADCAST axis: the naive form
                # (acc += outer(ai, b_i) per dim) allocates a fresh
                # acc-sized temporary 64x and streams the whole 80 MB
                # accumulator through RAM every dim — bandwidth-bound and
                # hostile to co-tenants (16 s vs 26 s run spread at sf0.1).
                # Working on a ~cache-sized acc column slice with ONE
                # reused temporary keeps each element's accumulation order
                # dim-sequential (blocking never reorders a single acc
                # element's fold), so cosines stay bit-identical to the
                # oracle's unrolled left fold.
                cblock = max(256, 2_000_000 // (8 * max(1, m)))
                for cs in range(0, len(ids_all), cblock):
                    ce = min(cs + cblock, len(ids_all))
                    accb = acc[:, cs:ce]
                    Bb = Bm[cs:ce]
                    tmp = np.empty_like(accb)
                    for i in range(A.shape[1]):
                        np.multiply(A[:, i : i + 1], Bb[:, i][None, :], out=tmp)
                        accb += tmp
                cos = acc / (np.sqrt(na)[:, None] * nbv[None, :])
                keep = (cos > threshold) & (ids_a[:, None] < ids_all[None, :])
                ia, ib = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "id_a": ids_a[ia],
                        "id_b": ids_all[ib],
                        "cosine": cos[ia, ib],
                    }
                )

    out_schema = "id_a long, id_b long, cosine double"
    streamed = rows.repartition(sc.defaultParallelism)
    return streamed.mapInPandas(score, schema=out_schema)


def semantic_dedup_pairs(
    emb: DataFrame, k: int = 64, threshold: float = 0.45, max_bucket: int = 8192
) -> DataFrame:
    """SemDeDup-style CLUSTER-BUCKETED semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): assign every vector to its nearest of k centroids,
    then search for near-duplicate pairs ONLY within a cluster — the third
    scale path for embedding dedup next to global sign-LSH banding
    (neardup_pairs) and the guarded exact arm (neardup_exact). No
    counterpart in /root/reference (it has no vector ops).

    Scale shape: the assignment is the shuffle-free broadcast array-argmin
    of _assign_best; the ONLY corpus shuffle is the groupBy(cid) exchange,
    and the quadratic work is bounded per bucket — pick k proportional to
    n / target_bucket_size so buckets stay cache-sized (SemDeDup runs
    k=50k for 5B embeddings). ``max_bucket`` hard-guards the per-group
    pandas materialization: a skewed cluster raises with guidance instead
    of silently going quadratic (the fix is a larger k, not salting —
    splitting a cluster changes which pairs are comparable). Recall
    tradeoff vs the global paths is the operator's semantics, not a bug:
    cross-cluster near-dups are deliberately out of scope (the paper's
    argument: semantic duplicates land in the same cluster at tight
    thresholds).

    Arithmetic is the fold-order-exact block pattern of neardup_exact —
    per-pair dot/norm accumulated dim-sequentially in numpy, so every
    cosine is bit-identical to the DuckDB unrolled left-fold oracle, and
    the emitted pair set is exactly reproducible at any parallelism.
    Output: (cid, id_a, id_b, cosine) with id_a < id_b.
    """
    import numpy as np
    import pandas as pd

    cent = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    assigned = _assign_best(emb.select("vec_id", "embedding").na.drop(), cent)

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "cid": np.array([], dtype=np.int64),
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
                "cosine": np.array([], dtype=np.float64),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        if n > max_bucket:
            raise ValueError(
                f"semantic_dedup_pairs: cluster {int(pdf['cid'].iloc[0])} has "
                f"{n} members > max_bucket={max_bucket} (the n^2 accumulator "
                f"would be ~{8 * n * n >> 20} MiB). Increase k so buckets "
                "shrink; do not salt — splitting a cluster changes which "
                "pairs are comparable."
            )
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64, copy=False)
        acc = np.zeros((n, n))
        nn = np.zeros(n)
        for i in range(M.shape[1]):  # dim-sequential = exact left fold
            mi = M[:, i]
            acc += mi[:, None] * mi[None, :]
            nn += mi * mi
        norm = np.sqrt(nn)
        cos = acc / (norm[:, None] * norm[None, :])
        keep = (cos > threshold) & (ids[:, None] < ids[None, :])
        ia, ib = np.nonzero(keep)
        if not len(ia):
            return empty
        return pd.DataFrame(
            {
                "cid": np.full(len(ia), np.int64(pdf["cid"].iloc[0])),
                "id_a": ids[ia],
                "id_b": ids[ib],
                "cosine": cos[ia, ib],
            }
        )

    return assigned.groupBy("cid").applyInPandas(
        bucket_pairs, schema="cid long, id_a long, id_b long, cosine double"
    )


def neardup_pairs(
    emb: DataFrame,
    bands: int = 4,
    bits_per_band: int = 4,
    threshold: float = 0.45,
) -> DataFrame:
    """Banded sign-LSH near-duplicate pairs — the shuffle-scalable path.

    Each vector gets `bands` bucket ids (sign pattern of r consecutive
    dims); a pair is a candidate iff ANY band bucket matches (OR-of-ANDs,
    same shape as MinHash LSH banding in logspark/textops.py). Candidates
    are found by an equi-join on (band, bucket) — a plain hash shuffle that
    partitions evenly at any scale — then deduped to distinct id pairs and
    exact-cosine filtered. No O(n^2) stage anywhere.
    """
    tall = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        band_bucket_expr("embedding", k, bits_per_band).alias(
                            "bucket"
                        ),
                    )
                    for k in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.bucket")
    cand = (
        tall.alias("a")
        .join(tall.alias("b"), ["band", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    ).withColumn("na", F.expr(_norm_sql("ea")))
    eb = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")
    ).withColumn("nb", F.expr(_norm_sql("eb")))
    # norms hoisted below the verify join: n evaluations, not |candidates|
    cos = F.expr(_dot_sql("ea", "eb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") > threshold)
    )


def bucket_histogram(emb: DataFrame, bits: int = 8) -> DataFrame:
    """IVF bucket occupancy (skew diagnostics for the ANN index)."""
    return (
        emb.withColumn("bucket", sign_bucket_expr("embedding", bits))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def ann_recall_eval(
    emb: DataFrame, n_queries: int = 20, k: int = 10, bits: int = 8
) -> DataFrame:
    """Recall@k of the IVF probe against exact brute force, per query —
    the evaluation harness every ANN index needs before it gates a
    production retrieval path.

    For each of the first ``n_queries`` vectors (used as queries, self
    excluded): the exact cosine top-k over the whole corpus vs the IVF
    top-k restricted to the query's sign bucket; recall = |overlap| /
    |exact|. Scale shape: queries are a BROADCAST (tiny), the corpus is
    scanned once and scored against all queries (the exact arm is
    inherently O(Q*n) — an eval op you run on a query SAMPLE, not a
    serving path); per-query ranking is a window over q_id. Determinism:
    ties broken by vec_id, similarities bit-identical cross-engine via
    the left-assoc fold (see _dot_sql)."""
    from pyspark.sql.window import Window

    q = F.broadcast(
        emb.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
        .withColumn("qn", F.expr(_norm_sql("qv")))
        .withColumn("qb", sign_bucket_expr("qv", bits))
    )
    b = emb.withColumn("bucket", sign_bucket_expr("embedding", bits)).withColumn(
        "nb", F.expr(_norm_sql("embedding"))
    )
    sim = F.expr(_dot_sql("embedding", "qv")) / (F.col("nb") * F.col("qn"))
    scored = (
        b.crossJoin(q)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "bucket", "qb", sim.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    exact = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id")
    )
    ivf = (
        scored.filter(F.col("bucket") == F.col("qb"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id")
    )
    ne = exact.groupBy("q_id").agg(F.count("*").alias("n_exact"))
    ni = ivf.groupBy("q_id").agg(F.count("*").alias("n_ivf"))
    nh = (
        exact.join(ivf, ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        ne.join(ni, "q_id", "left")
        .join(nh, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            F.coalesce("n_ivf", F.lit(0)).alias("n_ivf"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_exact")
            ).alias("recall"),
        )
    )


def _qscales_agg(emb: DataFrame) -> DataFrame:
    """Per-dimension int8 quantization scales: s_d = max(|x_d|) over the
    corpus, as ONE 64-column map-side-combinable aggregation (no explode,
    no shuffle of the vectors — each task reduces to a single row). max
    SELECTS a value rather than computing one, so the scales are exact
    doubles both engines agree on."""
    cols = [
        F.max(F.abs(F.expr(f"CAST(element_at(embedding, {i + 1}) AS DOUBLE)")))
        for i in range(DIMS)
    ]
    return emb.agg(F.array(*cols).alias("scales"))


def quantize_code_sql(col: str, scales: str = "scales") -> str:
    """int8 code array: floor(x / s * 127) per dim (0 where s = 0).

    x/s is in [-1, 1] by construction (s is the corpus max |x|), so codes
    land in [-127, 127] with no clamp. ONE divide and ONE multiply in
    fixed order then floor — deliberately floor, not round: round's
    half-tie rule is engine-defined, floor is not. The fold stays tiny
    (HOF), the rest of the stage stays codegen'd."""
    return (
        f"zip_with({col}, {scales}, "
        f"(x, s) -> IF(s = CAST(0.0 AS DOUBLE), CAST(0 AS BIGINT), "
        f"CAST(floor(CAST(x AS DOUBLE) / s * 127.0) AS BIGINT)))"
    )


def duck_qcode_sql(elem: str, scale: str) -> str:
    return (
        f"CASE WHEN {scale} = 0.0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(FLOOR(CAST({elem} AS DOUBLE) / {scale} * 127.0) "
        f"AS BIGINT) END"
    )


def duck_scales_list_sql(dims: int = DIMS) -> str:
    return (
        "["
        + ", ".join(
            f"MAX(ABS(CAST(embedding[{i + 1}] AS DOUBLE)))"
            for i in range(dims)
        )
        + "]"
    )


def duck_qdot_sql(a: str, b: str, scales: str, dims: int = DIMS) -> str:
    """Integer dot product of two int8-code arrays, unrolled per dim.
    Each term is code(a[i], s[i]) * code(b[i], s[i]); integer addition is
    associative-exact, so unlike the float folds no association-order
    discipline is needed — any grouping matches Spark bit-for-bit."""
    return " + ".join(
        f"({duck_qcode_sql(f'{a}[{i + 1}]', f'{scales}[{i + 1}]')}) * "
        f"({duck_qcode_sql(f'{b}[{i + 1}]', f'{scales}[{i + 1}]')})"
        for i in range(dims)
    )


def quantize_stats(emb: DataFrame) -> DataFrame:
    """Per-dimension int8 scalar-quantization report: scale, saturated-code
    count (|code| = 127 — the distribution tail each dim clips at), code
    sum and range. The calibration artifact a 100 TB embedding store ships
    with its quantized index: 4x smaller vectors, integer SIMD dot
    products at probe time (cf. FAISS SQ8 / Milvus scalar quantization).

    Shape: scales are one 64-column agg (broadcast back, 1 row); the
    per-dim rollup explodes codes but groups on 64 keys, so map-side
    combine collapses every task to <= 64 rows before the only shuffle."""
    j = emb.crossJoin(F.broadcast(_qscales_agg(emb)))
    e = j.select(
        F.col("scales"),
        F.posexplode(F.expr(quantize_code_sql("embedding"))).alias(
            "pos", "code"
        ),
    )
    return (
        e.select(
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.expr(
                "CAST(element_at(scales, CAST(pos + 1 AS INT)) AS DOUBLE)"
            ).alias("scale"),
            "code",
        )
        .groupBy("dim", "scale")
        .agg(
            F.sum(
                F.when(F.abs(F.col("code")) == 127, 1).otherwise(0)
            ).alias("n_saturated"),
            F.sum("code").alias("sum_code"),
            F.min("code").alias("min_code"),
            F.max("code").alias("max_code"),
        )
    )


def quantized_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """ANN top-k over int8-quantized vectors: rank by the INTEGER dot
    product of the stored code arrays — the asymmetric-distance probe of
    a scalar-quantized index (4x less IO than float32, integer math in
    the scan). Integer sums are order-free, so unlike the float cosine
    path this ranking needs no association-order discipline at all —
    bit-exact cross-engine by construction.

    Shape: scales (1 row) and the query's code (1 row) broadcast; the
    scan computes one code array + one integer fold per row, then
    TakeOrderedAndProject — no shuffle, no sort."""
    s = _qscales_agg(emb)
    q = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qv"))
        .crossJoin(F.broadcast(s))
        .select(F.expr(quantize_code_sql("qv")).alias("qcode"), "scales")
    )
    j = emb.crossJoin(F.broadcast(q))
    dot = F.expr(
        "aggregate(zip_with("
        + quantize_code_sql("embedding")
        + ", qcode, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return (
        j.select("vec_id", "label", dot.alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc("vec_id"))
        .limit(k)
    )


PQ_M = 8  # subspaces
PQ_SUBDIM = DIMS // PQ_M  # dims per subspace
PQ_K = 16  # codewords per subspace


def _dist2_span_sql(a: str, b: str, start: int, width: int) -> str:
    """Subspace squared-L2: the same left fold as _dist2_sql restricted to
    ``width`` dims beginning at 1-based ``start`` (slice() is 1-based)."""
    return (
        f"aggregate(zip_with(slice({a}, {start}, {width}), "
        f"slice({b}, {start}, {width}), "
        f"(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def duck_dist2_span_sql(a: str, b: str, start: int, width: int) -> str:
    """DuckDB replay of _dist2_span_sql: unrolled left-assoc sum over dims
    [start, start+width) — bit-identical association order to the fold."""
    terms = [
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE)) * "
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        for i in range(start, start + width)
    ]
    return "(" + " + ".join(terms) + ")"


def _pq_codebook_row(emb: DataFrame, k: int = PQ_K) -> DataFrame:
    """The PQ codebook as ONE broadcastable row: codeword c of every
    subspace is vec_id=c's vector (deterministic, training-free — the
    same seeding trick as kmeans_assign), collapsed to a sorted array of
    (cid, cvec) structs. k*DIMS floats total — bytes, not a shuffle."""
    return (
        emb.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
        .groupBy()
        .agg(
            F.sort_array(F.collect_list(F.struct("cid", "cvec"))).alias("_cb")
        )
    )


def _pq_code_expr(m: int, col: str = "embedding") -> str:
    """int code of subspace m (0-based): argmin over the k codewords of the
    subspace squared-L2, ties to the smaller cid — array_min over
    (dist2, cid) structs, a pure row function over the broadcast _cb."""
    d = _dist2_span_sql(col, "c.cvec", m * PQ_SUBDIM + 1, PQ_SUBDIM)
    return (
        f"array_min(transform(_cb, c -> "
        f"struct({d} AS d, c.cid AS cid))).cid"
    )


def pq_code_histogram(emb: DataFrame) -> DataFrame:
    """Product-quantization code assignment + codebook occupancy report:
    every vector is compressed to PQ_M int codes (one per PQ_SUBDIM-dim
    subspace, argmin squared-L2 over PQ_K deterministic codewords — the
    FAISS IVFPQ layout, 64 float32 dims -> 8 bytes), and the output is the
    per-(subspace, code) member count + vec_id range: the codebook-balance
    readout a 100 TB vector store uses to detect dead/overloaded codewords
    before committing to a codebook.

    Scale shape: the codebook is one broadcast row (k*DIMS floats); code
    assignment is a pure row function (zero shuffles); the explode emits
    PQ_M rows per vector but groups on <= PQ_M*PQ_K = 128 keys, so map-side
    combine collapses every task to <= 128 rows before the only shuffle."""
    j = emb.crossJoin(F.broadcast(_pq_codebook_row(emb)))
    coded = j.select(
        "vec_id",
        F.array(
            *[F.expr(_pq_code_expr(m)) for m in range(PQ_M)]
        ).alias("codes"),
    )
    return (
        coded.select(
            "vec_id", F.posexplode("codes").alias("m", "code")
        )
        .groupBy(
            F.col("m").cast("int").alias("m"),
            F.col("code").cast("int").alias("code"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.min("vec_id").alias("min_vec"),
            F.max("vec_id").alias("max_vec"),
        )
    )


def pq_adc_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """ANN top-k by PQ asymmetric distance (ADC): rank stored vectors by
    the sum over subspaces of dist2(query subvector, the vector's assigned
    codeword) — the probe a PQ index serves from 8-byte codes instead of
    256-byte floats (8/16/32x less scan IO; at serving time the 8 subspace
    terms come from a precomputed 128-entry lookup table).

    Determinism: each subspace term is the _dist2_span_sql left fold; the
    cross-subspace sum is a fixed-order left-assoc chain m=0..7, so DuckDB
    replays the double arithmetic bit-for-bit.

    Scale shape: codebook + query collapse to one broadcast row each; code
    assignment and the ADC sum are pure row functions; then
    TakeOrderedAndProject — no shuffle, no sort."""
    cb = _pq_codebook_row(emb)
    q = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qv"))
    )
    j = emb.crossJoin(F.broadcast(cb)).crossJoin(F.broadcast(q))
    coded = j.select(
        "vec_id",
        "label",
        "qv",
        "_cb",
        F.array(
            *[F.expr(_pq_code_expr(m)) for m in range(PQ_M)]
        ).alias("codes"),
    )
    # ADC: left-assoc chain over subspaces; codeword looked up from the
    # sorted _cb by code (cids are 0..k-1, so element_at(_cb, code+1))
    terms = [
        _dist2_span_sql(
            "qv",
            f"element_at(_cb, CAST(element_at(codes, {m + 1}) + 1 AS INT)).cvec",
            m * PQ_SUBDIM + 1,
            PQ_SUBDIM,
        )
        for m in range(PQ_M)
    ]
    adc = "(" + " + ".join(terms) + ")"
    return (
        coded.select(
            "vec_id", "label", F.expr(adc).alias("adc")
        )
        .orderBy(F.asc("adc"), F.asc("vec_id"))
        .limit(k)
    )


def _dist2_sql(a: str, b: str) -> str:
    """Squared L2 distance as the same left fold as _dot_sql (bit-identical
    association order vs the DuckDB unrolled form)."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def duck_dist2_sql(a: str, b: str, dims: int = DIMS) -> str:
    terms = [
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE)) * "
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        for i in range(1, dims + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def kmeans_assign(emb: DataFrame, k: int = 8) -> DataFrame:
    """One k-means ASSIGN step — the semantic-clustering primitive behind
    embedding-based corpus curation (cluster-balanced sampling, semantic
    dedup): deterministic centroids (vec_id < k), every vector assigned to
    its nearest centroid by squared L2 (ties broken by centroid id).

    Scale shape: the k centroids collapse to a single broadcast row of
    (cid, cvec) structs and the per-vector argmin is a pure row function
    (array_min over transform — see _assign_best), so the assign touches
    NO shuffle at all; the only exchange is the k-row cluster-stats
    aggregate at the end. Returns (cid, n_members, min_vec,
    max_vec). The UPDATE step (new centroids = cluster means) is a float
    sum whose order Spark does not fix — at scale run it as a scaled-
    integer sum (see value_percentiles notes) or accept tolerance; this
    operator verifies the exactly-reproducible half."""
    cent = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    best = _assign_best(emb.select("vec_id", "embedding"), cent)
    return best.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.min("vec_id").alias("min_vec"),
        F.max("vec_id").alias("max_vec"),
    )


def kmeans_update_fixedpoint(
    emb: DataFrame, k: int = 8, dims_out: int = 4, scale: int = 1 << 20
) -> DataFrame:
    """The k-means UPDATE step made exactly reproducible: per-cluster
    centroid accumulation in FIXED POINT (each float coordinate is floored
    to a scaled BIGINT before summing), so the sums are integer — order-
    free, identical at any parallelism / partitioning — where a naive
    float SUM depends on reduction order. The consumer divides by
    n_members to get the new centroid at ~1e-6 precision (scale 2^20).
    Emits the first ``dims_out`` coordinate sums (narrow demo output; the
    full-width version is the same expression over all dims).

    Scale shape: the assign is the shuffle-free broadcast array-argmin of
    _assign_best (the embedding rides along as a plain column — no
    group-key trick needed); the update is one k-row aggregate, the only
    exchange in the plan."""
    cent = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    best = _assign_best(emb.select("vec_id", "embedding"), cent)
    sums = [
        F.sum(
            F.expr(
                f"CAST(floor(CAST(embedding[{d}] AS DOUBLE) * {scale}) AS BIGINT)"
            )
        ).alias(f"s{d}")
        for d in range(dims_out)
    ]
    return best.groupBy("cid").agg(F.count("*").alias("n_members"), *sums)


def _assign_best(
    emb: DataFrame, cent: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Nearest-centroid assignment with ZERO corpus shuffles: the k
    centroids collapse to ONE row holding a sorted array of (cid, cvec)
    structs, that row is broadcast, and the per-vector argmin is
    ``array_min(transform(...))`` — a pure row function, so no k-way row
    fan-out and no groupBy(vec_id) exchange (the shape a broadcast-join +
    min(struct) argmin needs). ``array_min`` over (dist2, cid) structs is
    the same lexicographic comparison as ``min(struct(dist2, cid))``, so
    assignments and tie-breaks are bit-identical to the fan-out form and
    to the DuckDB unrolled oracle. Returns (vec_id, cid, embedding,
    *passthrough) with exactly the input's row count and partitioning."""
    cent_row = cent.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("cid", "cvec"))).alias("_cents")
    )
    dist2 = _dist2_sql("embedding", "c.cvec")
    return (
        emb.select("vec_id", "embedding", *passthrough)
        .crossJoin(F.broadcast(cent_row))
        .select(
            "vec_id",
            F.expr(
                f"array_min(transform(_cents, c -> "
                f"struct({dist2} AS dist2, c.cid AS cid))).cid"
            ).alias("cid"),
            "embedding",
            *passthrough,
        )
    )


def kmeans_iterate(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    scale: int = 1 << 20,
    dims: int = DIMS,
) -> DataFrame:
    """The REAL semantic-clustering curation loop: assign -> full-width
    fixed-point update -> re-assign, chained for ``iters`` iterations with
    a convergence readout — exactly reproducible end to end.

    The update step sums every coordinate in scaled fixed point (floor to
    a 2^20-scaled BIGINT before the SUM), so the per-cluster sums are
    integers — order-free at any parallelism — and the new centroid
    coordinate is the DETERMINISTIC double ``(CAST(sum AS DOUBLE) / scale)
    / n_members``. Every subsequent distance uses the same left-fold
    association order as _dist2_sql, so a DuckDB oracle running the
    identical arithmetic reproduces every assignment bit-for-bit, tie-break
    included.

    Scale shape: each iteration is one shuffle-free broadcast array-argmin
    (_assign_best — the k centroids, iteration-2's included, collapse to a
    single broadcast row; the per-vector argmin is a pure row function, no
    fan-out, no groupBy(vec_id) exchange) + one k-row update aggregate —
    the ONLY per-iteration shuffle, and it carries k rows of partials; the
    convergence readout needs NO join — the iteration-1 label rides
    through the later assigns as a passthrough column, so the final stage
    is a plain k-row aggregate over the last assignment. No collect, no
    driver loop over data — the Python for-loop only builds the plan
    (iters is a small constant; the lineage stays shallow because each
    update collapses to k rows).

    Output per final cluster: (cid, n_members, n_changed — members whose
    assignment differs from iteration 1 —, min_vec, max_vec).
    """
    cent = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    data = emb.select("vec_id", "embedding")
    best = None
    for it in range(iters):
        best = _assign_best(data, cent, passthrough=("cid0",) if it else ())
        if it == 0:
            best = best.withColumn("cid0", F.col("cid"))
        if it < iters - 1:
            data = best.select("vec_id", "embedding", "cid0")
            sums = [
                F.sum(
                    F.expr(
                        f"CAST(floor(CAST(embedding[{d}] AS DOUBLE) * {scale})"
                        f" AS BIGINT)"
                    )
                ).alias(f"s{d}")
                for d in range(dims)
            ]
            upd = best.groupBy("cid").agg(F.count("*").alias("n_members"), *sums)
            cent = upd.select(
                "cid",
                F.array(
                    *[
                        F.expr(f"(CAST(s{d} AS DOUBLE) / {scale}) / n_members")
                        for d in range(dims)
                    ]
                ).alias("cvec"),
            )
    return best.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.sum(F.when(F.col("cid") != F.col("cid0"), 1).otherwise(0)).alias(
            "n_changed"
        ),
        F.min("vec_id").alias("min_vec"),
        F.max("vec_id").alias("max_vec"),
    )
