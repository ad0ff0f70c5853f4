"""KMV (k-minimum-values) distinct-count sketch — deterministic + portable.

Spark's approx_count_distinct (HLL++) and DuckDB's approx sketches use
different algorithms, so they can never cross-check each other. KMV over the
PORTABLE 32-bit hash (logspark.portable_hash: md5-derived, identical in both
engines) is fully deterministic: both engines compute the SAME sketch and
the SAME estimate, so the oracle check is exact — a sketch with value-level
cross-engine parity.

Estimator (Bar-Yossef et al. 2002): keep the k smallest distinct hash
values per group; if fewer than k distinct values exist the count is exact;
otherwise estimate (k-1) * 2^32 / h_k where h_k is the k-th smallest hash.

Scale shape: distinct (group, hash) is one hash-shuffle; the per-group
top-k is a window row_number (sort within partition) over ONLY the distinct
hashes; state per group is bounded by k — this is the point of a sketch:
memory O(k) per group regardless of group size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from logspark import portable_hash as ph

HASH_SPACE = 2**32


def kmv_distinct(
    df: DataFrame, group: str, col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV sketch + estimate. Returns
    (group, kmv_n, kmv_hk, kmv_estimate)."""
    # NULL values are excluded EXPLICITLY (COUNT DISTINCT semantics): a
    # NULL hash would otherwise rank first in Spark (NULLS FIRST) but last
    # in DuckDB, skewing kmv_n/h_k differently per engine
    h = (
        df.filter(F.col(col).isNotNull())
        .select(group, F.md5(F.col(col)).alias("_dg"))
        .withColumn("_h", F.expr(ph.hex32_from_digest_sql("_dg")))
        .select(group, "_h")
        .distinct()
    )
    w = W.partitionBy(group).orderBy("_h")
    topk = h.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    agg = topk.groupBy(group).agg(
        F.count("*").alias("kmv_n"), F.max("_h").alias("kmv_hk")
    )
    est = (
        F.when(F.col("kmv_n") < k, F.col("kmv_n").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)) / F.col("kmv_hk")
        )
    )
    return agg.select(
        group, "kmv_n", "kmv_hk", est.alias("kmv_estimate")
    )


def duck_kmv_sql(rel: str, group: str, col: str, k: int = 64) -> str:
    """DuckDB oracle for the same sketch (identical hashing + arithmetic)."""
    h32 = ph.hex32_from_digest_sql("_dg")
    return f"""
WITH h AS (
  SELECT DISTINCT {group}, {h32} AS _h
  FROM (SELECT {group}, md5({col}) AS _dg FROM {rel}
        WHERE {col} IS NOT NULL) d0),
topk AS (
  SELECT {group}, _h,
         row_number() OVER (PARTITION BY {group} ORDER BY _h) AS _rn
  FROM h),
agg AS (
  SELECT {group}, COUNT(*) AS kmv_n, MAX(_h) AS kmv_hk
  FROM topk WHERE _rn <= {k} GROUP BY {group})
SELECT {group}, kmv_n, kmv_hk,
  CASE WHEN kmv_n < {k} THEN CAST(kmv_n AS DOUBLE)
       ELSE {float(k - 1)} * {float(HASH_SPACE)} / kmv_hk END AS kmv_estimate
FROM agg"""


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — deterministic + portable
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_heavy_hitters(
    items: DataFrame, col: str = "word", top_n: int = 20
) -> DataFrame:
    """Count-min sketch over an item stream + heavy-hitter readout.

    The sketch is a CMS_DEPTH x CMS_WIDTH counter matrix: row r hashes an
    item with the r-th portable MinHash permutation and increments
    counter (r, hash % CMS_WIDTH). The estimate for an item is the MIN of
    its CMS_DEPTH counters — always >= the true count (collisions only
    inflate). Both engines build the IDENTICAL matrix (portable md5-based
    hashing, integer arithmetic only), so unlike HLL/approx_top_k the
    oracle check is exact at value level.

    Returns the exact top-``top_n`` items (ORDER BY cnt DESC, item — the
    tie-break makes the cut deterministic) with their exact count and the
    sketch's estimate side by side: (item, exact_cnt, cms_est).

    Scale shape — the point of the sketch: the counter matrix is
    O(DEPTH*WIDTH) regardless of corpus size, and Spark's map-side
    partial aggregation IS the classic CMS merge (per-partition sketches
    sum cellwise before the one vocabulary-independent shuffle of at most
    DEPTH*WIDTH*n_partitions rows). The explode to DEPTH rows per item
    collapses in the same partial agg. The exact top-N arm (a full
    groupBy(item)) exists here to GRADE the sketch; at 100 TB you keep
    only the sketch + a candidate set."""
    dg = items.select(F.md5(F.col(col)).alias("_dg"), F.col(col).alias("item"))
    h = dg.withColumn("_h", F.expr(ph.hex32_from_digest_sql("_dg")))
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (F.expr(ph.minhash_perm_sql("_h", r)) % CMS_WIDTH).alias(
                    "bucket"
                ),
            )
            for r in range(CMS_DEPTH)
        ]
    )
    sketch = (
        h.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.r").alias("r"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cell_cnt"))
    )
    exact = (
        h.groupBy("item", "_h")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("item"))
        .limit(top_n)
    )
    probes = exact.select(
        "item",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            F.expr(ph.minhash_perm_sql("_h", r)) % CMS_WIDTH
                        ).alias("bucket"),
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("item", "exact_cnt", F.col("p.r").alias("r"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("item", "exact_cnt")
        .agg(F.min("cell_cnt").alias("cms_est"))
    )


def duck_cms_sql(items_rel: str, col: str = "word", top_n: int = 20) -> str:
    """DuckDB oracle: the identical sketch + readout in portable SQL."""
    h32 = ph.hex32_from_digest_sql("_dg")
    cell_selects = " UNION ALL ".join(
        f"SELECT {r} AS r, ({ph.minhash_perm_sql('_h', r)}) % {CMS_WIDTH} "
        f"AS bucket FROM h"
        for r in range(CMS_DEPTH)
    )
    probe_selects = " UNION ALL ".join(
        f"SELECT item, exact_cnt, {r} AS r, "
        f"({ph.minhash_perm_sql('_h', r)}) % {CMS_WIDTH} AS bucket FROM exact"
        for r in range(CMS_DEPTH)
    )
    return f"""
WITH h AS (
  SELECT item, {h32} AS _h FROM (
    SELECT {col} AS item, md5({col}) AS _dg FROM ({items_rel}) i0) d0),
sketch AS (
  SELECT r, bucket, COUNT(*) AS cell_cnt
  FROM ({cell_selects}) cells GROUP BY r, bucket),
exact AS (
  SELECT item, _h, COUNT(*) AS exact_cnt
  FROM h GROUP BY item, _h
  ORDER BY exact_cnt DESC, item LIMIT {top_n}),
probes AS ({probe_selects})
SELECT p.item AS item, p.exact_cnt AS exact_cnt,
       MIN(s.cell_cnt) AS cms_est
FROM probes p JOIN sketch s ON p.r = s.r AND p.bucket = s.bucket
GROUP BY p.item, p.exact_cnt"""


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — deterministic + portable set-membership sketch
# ---------------------------------------------------------------------------

BLOOM_BITS = 8192
BLOOM_HASHES = 4


def bloom_membership(
    history: DataFrame, probes: DataFrame, key: str
) -> DataFrame:
    """Build a Bloom filter over ``history[key]`` and probe every
    ``probes[key]`` against it, returning the per-probe verdict joined
    with the exact answer: (doc_id, bloom_hit, present).

    The filter is represented as the DISTINCT set of SET bit positions
    (at most BLOOM_BITS rows — a table-valued bitset both engines build
    identically from the portable hash; BLOOM_HASHES positions per key
    via the MinHash permutations mod BLOOM_BITS). A probe "hits" iff ALL
    its positions are set. Bloom guarantee: present => bloom_hit (zero
    false negatives — asserted by test); false positives are the
    measured, bounded cost.

    Scale shape — the point: the history side collapses to a <= BLOOM_BITS-
    row bitset BROADCAST to every probe partition (this is what Spark's own
    AQE runtime bloom-join filters do internally); the probe side never
    shuffles. Size m ~= n*k/ln2 bits for ~ (1/2)^k false positives at n
    history keys (8192/4 here suits the test corpus; at 10^9 keys a ~0.7 GB
    real bitset beats broadcasting it as rows — same plan, denser encoding
    via spark's builtin bloom_filter_agg or a chunked bitmap column). The exact arm (left semi join on the key) exists to GRADE
    the filter and is what the bloom REPLACES at 100 TB when a small
    false-positive rate is acceptable (or prefilters: bloom first, exact
    join only the hits)."""
    hh = (
        history.select(F.md5(F.col(key)).alias("_dg"))
        .withColumn("_h", F.expr(ph.hex32_from_digest_sql("_dg")))
    )
    pos_arr = lambda: F.array(  # noqa: E731 — tiny expression factory
        *[
            (F.expr(ph.minhash_perm_sql("_h", r)) % BLOOM_BITS)
            for r in range(BLOOM_HASHES)
        ]
    )
    bits = (
        hh.select(F.explode(pos_arr()).alias("pos")).distinct()
    )
    pp = (
        probes.select("doc_id", F.md5(F.col(key)).alias("_dg"))
        .withColumn("_h", F.expr(ph.hex32_from_digest_sql("_dg")))
    )
    probe_pos = pp.select(
        "doc_id", "_dg", F.explode(pos_arr()).alias("pos")
    )
    hit = (
        probe_pos.join(
            F.broadcast(bits.withColumn("set_", F.lit(1))), "pos", "left"
        )
        .groupBy("doc_id", "_dg")
        .agg((F.count("set_") == BLOOM_HASHES).alias("bloom_hit"))
    )
    exact = history.select(F.md5(F.col(key)).alias("_dg")).distinct()
    return (
        hit.join(
            F.broadcast(exact.withColumn("present_", F.lit(1))),
            "_dg",
            "left",
        )
        .select(
            "doc_id",
            "bloom_hit",
            F.col("present_").isNotNull().alias("present"),
        )
    )


def duck_bloom_sql(
    history_rel: str, probes_rel: str, key: str
) -> str:
    """DuckDB oracle: identical bitset + probe verdicts in portable SQL."""
    h32 = ph.hex32_from_digest_sql("_dg")
    hist_pos = " UNION ALL ".join(
        f"SELECT ({ph.minhash_perm_sql('_h', r)}) % {BLOOM_BITS} AS pos FROM hh"
        for r in range(BLOOM_HASHES)
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT doc_id, _dg, ({ph.minhash_perm_sql('_h', r)}) % {BLOOM_BITS} "
        f"AS pos FROM pp"
        for r in range(BLOOM_HASHES)
    )
    return f"""
WITH hh AS (SELECT {h32} AS _h FROM
            (SELECT md5({key}) AS _dg FROM ({history_rel}) h0) h1),
bits AS (SELECT DISTINCT pos FROM ({hist_pos}) allpos),
pp AS (SELECT doc_id, _dg, {h32} AS _h FROM
       (SELECT doc_id, md5({key}) AS _dg FROM ({probes_rel}) p0) p1),
ppos AS ({probe_pos}),
hit AS (SELECT doc_id, _dg,
               COUNT(b.pos) = {BLOOM_HASHES} AS bloom_hit
        FROM ppos LEFT JOIN bits b USING (pos)
        GROUP BY doc_id, _dg),
exact AS (SELECT DISTINCT md5({key}) AS _dg FROM ({history_rel}) h2)
SELECT h.doc_id AS doc_id, h.bloom_hit AS bloom_hit,
       e._dg IS NOT NULL AS present
FROM hit h LEFT JOIN exact e USING (_dg)"""


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007) — deterministic +
# portable
# ---------------------------------------------------------------------------

HLL_M = 64  # registers (p=6); std error ~= 1.04/sqrt(64) ~= 13%
HLL_ALPHA = 0.709  # alpha_64 (the m=64 bias constant from the paper)
HLL_MAXRHO = 27  # 26-bit suffix -> rho in [1,27]; 27 = all-zero suffix
_HLL_POW = 50  # register sum kept integer-exact: 2^(50 - rho) per register


def _hll_rho_sql(v: str) -> str:
    """Portable CASE for rho = 1 + trailing zeros of ``v`` (FM-style bit
    pattern; geometric like the leading-zero variant, so the HLL estimator
    constants apply unchanged). Lowest set bit at position k-1 iff the low
    k bits equal exactly 2^(k-1) — pure modulo arithmetic, no log2/shift
    (CAST(double AS INT) truncates in Spark but ROUNDS in DuckDB, so a
    log2-based rho would silently diverge cross-engine at ulp boundaries).
    """
    branches = " ".join(
        f"WHEN {v} % {2 ** k} = {2 ** (k - 1)} THEN {k}"
        for k in range(1, HLL_MAXRHO)
    )
    return f"CASE {branches} ELSE {HLL_MAXRHO} END"


def _hll_pow_sql(rho: str) -> str:
    """Portable CASE: 2^(_HLL_POW - rho) as a BIGINT literal table (again
    no pow(): float pow is exact on these values but the CAST semantics
    differ cross-engine)."""
    branches = " ".join(
        f"WHEN {rho} = {k} THEN {2 ** (_HLL_POW - k)}"
        for k in range(1, HLL_MAXRHO + 1)
    )
    return f"CASE {branches} END"


def _hll_core_sql(rel: str, group: str, col: str) -> str:
    """Shared portable SQL (runs verbatim in Spark SQL and DuckDB):
    rel(group, col) -> (group, registers_hit, reg_sum) where reg_sum =
    sum over NON-EMPTY registers of 2^(50 - max_rho). The (64 -
    registers_hit) empty registers contribute 2^50 each; added in the
    estimate step so reg_sum stays a pure aggregation output."""
    h32 = ph.hex32_from_digest_sql("_dg")
    suffix = f"CAST((_h - (_h % {HLL_M})) / {HLL_M} AS BIGINT)"
    return f"""
WITH d0 AS (SELECT {group} AS g, md5({col}) AS _dg
            FROM {rel} WHERE {col} IS NOT NULL),
h AS (SELECT g, {h32} AS _h FROM d0),
r AS (SELECT g, _h % {HLL_M} AS reg, {_hll_rho_sql(suffix)} AS rho FROM h),
m AS (SELECT g, reg, MAX(rho) AS max_rho FROM r GROUP BY g, reg)
SELECT g, COUNT(*) AS registers_hit,
       CAST(SUM({_hll_pow_sql("max_rho")}) AS BIGINT) AS reg_sum
FROM m GROUP BY g"""


# alpha * m^2 * 2^50 as ONE Python-formatted double literal so both
# engines parse the identical constant (shortest-round-trip repr)
_HLL_NUM = repr(HLL_ALPHA * HLL_M * HLL_M * float(2**_HLL_POW))

import math as _math


def _hll_lc_sql(v: str) -> str:
    """Small-range (linear counting) correction as a LITERAL lookup: the
    paper's m*ln(m/V) over the empty-register count V has only m-1
    possible inputs, so every value is precomputed in Python and emitted
    as a shortest-round-trip double literal — the correction costs no
    runtime ln() and stays bit-identical cross-engine."""
    branches = " ".join(
        f"WHEN {v} = {V} THEN {_math.log(HLL_M / V) * HLL_M!r}"
        for V in range(1, HLL_M)
    )
    return f"CASE {branches} END"


def _hll_est_expr() -> str:
    """Portable estimate expression over columns (registers_hit, reg_sum):
    raw HLL alpha*m^2 / sum(2^-M_j) — empty registers contribute 2^-0 = 1,
    i.e. 2^50 in the scaled-integer sum, so the whole divisor is an exact
    BIGINT and the raw estimate is ONE double division, bit-identical
    cross-engine. Below the paper's 2.5m threshold with empty registers
    present, the linear-counting correction applies (literal lookup, see
    _hll_lc_sql); the threshold compare runs on the bit-identical raw
    double, so both engines take the same branch."""
    empty = f"({HLL_M} - registers_hit)"
    raw = f"({_HLL_NUM} / (reg_sum + {empty} * {2 ** _HLL_POW}))"
    return f"""CASE WHEN {raw} <= {2.5 * HLL_M!r} AND {empty} > 0
       THEN {_hll_lc_sql(empty)} ELSE {raw} END"""


def _hll_estimate_sql(core: str, group: str) -> str:
    return f"""
SELECT g AS {group}, registers_hit, reg_sum AS hll_reg_sum,
       {_hll_est_expr()} AS hll_estimate
FROM ({core}) c"""


def hll_distinct(df: DataFrame, group: str, col: str) -> DataFrame:
    """Per-group deterministic HLL distinct estimate
    (group, registers_hit, hll_reg_sum, hll_estimate) — built from the
    SAME portable-SQL snippets the DuckDB oracle runs, via F.expr.

    Scale shape vs kmv_distinct: the KMV sketch shuffles DISTINCT
    (group, hash) then windows; HLL never materializes distincts at all —
    two hash aggregations with 64-bounded state per group (map-side
    combine does the (group, reg)-max locally), which is the sketch to
    reach for when the distinct set itself is too big to shuffle at
    10^12 rows.
    """
    suffix = f"CAST((_h - (_h % {HLL_M})) / {HLL_M} AS BIGINT)"
    h = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(group), F.md5(F.col(col)).alias("_dg"))
        .withColumn("_h", F.expr(ph.hex32_from_digest_sql("_dg")))
        .select(
            group,
            F.expr(f"_h % {HLL_M}").alias("reg"),
            F.expr(_hll_rho_sql(suffix)).alias("rho"),
        )
    )
    m = h.groupBy(group, "reg").agg(F.max("rho").alias("max_rho"))
    agg = m.groupBy(group).agg(
        F.count("*").alias("registers_hit"),
        F.sum(F.expr(_hll_pow_sql("max_rho"))).alias("reg_sum"),
    )
    return agg.select(
        group,
        "registers_hit",
        F.col("reg_sum").alias("hll_reg_sum"),
        F.expr(_hll_est_expr()).alias("hll_estimate"),
    )


def duck_hll_sql(rel: str, group: str, col: str) -> str:
    """DuckDB oracle: the very same SQL text over the oracle relation."""
    return _hll_estimate_sql(_hll_core_sql(rel, group, col), group)
