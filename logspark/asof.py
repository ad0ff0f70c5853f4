"""As-of (backward) join — a temporal operator Spark has no native form of.

For every left row, attach the LATEST right row with right_ts <= left_ts
within the same key ("what was the most recent quote/state/click when this
event happened"). The reference pipeline has no such operator (it is batch
counters only); training-data and telemetry pipelines need it constantly
(nearest-prior state enrichment), and DuckDB ships it natively (ASOF JOIN),
which gives us a fully independent oracle.

Spark-first composition (no range-join explosion, no per-key loops):

  1. union left and right rows into one stream, tagged with a side marker
     (right = 0 sorts BEFORE left = 1 at equal timestamps, which yields
     at-or-before semantics — identical to DuckDB's ``l.ts >= r.ts``);
  2. ONE window pass per key ordered by (ts, side):
     ``last(right_row_struct, ignorenulls=True)`` carries the most recent
     right row forward;
  3. keep only left rows and unpack the struct.

Cost: one shuffle on the key + one sort per partition — the same price as
any windowed aggregation; scales to arbitrary key cardinality because keys
hash-partition independently. The right row is packed into a SINGLE struct
so the carried values are row-consistent even if some right columns are
NULL (per-column last(ignorenulls) would mix rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join (see module docstring).

    ``right``'s non-key, non-ts columns are attached to every left row with
    a ``suffix``; ``right_ts`` itself is attached as ``ts{suffix}``. Left
    rows with no prior right row get NULLs (ASOF LEFT JOIN semantics)."""
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    # NULL parity with the SQL semantics (DuckDB ASOF ON l.k = r.k AND
    # l.ts >= r.ts): a NULL-keyed or NULL-ts right row can never match, but
    # Spark's window PARTITION BY groups NULL keys and NULLS FIRST ordering
    # would carry a NULL-ts right row — so drop them before the union.
    # (NULL-keyed/NULL-ts LEFT rows need no guard: their partitions contain
    # no right rows / sort before all of them, yielding NULLs either way.)
    right = right.na.drop(subset=list(on) + [right_ts])
    packed = F.struct(
        F.col(right_ts).alias("ts"), *[F.col(c) for c in rcols]
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        packed.alias("_rrow"),
    ).withColumn("_side", F.lit(0))
    l2 = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        W.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last("_rrow", ignorenulls=True).over(w)
    out = u.withColumn("_carried", carried).filter(F.col("_side") == 1)
    sel = [c for c in left.columns] + [
        F.col("_carried.ts").alias(f"ts{suffix}")
    ] + [F.col(f"_carried.{c}").alias(f"{c}{suffix}") for c in rcols]
    return out.select(*sel)
