"""SCD Type-2 dimension maintenance — batch MERGE semantics as a dataflow.

The reference's control tables are effectively slowly-changing state
(per-file status rows are UPDATE-else-INSERT, reference
libs/lib_database.py:101-117); Iceberg expresses the same thing as
``MERGE INTO``. This module implements the full Type-2 merge —
close-the-old-version, open-the-new-version, keep history — as a pure
DataFrame transformation, so the parquet fallback has real merge
semantics (write the returned state with the same crash-atomic
dynamic-overwrite protocol job.py uses), and an Iceberg deployment can
translate it 1:1 to MERGE INTO ... WHEN MATCHED/NOT MATCHED.

Scale shape: ONE key-partitioned join between the open slice of the
dimension and the update batch (both dimension-sized, co-partitionable /
bucketable on the key); closed history rows pass through untouched —
they are never read by the merge (partition the dimension table by
``valid_to IS NULL`` or a current-flag so the open slice is a partition
scan, not a full-table filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str = "key",
    attr: str = "attr",
    ts: str = "ts",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``current``: (key, attr, valid_from, valid_to) — valid_to NULL marks
    the open version. ``updates``: (key, attr, ts) — at most one row per
    key (pre-dedupe with a last-wins window if needed).

    Emits the complete new dimension state:
      * history rows (valid_to NOT NULL) — unchanged, pass-through
      * open row + differing update  -> CLOSED row (valid_to = update ts)
                                        and a NEW open row (valid_from = ts)
      * open row + same-attr update  -> unchanged open row
      * open row, no update          -> unchanged open row
      * update for an unseen key     -> NEW open row (the INSERT arm)

    ``attr`` may be legitimately NULL on either side: presence is tracked
    with explicit marker columns (not attr-nullness) and the change test
    is null-safe, so NULL <-> value transitions version the row and
    NULL -> NULL is "unchanged".
    """
    hist = current.filter(F.col("valid_to").isNotNull())
    # explicit side-presence markers: attr is allowed to be legitimately
    # NULL on either side, so nullness of _c_attr/_u_attr cannot double as
    # the "row existed on this side of the FULL OUTER" sentinel (it would
    # silently drop an open NULL-attr row and make a NULL-attr update
    # indistinguishable from no update)
    open_ = current.filter(F.col("valid_to").isNull()).select(
        F.col(key),
        F.col(attr).alias("_c_attr"),
        "valid_from",
        F.lit(True).alias("_c"),
    )
    upd = updates.select(
        F.col(key),
        F.col(attr).alias("_u_attr"),
        F.col(ts).alias("_u_ts"),
        F.lit(True).alias("_u"),
    )
    j = open_.join(upd, key, "full_outer")
    # null-safe attr comparison: NULL -> 'x' and 'x' -> NULL are real
    # changes; NULL -> NULL is unchanged
    changed = (
        F.col("_c").isNotNull()
        & F.col("_u").isNotNull()
        & ~F.col("_c_attr").eqNullSafe(F.col("_u_attr"))
    )
    # WHEN MATCHED AND changed: close the old version
    closed = j.filter(changed).select(
        F.col(key),
        F.col("_c_attr").alias(attr),
        "valid_from",
        F.col("_u_ts").alias("valid_to"),
    )
    # ... and open the new one; WHEN NOT MATCHED: insert the new key
    opened = j.filter(
        changed | (F.col("_c").isNull() & F.col("_u").isNotNull())
    ).select(
        F.col(key),
        F.col("_u_attr").alias(attr),
        F.col("_u_ts").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    # WHEN MATCHED AND unchanged / no update: keep the open row
    kept = j.filter(F.col("_c").isNotNull() & ~changed).select(
        F.col(key),
        F.col("_c_attr").alias(attr),
        "valid_from",
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    return hist.unionByName(closed).unionByName(opened).unionByName(kept)
