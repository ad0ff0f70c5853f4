"""Retention: archive/delete data for COMPLETED dates.

Reference analog: proc/clean_data.py:28-58 (tar.gz-compact pretables and
delete r5 csvs for dates whose DateStatus is COMPLETED, selected via the
semi-join get_date_status_completed, /root/reference/libs/
lib_database.py:37-43).

Spark-native: a left SEMI join of data against completed dates (J3), then
either Iceberg row-level ``DELETE FROM sink WHERE date IN (...)`` +
``expire_snapshots`` (production) or partition-directory pruning (parquet
fallback used here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logspark.status import S_COMPLETED


def completed_dates(date_status: DataFrame) -> DataFrame:
    return date_status.filter(F.col("status") == S_COMPLETED).select(
        "source", "log_date"
    )


def rows_to_retire(data: DataFrame, date_status: DataFrame) -> DataFrame:
    """J3: rows whose (source, date) is COMPLETED — the retire set."""
    d = data.withColumn("log_date", F.to_date("ts"))
    return d.join(
        F.broadcast(completed_dates(date_status)), ["source", "log_date"], "left_semi"
    )


def retained(data: DataFrame, date_status: DataFrame) -> DataFrame:
    """Anti-join complement: what survives retention."""
    d = data.withColumn("log_date", F.to_date("ts"))
    return d.join(
        F.broadcast(completed_dates(date_status)), ["source", "log_date"], "left_anti"
    ).drop("log_date")


def archive_and_retire(
    spark,
    live_dir: str,
    date_status: DataFrame,
    archive_dir: str,
) -> dict:
    """S7: the archive/compact step of retention (reference ``_compact_file``
    + ``clean_pretables``, /root/reference/proc/clean_data.py:28-52: tar.gz
    the pretable of every COMPLETED date, then delete the original).

    Parquet fallback semantics (production = Iceberg ``DELETE WHERE`` +
    ``rewrite_data_files`` with gzip + ``expire_snapshots``):

      * the live table is partitioned by (source, log_date) — the retention
        unit — so the retired slice is a set of whole directories. The
        archive read is partition-PRUNED (an OR-of-literal-pairs filter over
        partition columns) and the delete is a directory drop: cost is
        proportional to the retired slice, never a full-table rewrite.
      * the archive write uses gzip-compressed parquet with dynamic
        partition overwrite keyed on (source, log_date) — the same
        crash-replay protocol as job.py: archive lands durably BEFORE the
        live delete, and a rerun after a kill REPLACES the archive
        partitions instead of duplicating them.

    Returns {'archived_rows', 'pairs'} for the caller's bookkeeping."""
    import os
    import shutil

    pairs = [
        (r["source"], r["log_date"])
        for r in completed_dates(date_status).distinct().collect()
    ]
    if not pairs:
        return {"archived_rows": 0, "pairs": []}

    pred = None
    for s, d in pairs:
        p = (F.col("source") == s) & (F.col("log_date") == F.lit(d))
        pred = p if pred is None else (pred | p)
    retire = spark.read.parquet(live_dir).filter(pred)
    (
        retire.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", "gzip")
        .partitionBy("source", "log_date")
        .parquet(archive_dir)
    )
    archived = spark.read.parquet(archive_dir).filter(pred).count()
    # delete by DISCOVERING the physical directories and decoding their
    # partition values — never by re-building path strings (Spark escapes
    # special characters in partition paths, e.g. 'a b' -> 'a%20b', and a
    # hand-built path would silently miss those dirs, leaving the retired
    # slice alive in BOTH live and archive)
    import glob
    from urllib.parse import unquote

    want = {(str(s), str(d)) for s, d in pairs}
    for sdir in glob.glob(os.path.join(live_dir, "source=*")):
        sval = unquote(os.path.basename(sdir).split("=", 1)[1])
        for ddir in glob.glob(os.path.join(sdir, "log_date=*")):
            dval = unquote(os.path.basename(ddir).split("=", 1)[1])
            if (sval, dval) in want:
                shutil.rmtree(ddir, ignore_errors=False)
    return {"archived_rows": archived, "pairs": pairs}
