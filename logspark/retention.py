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
