"""TZ-free temporal arithmetic for TIMESTAMP_NTZ columns.

Spark's instant-based temporal functions (``timestampdiff``, ``unix_*``)
interpret an NTZ operand THROUGH the session time zone: a wall time inside
a DST spring-forward gap shifts by the offset jump, so differences and
bucket ids silently depend on ``spark.sql.session.timeZone`` (measured:
the same 30-minute NTZ gap bucketed 1 apart under UTC and 3 apart under
America/New_York). Field extraction — ``unix_date``, ``hour``, ``minute``,
``extract(SECOND)`` — is pure wall-clock arithmetic and therefore
TZ-independent, matching DuckDB's native TZ-free TIMESTAMP semantics
(``epoch_us``).
"""

from __future__ import annotations


def ntz_epoch_us_sql(col: str) -> str:
    """Spark SQL: microseconds since 1970-01-01 00:00:00 wall time for a
    TIMESTAMP_NTZ column, built ONLY from TZ-free field extractions.
    Equivalent to DuckDB ``epoch_us({col})``."""
    return (
        f"((CAST(unix_date(CAST({col} AS DATE)) AS BIGINT) * 86400"
        f" + hour({col}) * 3600 + minute({col}) * 60) * 1000000"
        f" + CAST(extract(SECOND FROM {col}) * 1000000 AS BIGINT))"
    )
