"""Date-status rollup: per-(source, date) quota aggregation + guarded upsert.

Re-expression of the reference's per-date state machine:
  * compute_date_status (/root/reference/libs/lib_status.py:56-82): count
    LOADED files per date, compare to a per-collection expected quota with
    **date-regime switches** (scl 2021-05-25, nbr 2022-04-05/2022-05-08,
    lib_status.py:62-75) -> LOADED / PARTIAL / QUEUE.
  * update_date_status (/root/reference/libs/lib_database.py:120-151):
    upsert one row per (collection, date) — update only when the existing
    status is QUEUE or PARTIAL (guarded transition, :134-136).

Quotas live in a small broadcast DataFrame (regime_start nullable), mirroring
COLLECTION_TO_EXPECTED_DAILY_STATUS_SUM (lib_status.py:21-53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

S_QUEUE, S_PARTIAL, S_LOADED, S_COMPLETED = 0, 1, 2, 5

# (source, regime_start | None, expected): later regime rows win when
# log_date > regime_start — shape of lib_status.py:21-53.
DEFAULT_QUOTAS = [
    ("apache-hiperion", None, 150),
    ("apache-hiperion", "2024-03-15", 120),
    ("varnish02", None, 20),
    ("nginx-json01", None, 10),
    ("cloudfront-dist1", None, 10),
    ("iis01", None, 10),
    ("w3c-node03", None, 10),
]


def quota_df(spark: SparkSession, quotas=None) -> DataFrame:
    rows = [
        (s, r, e) for s, r, e in (quotas or DEFAULT_QUOTAS)
    ]
    return spark.createDataFrame(
        rows, "source STRING, regime_start STRING, expected INT"
    ).withColumn("regime_start", F.col("regime_start").cast("date"))


def rollup_date_status(
    routed: DataFrame, spark: SparkSession, quotas=None
) -> DataFrame:
    """groupBy(source, date) -> loaded count -> quota CASE (A2+A3).

    Broadcast join against the quota table, then pick the most recent
    applicable regime per (source, date) via max(regime_start <= date).
    """
    visits = routed.filter(F.col("route") == "visit")
    agg = visits.groupBy(
        "source", F.to_date("ts").alias("log_date")
    ).agg(F.count("*").alias("loaded"))
    q = F.broadcast(quota_df(spark, quotas))
    j = agg.join(q, "source", "left").filter(
        F.col("regime_start").isNull() | (F.col("log_date") > F.col("regime_start"))
    )
    # latest applicable regime wins
    best = j.groupBy("source", "log_date", "loaded").agg(
        F.max_by(
            "expected", F.coalesce(F.col("regime_start"), F.lit("1970-01-01").cast("date"))
        ).alias("expected")
    )
    status = (
        F.when(F.col("loaded") >= F.col("expected"), S_LOADED)
        .when(F.col("loaded") > 0, S_PARTIAL)
        .otherwise(S_QUEUE)
    )
    return best.withColumn("status", status)


def guarded_upsert(existing: DataFrame, updates: DataFrame) -> DataFrame:
    """Upsert per (source, log_date): update only rows whose existing status
    is QUEUE or PARTIAL; insert absent rows (lib_database.py:131-145)."""
    e = existing.select(
        "source",
        "log_date",
        F.col("loaded").alias("loaded_old"),
        F.col("expected").alias("expected_old"),
        F.col("status").alias("status_old"),
    )
    u = updates.select("source", "log_date", "loaded", "expected", "status")
    j = e.join(u, ["source", "log_date"], "full_outer")
    updatable = F.col("status_old").isNull() | F.col("status_old").isin(
        S_QUEUE, S_PARTIAL
    )
    take_new = updatable & F.col("status").isNotNull()
    pick = lambda n, o: F.when(take_new, F.col(n)).otherwise(  # noqa: E731
        F.coalesce(F.col(o), F.col(n))
    )
    return j.select(
        "source",
        "log_date",
        pick("loaded", "loaded_old").alias("loaded"),
        pick("expected", "expected_old").alias("expected"),
        pick("status", "status_old").alias("status"),
    )


def slo_error_budget(routed: DataFrame, target_ppm: int = 1000) -> DataFrame:
    """Per (source, day) availability vs an SLO error budget, all-integer.

    SRE view of the reference's per-day status ledger (lib_status tracks
    loaded-vs-expected line counts; this tracks served-vs-5xx): for each
    source and ISO day, request count, 5xx count, availability in ppm,
    and the budget-burn rate in milli-units of the allowed error budget
    (``burn_milli`` = 1000 means errors exactly consumed the day's
    budget; >1000 means the SLO is breached, also surfaced as a bool).

    target_ppm is the ALLOWED error fraction in ppm (1000 ppm = 99.9%
    availability target).

    Exactness: every derived value is floor-division of two exact BIGINT
    products, so any engine lands on identical rows — no float surface.
    Shape: one map-side-combinable hash agg on (source, day); the
    key space is sources x days (control-plane-sized at any corpus
    scale), then narrow column math.
    """
    h = routed.filter(F.col("parsed_ok"))
    g = h.groupBy(
        "source", F.date_format("ts", "yyyy-MM-dd").alias("iso_date")
    ).agg(
        F.count("*").alias("n_req"),
        F.sum(F.when(F.col("status") >= 500, 1).otherwise(0)).alias("n_5xx"),
    )
    return g.select(
        "source",
        "iso_date",
        "n_req",
        "n_5xx",
        F.expr("(n_req - n_5xx) * 1000000 DIV n_req").alias(
            "availability_ppm"
        ),
        F.expr(f"n_5xx * 1000000000 DIV (n_req * {int(target_ppm)})").alias(
            "burn_milli"
        ),
        F.expr(f"n_5xx * 1000000 > n_req * {int(target_ppm)}").alias(
            "breached"
        ),
    )
