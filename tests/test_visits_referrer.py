"""Semantics of the Matomo visit model + referrer attribution."""

import datetime

from pyspark.sql import functions as F


def _hits(spark, rows):
    """rows: (doc_id, ip, ua, minute_offset) -> parsed-hit shaped df."""
    base = datetime.datetime(2024, 3, 5, 10, 0, 0)
    data = [
        (d, ip, ua, base + datetime.timedelta(seconds=sec))
        for (d, ip, ua, sec) in rows
    ]
    return spark.createDataFrame(
        data, "doc_id long, ip string, user_agent string, ts timestamp"
    )


def test_visit_splits_strictly_after_30min_gap(spark):
    from logspark import visits

    df = _hits(
        spark,
        [
            (1, "1.1.1.1", "ua", 0),
            (2, "1.1.1.1", "ua", 1800),  # exactly 30 min later: SAME visit
            (3, "1.1.1.1", "ua", 3601),  # 1801 s after hit 2: NEW visit
            (4, "2.2.2.2", "ua", 10),  # other visitor: its own visit
            (5, "1.1.1.1", "other-ua", 10),  # same ip, other UA: own visit
        ],
    )
    s = visits.sessionize_hits(df)
    got = {
        r["doc_id"]: (r["ip"], r["ua_k"], r["visit_id"])
        for r in s.collect()
    }
    assert got[1] == ("1.1.1.1", "ua", 1)
    assert got[2] == ("1.1.1.1", "ua", 1)  # boundary is > gap, not >=
    assert got[3] == ("1.1.1.1", "ua", 2)
    assert got[4][2] == 1 and got[5][2] == 1


def test_visit_daily_stats_bounces_and_first_hit_day(spark):
    from logspark import visits

    # visitor A: 2-action visit; visitor B: two 1-action visits (bounces)
    df = _hits(
        spark,
        [
            (1, "1.1.1.1", "ua", 0),
            (2, "1.1.1.1", "ua", 60),
            (3, "3.3.3.3", "ua", 0),
            (4, "3.3.3.3", "ua", 7200),
        ],
    )
    out = {r["dom"]: r for r in visits.visit_daily_stats(df).collect()}
    assert set(out) == {5}
    assert out[5]["n_visits"] == 3
    assert out[5]["n_bounces"] == 2
    assert out[5]["total_actions"] == 4


def test_referrer_attribution_classes(spark):
    from logspark import enrich

    df = spark.createDataFrame(
        [
            (1, None),  # direct (no referrer / '-')
            (2, "http://ref-3.example.com/"),  # search: findex
            (3, "https://ref-3.example.com/path?x=1"),  # scheme/path variants
            (4, "http://ref-4.example.com/"),  # website
        ],
        "doc_id long, referrer string",
    )
    out = {
        r["doc_id"]: (r["referrer_type"], r["referrer_name"])
        for r in enrich.with_referrer_attribution(df, spark).collect()
    }
    assert out[1] == ("direct", None)
    assert out[2] == ("search", "findex")
    assert out[3] == ("search", "findex")
    assert out[4] == ("website", "ref-4.example.com")
