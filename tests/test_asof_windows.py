"""As-of join semantics on hand-built rows (the driver query checks it
against DuckDB's native ASOF JOIN at sf0.01; this pins the edge cases)."""

from __future__ import annotations

import datetime as dt

from logspark import asof


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts(5)),   # after right rows at 1 and 3 -> picks 3
            (2, 100, _ts(3)),   # EQUAL ts to a right row -> at-or-before includes it
            (3, 100, _ts(0)),   # before any right row -> NULLs
            (4, 200, _ts(9)),   # other key: only its own right rows visible
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(1), 10.0),
            (100, _ts(3), 30.0),
            (200, _ts(2), 99.0),
        ],
        "user_id int, ts timestamp, v double",
    )
    out = {
        r["event_id"]: (r["v_asof"], r["ts_asof"])
        for r in asof.asof_join_backward(left, right, on=["user_id"]).collect()
    }
    assert out[1] == (30.0, _ts(3))
    assert out[2] == (30.0, _ts(3))  # right row at equal ts IS visible
    assert out[3] == (None, None)
    assert out[4] == (99.0, _ts(2))  # never leaks across keys


def test_asof_single_shuffle_plan(spark):
    """The composition costs ONE exchange (the window's key shuffle) —
    no join node, no range explosion."""
    import contextlib
    import io
    import re

    left = spark.range(10).selectExpr(
        "id AS event_id", "id % 3 AS user_id", "timestamp_seconds(id * 60) AS ts"
    )
    right = spark.range(5).selectExpr(
        "id % 3 AS user_id", "timestamp_seconds(id * 90) AS ts", "CAST(id AS DOUBLE) AS v"
    )
    df = asof.asof_join_backward(left, right, on=["user_id"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    assert len(re.findall(r"\bExchange \(\d+\)", txt)) == 1, txt
    assert "Join" not in txt, txt


def test_range_join_is_equi_join_not_nested_loop(spark):
    """The bucketized range join must plan as a hash/sort-merge EQUI-join
    on (key, bucket) — never BroadcastNestedLoop/cartesian."""
    import contextlib
    import io

    from logspark import rangejoin

    ev = spark.range(2000).selectExpr(
        "id AS event_id", "id % 7 AS user_id",
        "timestamp_seconds(id * 60) AS ts",
    )
    df = rangejoin.self_range_join_forward(ev, key="user_id", window_sec=900)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    assert "NestedLoop" not in txt and "Cartesian" not in txt, txt
    # correctness vs brute force on the same rows
    rows = ev.collect()
    brute = {
        (a["event_id"], b["event_id"])
        for a in rows
        for b in rows
        if a["user_id"] == b["user_id"]
        and b["ts"] > a["ts"]
        and (b["ts"] - a["ts"]).total_seconds() <= 900
    }
    got = {(r["id_a"], r["id_b"]) for r in df.collect()}
    assert got == brute
    assert len(got) > 0


def test_kmv_estimate_accuracy(spark):
    """KMV with k=64 must land within ~3 standard errors (1/sqrt(k) ~ 12.5%)
    of the true distinct count, and be EXACT below k."""
    from logspark import sketch
    import pyspark.sql.functions as F

    df = spark.range(20000).selectExpr(
        "CAST(id % 2 AS INT) AS g", "CAST(id % CASE WHEN id % 2 = 0 THEN 3000 ELSE 40 END AS STRING) AS v"
    )
    out = {r["g"]: r for r in sketch.kmv_distinct(df, "g", "v", k=64).collect()}
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    # small group: exact
    assert out[1]["kmv_n"] == exact[1] and out[1]["kmv_estimate"] == exact[1]
    # big group: estimate within 3 std errors
    est, true = out[0]["kmv_estimate"], exact[0]
    assert abs(est - true) / true < 3 * (1 / 64**0.5), (est, true)


def test_asof_null_key_and_ts_parity(spark):
    """NULL-keyed / NULL-ts right rows must never enrich anything (SQL
    equality/inequality semantics, matching DuckDB ASOF JOIN); NULL-keyed
    left rows get NULLs."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 100, t(5)), (2, None, t(5))],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, t(1), 10.0), (None, t(0), 66.0), (100, None, 77.0)],
        "user_id int, ts timestamp, v double",
    )
    out = {
        r["event_id"]: r["v_asof"]
        for r in asof.asof_join_backward(left, right, on=["user_id"]).collect()
    }
    assert out[1] == 10.0  # real row wins; NULL-ts row (77.0) never carried
    assert out[2] is None  # NULL key never matches the NULL-key right row


def test_range_join_bucket_is_session_tz_independent(spark):
    """The bucket id must be TZ-free: identical pair sets under any
    spark.sql.session.timeZone, including a DST zone whose offset jumps
    (a session-TZ unix_timestamp mapping would tear windows apart at the
    spring-forward gap)."""
    import datetime as dt

    from logspark import rangejoin

    # pairs straddling the US spring-forward instant (2024-03-10 02:00 NY)
    rows = [
        (1, 7, dt.datetime(2024, 3, 10, 1, 50)),
        (2, 7, dt.datetime(2024, 3, 10, 2, 20)),
        (3, 7, dt.datetime(2024, 3, 10, 3, 5)),
    ]
    ev = spark.createDataFrame(rows, "event_id int, user_id int, ts timestamp_ntz")
    old = spark.conf.get("spark.sql.session.timeZone")
    results = {}
    try:
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = rangejoin.self_range_join_forward(ev, key="user_id", window_sec=1800)
            results[tz] = {(r["id_a"], r["id_b"]) for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    # (2,3) is 45 min apart — outside the 30-min window; only (1,2) qualifies
    assert results["UTC"] == results["America/New_York"] == {(1, 2)}


def test_kmv_ignores_nulls(spark):
    from logspark import sketch

    df = spark.createDataFrame(
        [(0, "a"), (0, "b"), (0, None), (0, "a")], "g int, v string"
    )
    out = sketch.kmv_distinct(df, "g", "v", k=8).collect()[0]
    assert out["kmv_n"] == 2 and out["kmv_estimate"] == 2.0
