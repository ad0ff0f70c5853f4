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
