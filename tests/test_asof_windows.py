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
