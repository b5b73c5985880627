from __future__ import annotations

from datetime import datetime

from aws_cdk_pipelines_datalake_etl_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0),
            (1, _ts("2024-01-01 10:05:00"), 101.0),
            (2, _ts("2024-01-01 10:01:00"), 200.0),
        ],
        ["k", "qts", "price"],
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:03:00"), "t1"),   # -> 100.0
            (1, _ts("2024-01-01 10:05:00"), "t2"),   # tie -> 101.0 (inclusive)
            (2, _ts("2024-01-01 10:00:00"), "t3"),   # before any quote -> null
            (3, _ts("2024-01-01 12:00:00"), "t4"),   # key w/o quotes -> null
        ],
        ["k", "tts", "trade_id"],
    )
    out = {
        r.trade_id: r.price_asof
        for r in asof_join(
            trades, quotes, on="k", left_ts="tts", right_ts="qts",
            right_cols=["price"],
        ).collect()
    }
    assert out == {"t1": 100.0, "t2": 101.0, "t3": None, "t4": None}


def test_asof_preserves_left_rowcount(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), i) for i in range(50)],
        ["k", "lts", "i"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2023-12-31 23:00:00"), "x")], ["k", "rts", "v"]
    )
    out = asof_join(left, right, "k", "lts", "rts", ["v"])
    assert out.count() == 50
    assert out.filter("v_asof = 'x'").count() == 50


def test_cogroup_asof_equals_window_asof(spark):
    """Cogrouped pandas merge_asof (asof_join_cogrouped) returns the
    same relation as the union+window operator, including keys with
    no right rows (NULL carry)."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.asof import (
        asof_join,
        asof_join_cogrouped,
    )

    left = spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 200.0), (3, 20, 50.0)],
        "pid long, user_id long, t double",
    )
    right = spark.createDataFrame(
        [(7, 10, 50.0), (8, 10, 150.0), (9, 30, 10.0)],
        "event_id long, user_id long, t double",
    )
    kw = dict(on="user_id", left_ts="t", right_ts="t", right_cols=["event_id"])
    a = sorted(
        map(tuple, asof_join(left, right, **kw).collect())
    )
    b = sorted(
        map(tuple, asof_join_cogrouped(left, right, **kw).collect())
    )
    assert a == b
    # user 20 has no views: NULL carry present
    assert any(r[1] == 20 and r[3] is None for r in b)
