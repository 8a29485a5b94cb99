"""Time-weighted average + OHLC bar goldens (round 12)."""

from pyspark.sql import functions as F


def test_time_weighted_avg_locf_and_single_obs(spark):
    from cbts_datalake_synnex_spark.operators.timeseries import time_weighted_avg

    # entity a: 10.0 holds 3 s, then 20.0 holds 1 s -> twa = (10*3+20*1)/4
    rows = [
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 00:00:03", 20.0),
        ("a", "2024-01-01 00:00:04", 99.0),  # final obs spans zero time
        ("b", "2024-01-01 00:00:00", 7.5),   # single obs: twa = value
    ]
    df = spark.createDataFrame(rows, "e string, ts string, v double").select(
        "e", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    got = {r["e"]: r for r in time_weighted_avg(df, "e", "ts", "v").collect()}
    assert got["a"]["twa"] == round((10 * 3 + 20 * 1) / 4, 6)
    assert got["a"]["span_us"] == 4_000_000 and got["a"]["n_obs"] == 3
    assert got["b"]["twa"] == 7.5 and got["b"]["span_us"] == 0


def test_ohlc_bars_open_close_by_time(spark):
    from cbts_datalake_synnex_spark.operators.timeseries import ohlc_bars

    rows = [
        # one 1-hour bar: open = first by time, close = last by time,
        # high/low independent of order
        ("a", "2024-01-01 05:10:00", 5.0),
        ("a", "2024-01-01 05:20:00", 1.0),
        ("a", "2024-01-01 05:40:00", 9.0),
        ("a", "2024-01-01 05:50:00", 4.0),
        # next bar, single obs: all four equal
        ("a", "2024-01-01 06:30:00", 2.0),
    ]
    df = spark.createDataFrame(rows, "e string, ts string, v double").select(
        "e", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    got = sorted(
        ohlc_bars(df, "e", "ts", "v", bar_hours=1).collect(),
        key=lambda r: r["bar_start_us"],
    )
    b1, b2 = got
    assert (b1["open"], b1["high"], b1["low"], b1["close"]) == (5.0, 9.0, 1.0, 4.0)
    assert b1["n_obs"] == 4
    assert (b2["open"], b2["high"], b2["low"], b2["close"]) == (2.0,) * 4
    # bar floors are exact hour multiples
    assert all(r["bar_start_us"] % 3_600_000_000 == 0 for r in got)
