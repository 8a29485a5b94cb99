"""Round-13 additions #2: Holt linear-trend smoothing and the Benford
first-digit audit.

Holt: hand-stepped golden (level/trend/forecast through a ramp — the
case a single EWMA lags), ramp-tracking property (on an exact linear
ramp the trend converges toward the slope), and entity isolation.

Benford: a constructed Benford-conforming sample must NOT reject; a
flat (uniform-first-digit) sample MUST reject; absent digits are kept
with their full expected-count contribution.
"""

from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators.dq import benford_report
from cbts_datalake_synnex_spark.operators.timeseries import holt


def _series(spark, xs, user=1):
    rows = [(i, user, float(i), float(x)) for i, x in enumerate(xs)]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts double, value double"
    )


def test_holt_golden(spark):
    # alpha=0.5, beta=0.5 keeps the hand arithmetic exact in binary
    out = (
        holt(_series(spark, [10.0, 14.0, 18.0]), "user_id", "ts", "value",
             order_cols=["event_id"], alpha=0.5, beta=0.5)
        .orderBy("event_id")
        .collect()
    )
    # i=1: l=10, b=0, f=10
    # i=2: f=10, l=.5*14+.5*10=12, b=.5*(12-10)+.5*0=1
    # i=3: f=13, l=.5*18+.5*13=15.5, b=.5*(15.5-12)+.5*1=2.25
    assert [r["level"] for r in out] == [10.0, 12.0, 15.5]
    assert [r["trend"] for r in out] == [0.0, 1.0, 2.25]
    assert [r["forecast"] for r in out] == [10.0, 10.0, 13.0]


def test_holt_tracks_ramp(spark):
    # exact ramp slope 3: trend must approach 3, forecast error -> 0
    xs = [5.0 + 3.0 * i for i in range(60)]
    last = (
        holt(_series(spark, xs), "user_id", "ts", "value",
             order_cols=["event_id"])
        .orderBy("event_id")
        .collect()[-1]
    )
    assert abs(last["trend"] - 3.0) < 0.05
    assert abs(last["forecast"] - last["value"]) < 0.5


def test_holt_entity_isolation(spark):
    a = _series(spark, [100.0, 100.0], user=1)
    b = _series(spark, [1.0, 1.0], user=2)
    out = {
        (r["user_id"], r["event_id"]): r
        for r in holt(a.unionAll(b), "user_id", "ts", "value",
                      order_cols=["event_id"]).collect()
    }
    # user 2's first row restarts the state: level == its own x1
    assert out[(2, 0)]["level"] == 1.0
    assert out[(2, 0)]["trend"] == 0.0


def _amounts(spark, cents_list):
    return spark.createDataFrame([(c,) for c in cents_list], "cents long")


def test_benford_conforming_sample_not_rejected(spark):
    # powers of a generator mod decades: 2^k first digits follow
    # Benford closely (equidistribution of k*log10(2) mod 1)
    cents = [2 ** k % 10 ** 9 + 10 ** 9 for k in range(200)]
    # 2^k itself, truncated to leading digits via python ints
    cents = [int(str(2 ** k)[:9]) for k in range(1, 400)]
    rep = benford_report(_amounts(spark, cents), F.col("cents")).collect()
    assert len(rep) == 9
    assert not rep[0]["benford_reject"]


def test_benford_uniform_digits_rejected(spark):
    # 900 amounts with a flat first-digit histogram: chi2 far above 26
    cents = [d * 1000 + i for d in range(1, 10) for i in range(100)]
    rep = benford_report(_amounts(spark, cents), F.col("cents")).collect()
    assert rep[0]["benford_reject"]


def test_benford_absent_digit_kept(spark):
    # only digit 1 present: digits 2..9 must appear with n_obs=0 and
    # positive expected-count contributions
    cents = [100 + i for i in range(50)]
    rows = {r["digit"]: r for r in
            benford_report(_amounts(spark, cents), F.col("cents")).collect()}
    assert set(rows) == set(range(1, 10))
    assert rows[9]["n_obs"] == 0
    assert rows[9]["contrib"] > 0
    assert rows[1]["benford_reject"]
