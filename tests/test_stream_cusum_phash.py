"""Round-13 additions #3: streaming CUSUM state carry and the
average-hash perceptual image fingerprint.

cusum_stream: certified end-to-end (3-batch replay vs recursive CTE)
by the t_stream_cusum registry entry; here the operator-level
contract — the update function's state carry across calls — is
exercised through a single-batch stream equality with the batch
operator (same rows, one batch: streamed == batch).

image_ahash: brightness invariance (exact, not approximate), pattern
distinctness, BMP/PPM cross-format agreement on identical pixels, and
the grid-divisibility guard.
"""

import pytest
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators.multimodal import (
    encode_bmp,
    encode_ppm,
    encode_ppm_gradient,
    image_ahash,
)
from cbts_datalake_synnex_spark.operators.timeseries import cusum


# Certification tier (round 14): excluded from the default driver-budget
# run via pytest.ini; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


def test_stream_cusum_single_batch_equals_batch(spark, tmp_path):
    import os

    df = spark.createDataFrame(
        [(i, i % 3, float((i * 37) % 200)) for i in range(60)],
        "event_id long, user_id long, value double",
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id")))
    batch = cusum(
        df, "user_id", "ts", "value", order_cols=["event_id"],
        target=50.0, slack=25.0, threshold=120.0,
    )
    src_dir = os.path.join(str(tmp_path), "in")
    df.coalesce(1).write.parquet(src_dir)

    from cbts_datalake_synnex_spark.streaming.stateful import cusum_stream

    src = (
        spark.readStream.schema("event_id long, user_id long, value double, ts timestamp")
        .parquet(src_dir)
    )
    out = cusum_stream(
        src, "user_id", "ts", "value", order_cols=["event_id"],
        target=50.0, slack=25.0, threshold=120.0,
    )
    qn = "t_scusum_unit"
    q = (
        out.writeStream.format("memory").queryName(qn)
        .trigger(availableNow=True).outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r["event_id"]: (r["cusum_hi"], r["cusum_lo"], r["alarm_hi"], r["alarm_lo"])
        for r in spark.table(qn).collect()
    }
    want = {
        r["event_id"]: (r["cusum_hi"], r["cusum_lo"], r["alarm_hi"], r["alarm_lo"])
        for r in batch.collect()
    }
    assert got == want
    spark.catalog.dropTempView(qn)


def test_ahash_brightness_invariant_and_distinct():
    seen = set()
    for k in range(17):
        h0 = image_ahash(encode_ppm_gradient(16, 16, k, 0))
        assert h0 == image_ahash(encode_ppm_gradient(16, 16, k, 10))
        seen.add(h0)
    assert len(seen) == 17


def test_ahash_formats_agree_on_identical_pixels():
    # constant image: all block means equal the overall mean, no bit
    # set — identical zero hash from both codecs
    assert image_ahash(encode_ppm(16, 16, 77)) == image_ahash(
        encode_bmp(16, 16, 77)
    )


def test_ahash_grid_guard():
    with pytest.raises(ValueError, match="not divisible"):
        image_ahash(encode_ppm(10, 16, 5))


def test_stream_kmv_merge_equals_batch_sketch(spark, tmp_path):
    import os

    from cbts_datalake_synnex_spark.operators import sketches
    from cbts_datalake_synnex_spark.streaming.stateful import kmv_stream

    rows = [(i, f"g{i % 2}", f"item{i % 300}") for i in range(900)]
    df = spark.createDataFrame(rows, "event_id long, grp string, item string")
    src_dir = os.path.join(str(tmp_path), "in")
    df.coalesce(1).write.parquet(src_dir)
    src = (
        spark.readStream.schema("event_id long, grp string, item string")
        .parquet(src_dir)
    )
    out = kmv_stream(src, group_col="grp", item_col="item", k=64)
    qn = "t_skmv_unit"
    q = (
        out.writeStream.format("memory").queryName(qn)
        .trigger(availableNow=True).outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .start()
    )
    assert q.awaitTermination(120)
    from pyspark.sql import functions as F2

    got = {
        r["grp"]: (r["n_kept"], round(r["kmv_est"], 6))
        for r in spark.table(qn)
        .groupBy("grp")
        .agg(F2.max_by("n_kept", "upd").alias("n_kept"),
             F2.max_by("kmv_est", "upd").alias("kmv_est"))
        .collect()
    }
    batch = sketches.kmv_build(df.select("grp", "item"), "item", ["grp"], k=64)
    want = {
        r["grp"]: (r["n_kept"], r["kmv_est"])
        for r in sketches.kmv_estimate(batch, ["grp"], k=64).collect()
    }
    assert got == want
    spark.catalog.dropTempView(qn)
