"""Geo radius join (round 12): grid decomposition equals the brute-
force cross join pair-for-pair (the losslessness claim), boundary
behavior, and the declared max_abs_lat filter contract."""

from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators.joins import geo_radius_join, haversine_km


def _pts(spark, prefix, n, a, b):
    # deterministic scatter incl. cell-boundary-straddling values
    rows = [
        (i, ((i * a) % 11000) / 100.0 - 55, ((i * b) % 35000) / 100.0 - 175)
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(rows, f"{prefix}_id int, lat double, lon double")


def test_grid_join_equals_brute_force(spark):
    left = _pts(spark, "l", 120, 37, 73)
    right = _pts(spark, "r", 300, 41, 97)
    got = {
        (r["l_id"], r["r_id_r"])
        for r in geo_radius_join(left, right, radius_km=400.0, max_abs_lat=60.0)
        .select("l_id", "r_id_r")
        .collect()
    }
    brute = (
        left.crossJoin(
            right.select(
                F.col("r_id").alias("r_id_r"),
                F.col("lat").alias("lat_r"),
                F.col("lon").alias("lon_r"),
            )
        )
        .withColumn(
            "d",
            haversine_km(
                F.col("lat"), F.col("lon"), F.col("lat_r"), F.col("lon_r")
            ),
        )
        .filter(F.col("d") <= 400.0)
    )
    want = {(r["l_id"], r["r_id_r"]) for r in brute.collect()}
    assert got == want and len(want) > 50  # non-trivial geometry


def test_radius_boundary_and_zero_distance(spark):
    # 1 degree of longitude at the equator ~ 111.32 km
    left = spark.createDataFrame([(1, 0.0, 0.0)], "l_id int, lat double, lon double")
    right = spark.createDataFrame(
        [(10, 0.0, 0.0), (11, 0.0, 1.0), (12, 0.0, 2.0)],
        "r_id int, lat double, lon double",
    )
    got = {
        r["r_id_r"]: r["dist_km"]
        for r in geo_radius_join(left, right, radius_km=150.0).collect()
    }
    assert set(got) == {10, 11}
    assert got[10] == 0.0 and 111.0 < got[11] < 111.6


def test_max_abs_lat_contract_filters_polar_points(spark):
    left = spark.createDataFrame(
        [(1, 80.0, 0.0), (2, 10.0, 0.0)], "l_id int, lat double, lon double"
    )
    right = spark.createDataFrame(
        [(10, 80.0, 0.0), (11, 10.0, 0.0)], "r_id int, lat double, lon double"
    )
    got = {
        (r["l_id"], r["r_id_r"])
        for r in geo_radius_join(left, right, radius_km=50.0, max_abs_lat=75.0)
        .select("l_id", "r_id_r")
        .collect()
    }
    # the polar pair is excluded by the declared contract, not matched wrongly
    assert got == {(2, 11)}


def test_wrap_lon_stitches_antimeridian(spark):
    left = spark.createDataFrame(
        [(1, 0.0, 179.9)], "l_id int, lat double, lon double"
    )
    right = spark.createDataFrame(
        [(10, 0.0, -179.9), (11, 0.0, 170.0)],
        "r_id int, lat double, lon double",
    )
    # ~22 km across the seam: missed without wrap, found with it
    plain = geo_radius_join(left, right, radius_km=100.0)
    assert {r["r_id_r"] for r in plain.collect()} == set()
    wrapped = geo_radius_join(left, right, radius_km=100.0, wrap_lon=True)
    got = {r["r_id_r"]: r["dist_km"] for r in wrapped.collect()}
    assert set(got) == {10} and 20.0 < got[10] < 25.0


def test_wrap_lon_grid_equals_brute_force(spark):
    left = _pts(spark, "l", 80, 91, 173)
    right = _pts(spark, "r", 200, 87, 211)
    got = {
        (r["l_id"], r["r_id_r"])
        for r in geo_radius_join(
            left, right, radius_km=500.0, max_abs_lat=60.0, wrap_lon=True
        ).select("l_id", "r_id_r").collect()
    }
    brute = (
        left.crossJoin(
            right.select(
                F.col("r_id").alias("r_id_r"),
                F.col("lat").alias("lat_r"),
                F.col("lon").alias("lon_r"),
            )
        )
        .withColumn(
            "d",
            haversine_km(
                F.col("lat"), F.col("lon"), F.col("lat_r"), F.col("lon_r")
            ),
        )
        .filter(F.col("d") <= 500.0)
    )
    want = {(r["l_id"], r["r_id_r"]) for r in brute.collect()}
    assert got == want and len(want) > 30
    # no duplicate candidate leakage through the wrapped neighborhood
    n_rows = (
        geo_radius_join(
            left, right, radius_km=500.0, max_abs_lat=60.0, wrap_lon=True
        ).count()
    )
    assert n_rows == len(want)


def test_wrap_lon_refuses_degenerate_cells(spark):
    import pytest

    left = _pts(spark, "l", 3, 37, 73)
    with pytest.raises(ValueError, match="fewer than 3"):
        geo_radius_join(left, left, radius_km=9000.0, wrap_lon=True)
