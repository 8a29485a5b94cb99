"""Concurrent-curate scheduling (round 13): MaxConcurrentRuns-style
bounded fan-out, per-thread scheduler pools, and per-job error
isolation."""

import shutil
import tempfile
import threading
import time
import uuid

import pytest
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.engine import LakeEngine


# Certification tier (round 14): excluded from the default driver-budget
# run via pytest.ini; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


@pytest.fixture()
def eng(spark):
    root = tempfile.mkdtemp(prefix="cc_")
    db = f"cc_{uuid.uuid4().hex[:8]}"
    e = LakeEngine(spark, root, database=db)
    yield e
    spark.catalog.setCurrentDatabase("default")
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(root, ignore_errors=True)


def test_concurrent_curates_bounded_and_correct(spark, eng):
    in_flight = 0
    peak = 0
    gate = threading.Lock()

    def make_job(i):
        def job():
            nonlocal in_flight, peak
            with gate:
                in_flight += 1
                peak = max(peak, in_flight)
            try:
                df = spark.range(0, 100).select(
                    F.col("id").alias("k"), F.lit(f"t{i}").alias("src")
                )
                eng.write_curated(f"tab{i}", df, mode="overwrite", partition_cols=[])
                time.sleep(0.05)  # hold the slot so overlap is observable
                return spark.table(eng.qualified(f"tab{i}")).count()
            finally:
                with gate:
                    in_flight -= 1

        return job

    res = eng.run_concurrent({f"j{i}": make_job(i) for i in range(6)}, max_concurrent=3)
    assert set(res) == {f"j{i}" for i in range(6)}
    assert all(v == 100 for v in res.values()), res
    assert peak <= 3, f"concurrency bound violated: peak {peak}"
    for i in range(6):
        assert spark.table(eng.qualified(f"tab{i}")).count() == 100


def test_concurrent_error_isolation_and_pools(spark, eng):
    pools = {}

    def good():
        pools["good"] = spark.sparkContext.getLocalProperty("spark.scheduler.pool")
        return spark.range(5).count()

    def bad():
        raise ValueError("boom")

    res = eng.run_concurrent({"good": good, "bad": bad}, max_concurrent=2)
    assert res["good"] == 5
    assert isinstance(res["bad"], ValueError)
    # each job's thread carried its own pool tag
    assert pools["good"] == "curate_good"
    # the pool local property did not leak into this (main) thread
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") in (None, "")


def test_scheduler_pool_restores_previous(spark, eng):
    sc = spark.sparkContext
    with eng.scheduler_pool("outer"):
        assert sc.getLocalProperty("spark.scheduler.pool") == "outer"
        with eng.scheduler_pool("inner"):
            assert sc.getLocalProperty("spark.scheduler.pool") == "inner"
        assert sc.getLocalProperty("spark.scheduler.pool") == "outer"
    assert sc.getLocalProperty("spark.scheduler.pool") in (None, "")
