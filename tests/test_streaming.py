"""Streaming golden tests (SURVEY §5.2-2: T1-T5) — fixed event-time
inputs, asserted window outputs including late-row drop."""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timezone

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cbts_datalake_synnex_spark.engine import LakeEngine
from cbts_datalake_synnex_spark.streaming import (
    incremental_curate,
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_agg,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("user_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

CLOCK = lambda: datetime(2024, 5, 17, 12, 0, 0, tzinfo=timezone.utc)  # noqa: E731


# Certification tier (round 14): excluded from the default driver-budget
# run via pytest.ini; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


def _write_file(dirpath: str, name: str, rows: list[dict], mtime: float) -> None:
    os.makedirs(dirpath, exist_ok=True)
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(p, (mtime, mtime))


def _run_stream(spark, src_dir, ckpt, build, query_name):
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {query_name}")


# ----------------------------------------------------------------------
# T1/T2 — incremental staging→curated with checkpointed exactly-once.
def test_incremental_curate_exactly_once(spark, tmp_path):
    db = f"t_{abs(hash(str(tmp_path))) % 10**9}"
    engine = LakeEngine(spark, str(tmp_path / "lake"), database=db, clock=CLOCK)
    try:
        ckpt = str(tmp_path / "ckpt")
        engine.save_to_staging("po_status", [{"po_number": "PO1", "qty": 1}], incremental=False)
        q = incremental_curate(engine, "po_status", ckpt)
        q.awaitTermination(120)
        assert spark.table(engine.qualified("po_status")).count() == 1

        # second batch: same checkpoint consumes ONLY the new file (T2)
        engine.save_to_staging("po_status", [{"po_number": "PO2", "qty": 2}], incremental=False)
        q = incremental_curate(engine, "po_status", ckpt)
        q.awaitTermination(120)
        rows = {r["po_number"] for r in spark.table(engine.qualified("po_status")).collect()}
        assert rows == {"PO1", "PO2"}
        assert spark.table(engine.qualified("po_status")).count() == 2  # no re-ingest
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


# ----------------------------------------------------------------------
# T4 — tumbling window with watermark: late row dropped.
def test_tumbling_window_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    now = time.time()
    # batch 1: two events in the 10:00 window, one at 11:00 (advances
    # the event-time max to 11:00)
    _write_file(
        src,
        "b1.json",
        [
            {"event_id": "e1", "user_id": "u1", "ts": "2024-01-01T10:00:05.000Z", "value": 1.0},
            {"event_id": "e2", "user_id": "u1", "ts": "2024-01-01T10:02:00.000Z", "value": 2.0},
            {"event_id": "e3", "user_id": "u1", "ts": "2024-01-01T11:00:00.000Z", "value": 4.0},
        ],
        now - 30,
    )
    # batch 2: far-future flush → watermark passes every earlier window.
    # (A separate batch because the watermark used for filtering in
    # batch N is derived from batches < N.)
    _write_file(
        src,
        "b2.json",
        [{"event_id": "flush", "user_id": "u1", "ts": "2024-01-01T15:00:00.000Z", "value": 0.0}],
        now - 20,
    )
    # batch 3: a LATE event for the long-closed 10:00 window.
    _write_file(
        src,
        "b3.json",
        [{"event_id": "late", "user_id": "u1", "ts": "2024-01-01T10:01:00.000Z", "value": 100.0}],
        now - 10,
    )
    out = _run_stream(
        spark,
        src,
        str(tmp_path / "ckpt"),
        lambda s: tumbling_window_agg(
            s,
            "ts",
            "5 minutes",
            keys=("user_id",),
            aggs=(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")),
            watermark="10 minutes",
        ),
        "tumbling_test",
    )
    rows = [
        (r["window_start"].isoformat(), r["n"], r["total"])
        for r in out.collect()
        if r["window_start"].isoformat().startswith("2024-01-01T10:0")
    ]
    # exactly ONE emission for the 10:00 window, without the late row:
    # (2, 3.0). Were the late row not dropped, append mode would emit a
    # second (1, 100.0) row for the same window.
    assert rows == [("2024-01-01T10:00:00", 2, 3.0)]


# ----------------------------------------------------------------------
# T5 — streaming dedup within watermark.
def test_streaming_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    now = time.time()
    _write_file(
        src,
        "b1.json",
        [
            {"event_id": "k1", "user_id": "u1", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
            {"event_id": "k2", "user_id": "u1", "ts": "2024-01-01T10:00:30.000Z", "value": 2.0},
        ],
        now - 20,
    )
    _write_file(
        src,
        "b2.json",
        [
            # duplicate k1 inside the watermark horizon → dropped
            {"event_id": "k1", "user_id": "u1", "ts": "2024-01-01T10:01:00.000Z", "value": 99.0},
            {"event_id": "k3", "user_id": "u1", "ts": "2024-01-01T10:02:00.000Z", "value": 3.0},
        ],
        now - 10,
    )
    out = _run_stream(
        spark,
        src,
        str(tmp_path / "ckpt"),
        lambda s: streaming_dedup(s, keys=["event_id"], ts_col="ts", watermark="30 minutes"),
        "dedup_test",
    )
    got = {(r["event_id"], r["value"]) for r in out.collect()}
    assert got == {("k1", 1.0), ("k2", 2.0), ("k3", 3.0)}


# ----------------------------------------------------------------------
# T4 — session window in TRUE streaming mode: sessions merge within a
# batch, close when the watermark passes gap, late rows dropped.
def test_session_window_streaming(spark, tmp_path):
    src = str(tmp_path / "src")
    now = time.time()
    _write_file(
        src,
        "b1.json",
        [
            {"event_id": "e1", "user_id": "u1", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
            {"event_id": "e2", "user_id": "u1", "ts": "2024-01-01T10:10:00.000Z", "value": 2.0},
            {"event_id": "e3", "user_id": "u1", "ts": "2024-01-01T12:00:00.000Z", "value": 3.0},
        ],
        now - 20,
    )
    # flush batch: watermark passes every session's close
    _write_file(
        src,
        "b2.json",
        [{"event_id": "flush", "user_id": "u2", "ts": "2024-01-02T00:00:00.000Z", "value": 0.0}],
        now - 10,
    )
    out = _run_stream(
        spark,
        src,
        str(tmp_path / "ckpt"),
        lambda s: session_window_agg(
            s,
            "ts",
            "30 minutes",
            keys=("user_id",),
            aggs=(F.count(F.lit(1)).alias("n"),),
            watermark="10 minutes",
        ),
        "session_stream_test",
    )
    got = {
        (r["user_id"], r["window_start"].isoformat(), r["n"])
        for r in out.collect()
        if r["user_id"] == "u1"
    }
    # e1+e2 merge into one session (gap 10m < 30m); e3 is its own
    assert got == {
        ("u1", "2024-01-01T10:00:00", 2),
        ("u1", "2024-01-01T12:00:00", 1),
    }


# ----------------------------------------------------------------------
# T4 batch twins — the same builders in batch mode (watermark no-op).
@pytest.fixture()
def events_df(spark):
    rows = [
        ("e1", "u1", datetime(2024, 1, 1, 10, 0, 0), 1.0),
        ("e2", "u1", datetime(2024, 1, 1, 10, 4, 0), 2.0),
        ("e3", "u1", datetime(2024, 1, 1, 10, 45, 0), 3.0),
        ("e4", "u2", datetime(2024, 1, 1, 10, 1, 0), 4.0),
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_session_window_batch_golden(spark, events_df):
    out = session_window_agg(
        events_df, "ts", "30 minutes", keys=("user_id",), aggs=(F.count(F.lit(1)).alias("n"),)
    )
    got = {(r["user_id"], r["window_start"].isoformat(), r["n"]) for r in out.collect()}
    # u1: e1+e2 one session (gap 4m), e3 a new session (gap 41m)
    assert got == {
        ("u1", "2024-01-01T10:00:00", 2),
        ("u1", "2024-01-01T10:45:00", 1),
        ("u2", "2024-01-01T10:01:00", 1),
    }


def test_sliding_window_batch_golden(spark, events_df):
    out = sliding_window_agg(
        events_df.filter(F.col("user_id") == "u1"),
        "ts",
        "10 minutes",
        "5 minutes",
        aggs=(F.count(F.lit(1)).alias("n"),),
    )
    got = {(r["window_start"].isoformat(), r["n"]) for r in out.collect()}
    # e1@10:00 lands in [9:55,10:05) and [10:00,10:10); e2@10:04 the same
    assert got == {
        ("2024-01-01T09:55:00", 2),
        ("2024-01-01T10:00:00", 2),
        ("2024-01-01T10:40:00", 1),
        ("2024-01-01T10:45:00", 1),
    }


# ----------------------------------------------------------------------
# T5+ — custom stateful operator (applyInPandasWithState): cumulative
# per-key stats must CARRY ACROSS micro-batches (that's the state).
def test_stateful_running_stats_across_batches(spark, tmp_path):
    from cbts_datalake_synnex_spark.streaming import running_stats

    src = str(tmp_path / "src")
    now = time.time()
    _write_file(
        src,
        "b1.json",
        [
            {"event_id": "e1", "user_id": "u1", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
            {"event_id": "e2", "user_id": "u1", "ts": "2024-01-01T10:01:00.000Z", "value": 5.0},
            {"event_id": "e3", "user_id": "u2", "ts": "2024-01-01T10:02:00.000Z", "value": 7.0},
        ],
        now - 20,
    )
    _write_file(
        src,
        "b2.json",
        [
            {"event_id": "e4", "user_id": "u1", "ts": "2024-01-01T11:00:00.000Z", "value": 2.0},
        ],
        now - 10,
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        running_stats(stream, key="user_id", value_col="value")
        .writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stateful_test").collect()
    # update mode re-emits per batch; the final row per key holds the
    # cumulative totals — u1 must include batch-1 AND batch-2 events.
    final = {}
    for r in rows:
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]["n_events"]:
            final[r["user_id"]] = r
    u1, u2 = final["u1"], final["u2"]
    assert u1["n_events"] == 3 and u1["total_value"] == 8.0 and u1["max_value"] == 5.0
    assert u2["n_events"] == 1 and u2["total_value"] == 7.0 and u2["max_value"] == 7.0


# ----------------------------------------------------------------------
# Stream-stream join: impressions ⋈ clicks by user within a time band.
# The click outside the band must NOT match.
def test_stream_stream_join_within_band(spark, tmp_path):
    from cbts_datalake_synnex_spark.streaming.joins import stream_stream_join

    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    now = time.time()
    _write_file(
        imp_dir,
        "i1.json",
        [
            {"event_id": "i1", "user_id": "u1", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
            {"event_id": "i2", "user_id": "u2", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
        ],
        now - 20,
    )
    clk_schema = StructType(
        [
            StructField("click_id", StringType()),
            StructField("user_id", StringType()),
            StructField("click_ts", TimestampType()),
        ]
    )
    with open(os.path.join(tmp_path, "c1.json"), "w") as f:
        # u1 clicks 5 min after impression (inside the 15-min band);
        # u2 clicks 3 h later (outside) — must not join.
        f.write(json.dumps({"click_id": "c1", "user_id": "u1", "click_ts": "2024-01-01T10:05:00.000Z"}) + "\n")
        f.write(json.dumps({"click_id": "c2", "user_id": "u2", "click_ts": "2024-01-01T13:00:00.000Z"}) + "\n")
    os.makedirs(clk_dir, exist_ok=True)
    os.replace(os.path.join(tmp_path, "c1.json"), os.path.join(clk_dir, "c1.json"))

    imps = spark.readStream.schema(EVENT_SCHEMA).json(imp_dir)
    clks = spark.readStream.schema(clk_schema).json(clk_dir)
    joined = stream_stream_join(
        imps, clks, key="user_id", left_ts="ts", right_ts="click_ts",
        watermark="10 minutes", band="15 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT event_id, click_id FROM ssj_test").collect()
    assert {(r["event_id"], r["click_id"]) for r in rows} == {("i1", "c1")}


# ----------------------------------------------------------------------
# T1 + materialized views: dependent mviews refresh per micro-batch.
def test_incremental_curate_refreshes_mviews(spark, tmp_path):
    db = f"t_{abs(hash(str(tmp_path))) % 10**9}"
    engine = LakeEngine(spark, str(tmp_path / "lake"), database=db, clock=CLOCK)
    try:
        ckpt = str(tmp_path / "ckpt")
        engine.save_to_staging("po_status", [{"po_number": "PO1", "qty": 1}], incremental=False)
        q = incremental_curate(engine, "po_status", ckpt)
        q.awaitTermination(120)
        engine.create_materialized_view(
            "mv_po_count",
            f"SELECT count(*) AS n FROM {engine.qualified('po_status')}",
        )
        assert spark.table(engine.qualified("mv_po_count")).collect()[0]["n"] == 1

        engine.save_to_staging("po_status", [{"po_number": "PO2", "qty": 2}], incremental=False)
        q = incremental_curate(engine, "po_status", ckpt, refresh_views=["mv_po_count"])
        q.awaitTermination(120)
        assert spark.table(engine.qualified("mv_po_count")).collect()[0]["n"] == 2
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_incremental_curate_merges_incremental_view(spark, tmp_path):
    """An incremental view wired into the per-batch refresh hook must
    take the merge path (not full recompute) on the second batch."""
    db = f"t_{abs(hash(str(tmp_path))) % 10**9}"
    engine = LakeEngine(spark, str(tmp_path / "lake"), database=db, clock=CLOCK)
    try:
        ckpt = str(tmp_path / "ckpt")
        engine.save_to_staging("po_inc", [{"po_number": "PO1", "qty": 1}], incremental=False)
        q = incremental_curate(engine, "po_inc", ckpt)
        q.awaitTermination(120)
        engine.create_incremental_view(
            "iv_po_count", "po_inc", ["po_number"], [("count", "*", "n")]
        )
        engine.save_to_staging("po_inc", [{"po_number": "PO1", "qty": 2}], incremental=False)
        q = incremental_curate(engine, "po_inc", ckpt, refresh_views=["iv_po_count"])
        q.awaitTermination(120)
        rows = {r["po_number"]: r["n"] for r in spark.table(engine.qualified("iv_po_count")).collect()}
        assert rows == {"PO1": 2}
        # the stream's refresh went through the merge path: the recorded
        # file set now matches the table, so a manual refresh is a noop
        assert engine.refresh_materialized_view("iv_po_count") == "noop"
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_stream_stream_left_outer_emits_after_watermark(spark, tmp_path):
    """Left-outer band join: the unmatched left row must appear with a
    null right side — but only once the watermark has passed its
    band (Spark can't declare 'no match' earlier)."""
    from cbts_datalake_synnex_spark.streaming.joins import stream_stream_join

    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    now = time.time()
    _write_file(
        imp_dir,
        "i1.json",
        [
            {"event_id": "i1", "user_id": "u1", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
            {"event_id": "i2", "user_id": "u2", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
        ],
        now - 30,
    )
    # a later batch on BOTH sides advances the watermark far past the
    # band, forcing the unmatched i2 to be emitted null-extended
    _write_file(
        imp_dir,
        "i2.json",
        [{"event_id": "i9", "user_id": "u9", "ts": "2024-01-01T12:00:00.000Z", "value": 1.0}],
        now - 10,
    )
    clk_schema = StructType(
        [
            StructField("click_id", StringType()),
            StructField("user_id", StringType()),
            StructField("click_ts", TimestampType()),
        ]
    )
    os.makedirs(clk_dir, exist_ok=True)
    with open(os.path.join(clk_dir, "c1.json"), "w") as f:
        f.write(json.dumps({"click_id": "c1", "user_id": "u1", "click_ts": "2024-01-01T10:05:00.000Z"}) + "\n")
    with open(os.path.join(clk_dir, "c2.json"), "w") as f:
        f.write(json.dumps({"click_id": "c9", "user_id": "u9", "click_ts": "2024-01-01T12:00:01.000Z"}) + "\n")
    os.utime(os.path.join(clk_dir, "c1.json"), (now - 30, now - 30))
    os.utime(os.path.join(clk_dir, "c2.json"), (now - 10, now - 10))

    imps = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).json(imp_dir)
    clks = spark.readStream.schema(clk_schema).option("maxFilesPerTrigger", 1).json(clk_dir)
    joined = stream_stream_join(
        imps, clks, key="user_id", left_ts="ts", right_ts="click_ts",
        watermark="5 minutes", band="15 minutes", how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {(r["event_id"], r["click_id"]) for r in spark.sql("SELECT event_id, click_id FROM ssj_outer").collect()}
    assert ("i1", "c1") in rows          # matched inside the band
    assert ("i2", None) in rows          # unmatched → null-extended after watermark


def test_first_seen_admission_contract_v1(spark, tmp_path):
    """The first-seen admission CONTRACT, pinned under the v1 API
    (applyInPandasWithState) which RUNS on this image: identical
    scenario to the protobuf-gated v2 golden below, so wherever both
    run, both must produce these exact rows."""
    from cbts_datalake_synnex_spark.streaming import first_seen_admission_v1

    src = str(tmp_path / "src")
    now = time.time()
    _write_file(
        src,
        "b1.json",
        [
            {"event_id": "e1", "user_id": "u1", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
            {"event_id": "e2", "user_id": "u1", "ts": "2024-01-01T10:01:00.000Z", "value": 5.0},
            {"event_id": "e3", "user_id": "u2", "ts": "2024-01-01T10:02:00.000Z", "value": 7.0},
        ],
        now - 20,
    )
    _write_file(
        src,
        "b2.json",
        [
            {"event_id": "e4", "user_id": "u1", "ts": "2024-01-01T11:00:00.000Z", "value": 2.0},
            {"event_id": "e5", "user_id": "u3", "ts": "2024-01-01T11:01:00.000Z", "value": 9.0},
        ],
        now - 10,
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        first_seen_admission_v1(stream, key="user_id")
        .writeStream.format("memory")
        .queryName("v1_first_seen")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["user_id"]: r for r in spark.sql("SELECT * FROM v1_first_seen").collect()}
    # THE CONTRACT (shared with the v2 golden): u1 admitted once from
    # batch 1, u2 from batch 1, u3 from batch 2; u1's batch-2 event e4
    # must NOT appear; admitted rows carry n_prior = 0.
    assert set(rows) == {"u1", "u2", "u3"}
    assert rows["u1"]["event_id"] == "e1" and rows["u1"]["n_prior"] == 0
    assert rows["u2"]["event_id"] == "e3" and rows["u2"]["n_prior"] == 0
    assert rows["u3"]["event_id"] == "e5" and rows["u3"]["n_prior"] == 0


def test_first_seen_admission_transform_with_state(spark, tmp_path):
    """v2 arbitrary-state API (transformWithStateInPandas): a key's row
    is emitted only in the first micro-batch it appears; later batches
    touch state but emit nothing.

    The v2 runtime serializes state messages with protobuf; skip (with
    the operator still import-checked) when google.protobuf is absent
    from the image — same declared-dependency gate as the Delta
    branches (SURVEY §8.1)."""
    from cbts_datalake_synnex_spark.streaming import first_seen_admission

    pytest.importorskip("google.protobuf", reason="transformWithState v2 runtime needs protobuf")

    src = str(tmp_path / "src")
    now = time.time()
    _write_file(
        src,
        "b1.json",
        [
            {"event_id": "e1", "user_id": "u1", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
            {"event_id": "e2", "user_id": "u1", "ts": "2024-01-01T10:01:00.000Z", "value": 5.0},
            {"event_id": "e3", "user_id": "u2", "ts": "2024-01-01T10:02:00.000Z", "value": 7.0},
        ],
        now - 20,
    )
    _write_file(
        src,
        "b2.json",
        [
            {"event_id": "e4", "user_id": "u1", "ts": "2024-01-01T11:00:00.000Z", "value": 2.0},
            {"event_id": "e5", "user_id": "u3", "ts": "2024-01-01T11:01:00.000Z", "value": 9.0},
        ],
        now - 10,
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        first_seen_admission(stream, key="user_id")
        .writeStream.format("memory")
        .queryName("tws_first_seen")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["user_id"]: r for r in spark.sql("SELECT * FROM tws_first_seen").collect()}
    # u1 admitted once (from batch 1), u2 from batch 1, u3 from batch 2;
    # u1's batch-2 event e4 must NOT appear.
    assert set(rows) == {"u1", "u2", "u3"}
    assert rows["u1"]["event_id"] == "e1" and rows["u1"]["n_prior"] == 0
    assert rows["u3"]["event_id"] == "e5"


# ----------------------------------------------------------------------
# CDC stream → MERGE sink ([EXT] round 5): foreachBatch + apply_changes,
# the streaming form of Delta's upsert pattern.
def test_incremental_apply_changes_two_batches(spark, tmp_path):
    from cbts_datalake_synnex_spark.streaming import incremental_apply_changes

    db = f"t_{abs(hash(str(tmp_path))) % 10**9}"
    engine = LakeEngine(spark, str(tmp_path / "lake"), database=db, clock=CLOCK)
    src = str(tmp_path / "cdc")
    ckpt = str(tmp_path / "ckpt")
    try:
        # batch 1 bootstraps the table: I rows (one D for a never-seen
        # key is discarded), latest-seq-wins within the batch
        _write_file(src, "b1.json", [
            {"k": 1, "v": "a", "op": "I", "seq": 1},
            {"k": 2, "v": "OLD", "op": "I", "seq": 1},
            {"k": 2, "v": "b", "op": "U", "seq": 2},
            {"k": 9, "v": None, "op": "D", "seq": 1},
        ], time.time() - 10)
        q = incremental_apply_changes(
            engine, "cdc_t", src, ckpt, keys=["k"],
            sequence_col="seq", partition_cols=[],
        )
        q.awaitTermination(120)
        qt = engine.qualified("cdc_t")
        got = {r["k"]: r["v"] for r in spark.table(qt).collect()}
        assert got == {1: "a", 2: "b"}, got
        assert "op" not in spark.table(qt).columns

        # batch 2 via the same checkpoint: only the new file consumed;
        # delete k=1, update k=2, insert k=3
        _write_file(src, "b2.json", [
            {"k": 1, "v": None, "op": "D", "seq": 3},
            {"k": 2, "v": "b2", "op": "U", "seq": 3},
            {"k": 3, "v": "c", "op": "I", "seq": 3},
        ], time.time())
        q = incremental_apply_changes(
            engine, "cdc_t", src, ckpt, keys=["k"],
            sequence_col="seq", partition_cols=[],
        )
        q.awaitTermination(120)
        got = {r["k"]: r["v"] for r in spark.table(qt).collect()}
        assert got == {2: "b2", 3: "c"}, got
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_incremental_apply_changes_replay_idempotent(spark, tmp_path):
    """Crash-replay contract: re-applying an already-applied batch (a
    fresh checkpoint over the same files) must not change the table."""
    from cbts_datalake_synnex_spark.streaming import incremental_apply_changes

    db = f"t_{abs(hash(str(tmp_path))) % 10**9}"
    engine = LakeEngine(spark, str(tmp_path / "lake"), database=db, clock=CLOCK)
    src = str(tmp_path / "cdc")
    try:
        _write_file(src, "b1.json", [
            {"k": 1, "v": "a", "op": "I", "seq": 1},
            {"k": 2, "v": "b", "op": "I", "seq": 1},
            {"k": 2, "v": None, "op": "D", "seq": 2},
        ], time.time())
        for attempt in ("ckpt1", "ckpt2"):  # second run = replay
            q = incremental_apply_changes(
                engine, "cdc_r", src, str(tmp_path / attempt), keys=["k"],
                sequence_col="seq", partition_cols=[],
            )
            q.awaitTermination(120)
            got = {r["k"]: r["v"] for r in spark.table(engine.qualified("cdc_r")).collect()}
            assert got == {1: "a"}, (attempt, got)
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


# ----------------------------------------------------------------------
# Round 7 — the pretraining-hygiene gates composed into the T1/T2
# streaming ingest: incremental_curate's transform hook runs Gopher +
# C4 per micro-batch, so only passing documents (with their CLEANED
# text) ever land in the curated table, and the checkpoint still
# guarantees each staged file is gated exactly once.
def test_incremental_curate_with_hygiene_gates(spark, tmp_path):
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.operators import text as T

    db = f"t_{abs(hash(str(tmp_path) + 'hyg')) % 10**9}"
    engine = LakeEngine(spark, str(tmp_path / "lake"), database=db, clock=CLOCK)

    def hygiene(df):
        flags = T.c4_clean(
            T.gopher_quality_flags(df, "text"), "text",
            min_kept_lines=1, line_terminal_punct=False,
        )
        return (
            flags.filter(F.col("gopher_pass") & F.col("c4_keep"))
            .select("doc_id", F.col("c4_text").alias("text"))
        )

    good_body = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6).strip()
    try:
        ckpt = str(tmp_path / "ckpt")
        engine.save_to_staging(
            "hygiene_docs",
            [
                {"doc_id": 1, "text": good_body},
                {"doc_id": 2, "text": "too short to pass gopher"},
            ],
            incremental=False,
        )
        q = incremental_curate(engine, "hygiene_docs", ckpt, transform=hygiene)
        q.awaitTermination(120)
        # ids ride through the ingest policy as strings; compare numerically
        rows = {int(r["doc_id"]) for r in spark.table(engine.qualified("hygiene_docs")).collect()}
        assert rows == {1}

        # batch 2: only the NEW file is gated; a curly-brace page drops
        engine.save_to_staging(
            "hygiene_docs",
            [
                {"doc_id": 3, "text": good_body + " extra"},
                {"doc_id": 4, "text": good_body + " {code}"},
            ],
            incremental=False,
        )
        q = incremental_curate(engine, "hygiene_docs", ckpt, transform=hygiene)
        q.awaitTermination(120)
        rows = {int(r["doc_id"]) for r in spark.table(engine.qualified("hygiene_docs")).collect()}
        assert rows == {1, 3}
        assert spark.table(engine.qualified("hygiene_docs")).count() == 2  # no re-ingest
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


# ---------------------------------------------------------------------------
# Misra-Gries streaming heavy hitters (round 9)


def test_mg_merge_exact_below_cap_and_guarantee_above():
    import random

    from cbts_datalake_synnex_spark.streaming.stateful import mg_merge

    rng = random.Random(7)
    # true multiset: one heavy item, a mid item, and a tail of singletons
    stream = ["heavy"] * 400 + ["mid"] * 60 + [f"t{i}" for i in range(100)]
    rng.shuffle(stream)
    true = {}
    for x in stream:
        true[x] = true.get(x, 0) + 1

    # exact regime: cap >= distinct -> no decrement, counts exact,
    # and the result is independent of the batch split
    for n_batches in (1, 3, 7):
        st, d_total = {}, 0
        size = (len(stream) + n_batches - 1) // n_batches
        for k in range(n_batches):
            batch = stream[k * size : (k + 1) * size]
            bc = {}
            for x in batch:
                bc[x] = bc.get(x, 0) + 1
            st, d = mg_merge(st, bc, cap=200)
            d_total += d
        assert d_total == 0 and st == true

    # eviction regime: cap 8 << 102 distinct — the published MG
    # guarantee: est <= true <= est + d_total for tracked items, and
    # any item with true count > d_total is tracked
    st, d_total = {}, 0
    size = (len(stream) + 4) // 5
    for k in range(5):
        batch = stream[k * size : (k + 1) * size]
        bc = {}
        for x in batch:
            bc[x] = bc.get(x, 0) + 1
        st, d = mg_merge(st, bc, cap=8)
        d_total += d
    assert len(st) <= 8 and d_total > 0
    for item, est in st.items():
        assert est <= true[item] <= est + d_total
    for item, cnt in true.items():
        if cnt > d_total:
            assert item in st, f"{item} (count {cnt} > bound {d_total}) evicted"


def test_heavy_hitters_stream_equals_batch_counts(spark, tmp_path):
    import os

    from cbts_datalake_synnex_spark.streaming.stateful import heavy_hitters_stream

    rows = [(i, f"g{i % 2}", f"u{(i * 13) % 9}") for i in range(300)]
    df = spark.createDataFrame(rows, "event_id bigint, grp string, item string")
    for k in range(3):
        d = str(tmp_path / "in" / f"d{k}")
        df.filter(F.col("event_id") % 3 == k).coalesce(1).write.parquet(d)
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (1000 * (k + 1), 1000 * (k + 1)))
    src = (
        spark.readStream.schema("event_id bigint, grp string, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    hh = heavy_hitters_stream(src, group_col="grp", item_col="item", cap=16)
    q = (
        hh.writeStream.format("memory")
        .queryName("hh_golden")
        .trigger(availableNow=True)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(120)
    emitted = spark.table("hh_golden")
    final = (
        emitted.withColumn("mx", F.max("n_seen").over(Window.partitionBy("grp")))
        .filter("n_seen = mx")
    )
    got = {(r["grp"], r["item"]): r["est_count"] for r in final.collect()}
    assert all(r["err_bound"] == 0 for r in final.collect())
    want = {
        (r["grp"], r["item"]): r["n"]
        for r in df.groupBy("grp", "item").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_drop_duplicates_within_watermark_evicts_and_readmits(spark, tmp_path):
    """The WITHIN-watermark contract t_stream_dedup's pinned horizon
    avoids: once the watermark passes a key's first occurrence + delay,
    its state evicts, and a LATER duplicate re-emits. Three batches of
    ascending event time with a 1-hour delay over a 24-hour span must
    produce re-emissions; the same replay with a spanning delay must
    not."""
    import os

    rows = [
        (i, i % 40, f"2024-01-01 {i % 24:02d}:00:00", float(i)) for i in range(120)
    ]
    df = (
        spark.createDataFrame(rows, "event_id bigint, k bigint, ts_s string, v double")
        .withColumn("ts", F.to_timestamp("ts_s"))
        .select("event_id", "k", "ts", "v")
    )
    for k in range(3):
        d = str(tmp_path / "in" / f"d{k}")
        df.filter(F.col("v") % 3 == k).coalesce(1).write.parquet(d)
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (1000 * (k + 1), 1000 * (k + 1)))

    def replay(delay, name):
        src = (
            spark.readStream.schema("event_id bigint, k bigint, ts timestamp, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / "in" / "*"))
        )
        dd = (
            src.withWatermark("ts", delay)
            .dropDuplicatesWithinWatermark(["k"])
            .select("k")
        )
        q = (
            dd.writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .start()
        )
        assert q.awaitTermination(120)
        return spark.table(name)

    short = replay("1 hour", "dd_short")
    assert short.count() > short.select("k").distinct().count()  # re-emissions
    long = replay("30 days", "dd_long")
    assert long.count() == long.select("k").distinct().count() == 40


def test_sessionize_stream_session_spans_batches(spark, tmp_path):
    """Round 10 golden: a session that provably SPANS micro-batches —
    batch 1 holds three events 10 min apart, batch 2 continues the
    same session 25 min later then opens a new one 2 h later. The
    folded updates (max n_events per session) must show session 1
    with all four events and session 2 with one."""
    import os

    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.streaming.stateful import sessionize_stream

    base = 1_700_000_000  # epoch seconds
    b1 = [(1, base + 0), (2, base + 600), (3, base + 1200)]
    b2 = [(4, base + 1200 + 1500), (5, base + 1200 + 1500 + 7200)]
    for k, rows in enumerate((b1, b2)):
        df = spark.createDataFrame(
            [(eid, 7, ts) for eid, ts in rows],
            "event_id bigint, user_id bigint, epoch bigint",
        ).select(
            "event_id", "user_id",
            F.timestamp_seconds(F.col("epoch")).alias("ts"),
        )
        d = str(tmp_path / "in" / f"d{k}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (1000 * (k + 1), 1000 * (k + 1)))
    src = (
        spark.readStream.schema("event_id bigint, user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    out = sessionize_stream(src, "user_id", "ts", gap_sec=1800, order_cols=["event_id"])
    q = (
        out.writeStream.format("memory").queryName("sessstreamtest")
        .trigger(availableNow=True).outputMode("update")
        .option("checkpointLocation", str(tmp_path / "_ckpt")).start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in spark.table("sessstreamtest")
        .groupBy("user_id", "session_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    }
    assert got == {(7, 1): 4, (7, 2): 1}
    # the spanning session was emitted in BOTH batches (3 then 4)
    updates = sorted(
        r["n_events"]
        for r in spark.table("sessstreamtest").filter("session_id = 1").collect()
    )
    assert updates == [3, 4]


def test_heartbeat_stream_resume_rows_span_batches(spark, tmp_path):
    """Round 11: the resume lane is exact across batch boundaries —
    a >threshold gap whose two endpoints land in DIFFERENT micro-
    batches must still emit exactly one (last_seen, resumed) row."""
    from cbts_datalake_synnex_spark.streaming.stateful import heartbeat_stream

    src = str(tmp_path / "src")
    now = time.time()
    _write_file(
        src, "b1.json",
        [
            {"event_id": "e1", "user_id": "u1", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
            {"event_id": "e2", "user_id": "u2", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
        ],
        now - 30,
    )
    _write_file(
        src, "b2.json",
        [  # u1 resumes 2h later (gap), u2 30min later (no gap)
            {"event_id": "e3", "user_id": "u1", "ts": "2024-01-01T12:00:00.000Z", "value": 1.0},
            {"event_id": "e4", "user_id": "u2", "ts": "2024-01-01T10:30:00.000Z", "value": 1.0},
        ],
        now - 20,
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        heartbeat_stream(stream, "user_id", "ts", threshold_sec=3600)
        .writeStream.format("memory")
        .queryName("hb_resume")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hb_resume").collect()
    assert len(rows) == 1
    r = rows[0]
    base = int(datetime(2024, 1, 1, 10, 0, 0, tzinfo=timezone.utc).timestamp()) * 1_000_000
    assert r["user_id"] == "u1"
    assert r["last_seen_us"] == base
    assert r["resumed_us"] == base + 7_200_000_000
    assert r["silent_us"] == 7_200_000_000


def test_heartbeat_stream_timeout_lane_evicts_silent_entity(spark, tmp_path):
    """Round 11: with emit_timeouts=True on a watermarked stream, an
    entity that goes silent past the threshold emits one terminal row
    (resumed_us NULL, silent_us > threshold) once the watermark passes
    its timer — and active entities emit none."""
    from cbts_datalake_synnex_spark.streaming.stateful import heartbeat_stream

    src = str(tmp_path / "src")
    now = time.time()
    _write_file(
        src, "b1.json",
        [
            {"event_id": "e1", "user_id": "quiet", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
            {"event_id": "e2", "user_id": "chatty", "ts": "2024-01-01T10:00:00.000Z", "value": 1.0},
        ],
        now - 30,
    )
    _write_file(
        src, "b2.json",
        [{"event_id": "e3", "user_id": "chatty", "ts": "2024-01-01T13:00:00.000Z", "value": 1.0}],
        now - 20,
    )
    _write_file(
        src, "b3.json",
        [{"event_id": "e4", "user_id": "chatty", "ts": "2024-01-01T16:00:00.000Z", "value": 1.0}],
        now - 10,
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withWatermark("ts", "0 seconds")
    )
    q = (
        heartbeat_stream(
            stream, "user_id", "ts", threshold_sec=3600, emit_timeouts=True
        )
        .writeStream.format("memory")
        .queryName("hb_timeout")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hb_timeout").collect()
    base = int(datetime(2024, 1, 1, 10, 0, 0, tzinfo=timezone.utc).timestamp()) * 1_000_000
    terminal = [r for r in rows if r["resumed_us"] is None]
    assert len(terminal) == 1
    t = terminal[0]
    assert t["user_id"] == "quiet"
    assert t["last_seen_us"] == base
    assert t["silent_us"] > 3600_000_000
    # chatty's 3h gaps surface as resume rows, never terminal ones
    resumes = [r for r in rows if r["resumed_us"] is not None]
    assert {r["user_id"] for r in resumes} == {"chatty"}
    assert all(r["silent_us"] == 10_800_000_000 for r in resumes)


def test_decayed_counts_batch_hand_golden(spark):
    """Round 12: Σ exp(−λ(T_ref − t)) — hand values, recency beats
    bulk history beyond a few half-lives."""
    import math

    from cbts_datalake_synnex_spark.operators.timeseries import decayed_counts

    base = 1_700_000_000_000_000  # µs
    hour = 3_600_000_000
    rows = (
        # 'old': 10 events 10 days ago; 'fresh': 2 events at T_ref
        [(1, base - 240 * hour + i) for i in range(10)]
        + [(2, base - hour), (2, base)]
    )
    df = spark.createDataFrame(
        [(k, u) for k, u in rows], "user_id bigint, us bigint"
    ).select("user_id", F.timestamp_micros("us").alias("ts"))
    out = {r["user_id"]: r for r in
           decayed_counts(df, "user_id", "ts", decay_per_sec=3.2e-5).collect()}
    lam = 3.2e-5
    want_fresh = round(math.exp(-lam * 3600) + 1.0, 6)
    assert abs(out[2]["decayed"] - want_fresh) < 1e-9
    assert out[2]["last_us"] == base
    # 10 events 240 h old at ~6 h half-life: decayed to ~nothing
    assert out[1]["decayed"] < 1e-6 * 10
    assert out[2]["decayed"] > out[1]["decayed"]


def test_decayed_count_stream_recurrence_matches_batch_sum(spark, tmp_path):
    """The closed-form batch fold across 3 micro-batches equals the
    direct Σ exp(−λ(t_last − t_i)) over all events (to float noise
    far below 6dp)."""
    import math

    from cbts_datalake_synnex_spark.streaming.stateful import decayed_count_stream

    src = str(tmp_path / "src")
    now = time.time()
    hh = "2024-01-01T{:02d}:00:00.000Z"
    for k, hours in enumerate(([9, 10], [11], [13])):
        _write_file(
            src, f"b{k}.json",
            [{"event_id": f"e{h}", "user_id": "u1", "ts": hh.format(h), "value": 1.0}
             for h in hours],
            now - 30 + 10 * k,
        )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        decayed_count_stream(stream, "user_id", "ts", decay_per_sec=3.2e-5)
        .writeStream.format("memory")
        .queryName("dk_rec")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        spark.sql("SELECT * FROM dk_rec").collect(), key=lambda r: r["last_us"]
    )
    assert len(rows) == 3  # one emission per batch
    lam = 3.2e-5
    # final state vs direct sum over event hours 9,10,11,13 at t=13:00
    want = sum(math.exp(-lam * 3600 * (13 - h)) for h in (9, 10, 11, 13))
    assert abs(rows[-1]["decayed"] - want) < 1e-9
