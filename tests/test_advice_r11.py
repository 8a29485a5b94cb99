"""Regression tests for the four ADVICE r11 findings.

1. weighted_jaccard_pairs: the total-weight prune must run at a
   half-grid-slackened threshold so pairs whose 6dp-ROUNDED score
   reaches the threshold (true score in [t-5e-7, t)) survive the
   mass bound — exact / LSH-twin / DuckDB-oracle agreement on
   boundary pairs (dedup.py).
2. heartbeat_stream(emit_timeouts=True): a timeout must RE-SEED the
   state (keep last_us, mark evicted) instead of removing it, so a
   post-eviction comeback still emits its resume-lane row
   (streaming/stateful.py).
3. update_ann_index: NULL vectors are dropped BEFORE the min(struct)
   batch dedup — struct ordering sorts NULL fields first, so a
   duplicated id with one NULL-vector row would otherwise keep the
   NULL and discard the real vector (engine.py).
4. logreg_train(steps=0): returns the zero weight vector instead of
   raising — the __w{i} columns are materialized before the step
   loop (classify.py).
"""

import json
import os
import shutil
import tempfile
import uuid
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.engine import LakeEngine


# Certification tier (round 14): excluded from the default driver-budget
# run via pytest.ini; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


@pytest.fixture()
def eng(spark):
    root = tempfile.mkdtemp(prefix="advice11_")
    db = f"advice11_{uuid.uuid4().hex[:8]}"
    engine = LakeEngine(spark, root, database=db)
    try:
        yield engine
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(root, ignore_errors=True)


def test_weighted_jaccard_boundary_pair_survives_mass_prune(spark):
    """True J_w = 0.7999998 < t = 0.8 but rounds to 0.800000 ≥ t: the
    final filter (and the DuckDB oracle restatement) accept the pair,
    so the pre-aggregate mass prune must not drop it."""
    from cbts_datalake_synnex_spark.operators.dedup import weighted_jaccard_pairs

    tf = spark.createDataFrame(
        [(1, 7, 1.0), (2, 7, 0.7999998)], "doc bigint, sh bigint, w double"
    )
    dummy = spark.createDataFrame([(0, "x")], "id bigint, text string")
    rows = weighted_jaccard_pairs(
        dummy, "id", "text", threshold=0.8, tf=tf
    ).collect()
    assert len(rows) == 1
    assert (rows[0]["doc1"], rows[0]["doc2"]) == (1, 2)
    assert rows[0]["wjaccard"] == 0.8


def test_weighted_jaccard_mass_prune_still_prunes_clear_misses(spark):
    from cbts_datalake_synnex_spark.operators.dedup import weighted_jaccard_pairs

    tf = spark.createDataFrame(
        [(1, 7, 1.0), (2, 7, 0.5)], "doc bigint, sh bigint, w double"
    )
    dummy = spark.createDataFrame([(0, "x")], "id bigint, text string")
    assert weighted_jaccard_pairs(
        dummy, "id", "text", threshold=0.8, tf=tf
    ).count() == 0


def _write_events(dirpath, name, rows, mtime):
    os.makedirs(dirpath, exist_ok=True)
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(p, (mtime, mtime))


def test_heartbeat_comeback_after_timeout_emits_resume_row(spark, tmp_path):
    """u1 goes silent past the threshold (terminal row fires), then
    RETURNS: its first event back must still diff against the real
    last timestamp and emit the resume-lane gap row. Before the r11
    fix the timeout removed the state and the comeback diffed against
    itself, silently losing the resume row."""
    import time as _time

    from cbts_datalake_synnex_spark.streaming.stateful import heartbeat_stream

    src = str(tmp_path / "src")
    now = _time.time()
    hh = "2024-01-01T{:02d}:{:02d}:00.000Z"
    _write_events(
        src, "b1.json",
        [
            {"event_id": "e1", "user_id": "u1", "ts": hh.format(10, 0), "value": 1.0},
            {"event_id": "e2", "user_id": "chatty", "ts": hh.format(10, 0), "value": 1.0},
        ],
        now - 40,
    )
    # chatty alone advances the watermark to 14:00, firing u1's 11:00
    # timer during the NEXT batch
    _write_events(
        src, "b2.json",
        [{"event_id": "e3", "user_id": "chatty", "ts": hh.format(14, 0), "value": 1.0}],
        now - 30,
    )
    _write_events(
        src, "b3.json",
        [{"event_id": "e4", "user_id": "chatty", "ts": hh.format(15, 0), "value": 1.0}],
        now - 20,
    )
    # u1 comes back at 16:30 — above the watermark (15:00), timer
    # re-registers at 17:30 > 15:00
    _write_events(
        src, "b4.json",
        [{"event_id": "e5", "user_id": "u1", "ts": hh.format(16, 30), "value": 1.0}],
        now - 10,
    )
    from tests.test_streaming import EVENT_SCHEMA

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withWatermark("ts", "0 seconds")
    )
    q = (
        heartbeat_stream(stream, "user_id", "ts", threshold_sec=3600, emit_timeouts=True)
        .writeStream.format("memory")
        .queryName("hb_comeback")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hb_comeback WHERE user_id = 'u1'").collect()
    base = int(datetime(2024, 1, 1, 10, 0, tzinfo=timezone.utc).timestamp()) * 1_000_000
    terminal = [r for r in rows if r["resumed_us"] is None]
    resumes = [r for r in rows if r["resumed_us"] is not None]
    assert len(terminal) == 1 and terminal[0]["last_seen_us"] == base
    # the regression: exactly one resume row, diffed against the REAL
    # pre-eviction timestamp
    assert len(resumes) == 1
    assert resumes[0]["last_seen_us"] == base
    assert resumes[0]["resumed_us"] == base + 23_400_000_000
    assert resumes[0]["silent_us"] == 23_400_000_000


def _vec(i, dim=6):
    return [float((i * 7 + j * 3) % 11) - 5.0 for j in range(dim)]


def test_update_ann_index_null_vector_duplicate_keeps_real_vector(spark, eng):
    base = spark.createDataFrame(
        [(i, _vec(i)) for i in range(40)], "vec_id bigint, embedding array<double>"
    )
    eng.build_ann_index("nv", base, "vec_id", "embedding", n_cells=4, n_assign=1)
    batch = spark.createDataFrame(
        [(60, None), (60, _vec(60)), (61, None)],
        "vec_id bigint, embedding array<double>",
    )
    eng.update_ann_index("nv", batch, "vec_id", "embedding")
    posted = (
        spark.table(eng.qualified("nv_postings"))
        .filter(F.col("cand_id") >= 60)
        .collect()
    )
    # id 61 had ONLY a NULL vector: nothing useful to post
    assert {r["cand_id"] for r in posted} == {60}
    assert len(posted) == 1
    assert list(posted[0]["cv"]) == _vec(60)


def test_logreg_train_zero_steps_returns_zero_weights(spark):
    from cbts_datalake_synnex_spark.operators.classify import logreg_train

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0)], "f double, y int"
    )
    row = logreg_train(df, ["f"], "y", steps=0).first()
    assert row["w_f"] == 0.0 and row["w_bias"] == 0.0
    # sigmoid(0) = 0.5 is not > 0.5, so every prediction is 0
    assert row["train_acc"] == 0.5 and row["n"] == 4
