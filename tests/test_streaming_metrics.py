"""streaming/metrics.py unit behavior: progress flattening (zero-input
ticks dropped, renumbering), alarm rules, and the environment-dependent
columns the registry oracle can't certify."""

from cbts_datalake_synnex_spark.streaming.metrics import (
    progress_records,
    progress_table,
    streaming_alarm_report,
)


def _p(n, total=0, updated=0, dur=5):
    return {
        "numInputRows": n,
        "stateOperators": [{"numRowsTotal": total, "numRowsUpdated": updated}],
        "durationMs": {"triggerExecution": dur},
    }


def test_progress_records_drop_empty_and_renumber():
    rows = progress_records([_p(10, 4, 4), _p(0), _p(7, 6, 3), _p(0), _p(0)])
    assert [r["batch_seq"] for r in rows] == [0, 1]
    assert [r["num_input_rows"] for r in rows] == [10, 7]
    assert rows[0]["state_rows_total"] == 4 and rows[1]["state_rows_updated"] == 3


def test_progress_records_missing_fields():
    rows = progress_records([{"numInputRows": 3}])  # no stateOperators/durations
    assert rows == [
        {
            "batch_seq": 0,
            "num_input_rows": 3,
            "state_rows_total": 0,
            "state_rows_updated": 0,
            "batch_duration_ms": 0,
        }
    ]


def test_alarm_rules(spark):
    df = progress_table(
        spark,
        [
            _p(10, 4, 4, dur=5),          # batch 0: all state fresh
            _p(7, 6, 3, dur=700_000),     # batch 1: slow
        ],
    )
    rep = {r["batch_seq"]: r.asDict() for r in streaming_alarm_report(df).collect()}
    assert rep[0]["state_all_fresh"] is True
    assert rep[1]["state_all_fresh"] is False
    assert rep[1]["alarm_slow_batch"] is True
    assert not rep[0]["alarm_slow_batch"]
    assert not rep[0]["alarm_zero_input"] and not rep[1]["alarm_zero_input"]
