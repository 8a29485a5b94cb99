"""Type-drift defense for driver-regenerated testdata.

The driver owns /root/testdata and has regenerated it mid-build before
(round 3: events.ts flipped from TIMESTAMP(NANOS) to timestamp[us],
which Spark 4.1 reads as TIMESTAMP_NTZ and ``unix_micros``/``window``
reject). ``load_table`` is the single normalization chokepoint — these
tests pin its contract so the NEXT silent regeneration fails loudly
here instead of inside whichever queries the driver happens to sample.
"""

from __future__ import annotations

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.workload.base import TABLES, load_table


@pytest.mark.parametrize("table", TABLES)
def test_no_unnormalized_temporal_types(spark, sf_dir, table):
    """No loaded table may expose TIMESTAMP_NTZ or raw-long timestamps:
    every temporal column must be session-tz TIMESTAMP or DATE, the two
    types the whole workload (unix_micros, window(), date arithmetic)
    and the DuckDB oracle agree on."""
    df = load_table(spark, sf_dir, table)
    for field in df.schema.fields:
        assert not isinstance(field.dataType, T.TimestampNTZType), (
            f"{table}.{field.name} is TIMESTAMP_NTZ — load_table must "
            "cast it to timestamp (UTC session tz makes that lossless)"
        )


def test_events_ts_is_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    # unix_micros is the workload's canonical timestamp projection —
    # resolving here proves every sessionize/funnel/window query can.
    df.select(F.unix_micros("ts")).limit(1).collect()


def test_events_ts_values_match_duckdb(spark, sf_dir, duck):
    """The normalization must be value-preserving, not just type-fixing:
    min/max epoch-micros agree with DuckDB reading the same file."""
    got = (
        load_table(spark, sf_dir, "events")
        .agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        )
        .collect()[0]
    )
    lo, hi = duck.execute(
        "SELECT epoch_us(min(ts)), epoch_us(max(ts)) FROM events"
    ).fetchone()
    assert (got["lo"], got["hi"]) == (lo, hi)
