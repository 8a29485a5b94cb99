"""Workload registry plumbing + oracle-comparison conventions.

Conventions that make the Spark↔DuckDB differential comparison
deterministic (the driver hashes values with columns sorted by name,
order-insensitive rows):

* **Aliases** — every computed column is aliased identically on both
  sides (the driver's hash is name-keyed).
* **Floats** — any aggregate/derived double is ``round()``ed in BOTH
  engines: 2 dp for money-scale sums, 6 dp for ratios/averages.
  Raw column passthrough stays unrounded (bit-identical parquet reads).
* **Timestamps** — emitted as ``unix micros`` (bigint) or an explicit
  ``yyyy-MM-dd HH:mm:ss`` string, never a raw timestamp column, so
  engine-native timezone/precision formatting can't diverge. The Spark
  side pins ``spark.sql.session.timeZone=UTC`` (DuckDB is UTC-naive).
* **Ordering/top-k** — any LIMIT is preceded by a total order with a
  unique tiebreak key.
* **Widths** — Spark ``year()``-style INTs are cast to bigint to match
  DuckDB's 64-bit defaults.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.session import tune_for_oracle

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@dataclass(frozen=True)
class Query:
    """One judge-visible workload entry.

    ``oracle`` is ANSI SQL DuckDB runs over the same parquet (views
    pre-registered per table name); ``None`` ⇒ non-SQL-expressible
    (approximate/iterative) — the driver then records a rows-only
    check, and ``tests/`` carries the stronger recall/golden assertion.
    """

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    # What bench.py times when it differs from ``fn``. Used when a
    # registry entry wraps the operator in certification scaffolding
    # (e.g. the LSH verification report runs LSH + the exact twin +
    # the compare in one plan): the driver hashes ``fn``, the bench
    # times the raw operator — keeping per-query wall times comparable
    # across rounds to the pre-wrapper baseline.
    bench_fn: Optional[Callable[[SparkSession, str], DataFrame]] = None


REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    oracle: Optional[str] = None,
    doc: str = "",
    bench: bool = False,
    bench_fn: Optional[Callable[[SparkSession, str], DataFrame]] = None,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=doc, bench=bench, bench_fn=bench_fn
        )
        return fn

    return deco


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of a driver testdata table (SURVEY §2.1 S7).

    Plain ``spark.read.parquet`` so Catalyst gets pushdown + pruning;
    oracle confs (UTC session tz etc.) applied idempotently since the
    driver owns the session.

    TIMESTAMP(NANOS) columns (the events table's ``ts``) are illegal
    for Spark's vectorized reader — ``nanosAsLong`` (set by
    ``tune_for_oracle``) reads them as int64, and the ``DIV 1000``
    truncation to a µs timestamp below reproduces exactly what DuckDB
    does with the same file. Stays a pure scan projection.
    """
    tune_for_oracle(spark)
    import pyspark.sql.types as T

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # TIMESTAMP(NANOS) parquet read as int64 via nanosAsLong (set by
        # tune_for_oracle): DIV 1000 truncation reproduces DuckDB's µs view.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # timestamp[us] with no tz ⇒ Spark 4.1 infers TIMESTAMP_NTZ, which
    # unix_micros/window()/watermarks reject. Session tz is pinned UTC,
    # so casting to session-tz TIMESTAMP is value-identical and
    # DuckDB-compatible. Applied to EVERY table (the driver regenerated
    # events.ts this way in round 3; orders/lineitem date columns carry
    # the same type) — tests/test_testdata_schema.py pins this contract.
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df
