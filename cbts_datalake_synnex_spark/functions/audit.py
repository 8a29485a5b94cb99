"""Audit columns: ``processed_at`` / ``processed_year`` / ``processed_month``.

The reference stamps every landed record with a wall-clock triple in
US/Eastern (``utils.py:20,29-30,44,55-56,131-133,232-234``;
``src/purchase_orders.py:77-86`` — note the ``strftime('%M')`` minute
bug at line 80, whose evident intent is month; see SURVEY §0.1-2).
Format is ``%Y-%m-%d %H:%M:%S`` for the timestamp and 4/2-digit strings
for year/month, which then serve as the default Hive partition keys
(``utils.py:223``).

The clock is injectable so tests are deterministic — the reference's
implicit ``datetime.now`` makes every run nondeterministic, one of the
things SURVEY §7 flags as needing a seam.
"""

from __future__ import annotations

from datetime import datetime
from zoneinfo import ZoneInfo

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PROCESS_TIMEZONE = "US/Eastern"  # utils.py:20 TIMEZONE = timezone('US/Eastern')
TS_FORMAT = "%Y-%m-%d %H:%M:%S"  # utils.py:30


def audit_columns(now: datetime | None = None) -> dict[str, Column]:
    """Literal audit columns for one ingest batch.

    Batch-literal (not per-row ``current_timestamp()``): the reference
    stamps the whole batch with one driver-side clock read
    (``utils.py:29-30``), and a literal keeps the partition key count
    bounded — one partition per batch, not per task-start jitter.
    """
    if now is None:
        now = datetime.now(ZoneInfo(PROCESS_TIMEZONE))
    elif now.tzinfo is not None:
        now = now.astimezone(ZoneInfo(PROCESS_TIMEZONE))
    return {
        "processed_at": F.lit(now.strftime(TS_FORMAT)),
        "processed_year": F.lit(now.strftime("%Y")),
        "processed_month": F.lit(now.strftime("%m")),  # '%m' month — not the '%M' minute bug
    }


def with_audit_columns(df: DataFrame, now: datetime | None = None) -> DataFrame:
    cols = audit_columns(now)
    for name, col in cols.items():
        df = df.withColumn(name, col)
    return df
