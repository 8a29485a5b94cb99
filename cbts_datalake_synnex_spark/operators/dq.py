"""Data-quality expectations (Deequ/Great-Expectations-style) — the
generalization of the reference's count gate (``utils.py:128``
``if df.shape[0] == 0: return`` is a one-rule expectation suite).

One aggregate pass computes every rule's violation count; the report is
an explode of the single result row. At 100 TB that is one scan with a
map-side-combining hash aggregate of ~len(rules) counters — adding a
rule costs an expression, never another pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate boolean expectations; one row per rule.

    ``rules`` maps rule name → predicate Column (True = row passes).
    NULL predicate results count as violations (a comparison that can't
    be evaluated is a failed expectation, matching SQL three-valued
    logic pitfalls rather than hiding them).

    Returns (rule, n_rows, n_violations, violation_rate, passed).
    """
    # coalesce: SUM over zero rows is NULL — an empty input must report
    # 0 violations / passed=true, not NULL-poison a downstream gate.
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.coalesce(F.sum(F.when(cond, 0).otherwise(1)), F.lit(0)).alias(f"__v_{name}")
        for name, cond in rules.items()
    ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v_{name}").cast("bigint").alias("n_violations"),
            )
            for name in rules
        ]
    )
    return row.select(F.col("n_rows"), F.explode(entries).alias("e")).select(
        F.col("e.rule").alias("rule"),
        "n_rows",
        F.col("e.n_violations").alias("n_violations"),
        F.round(F.col("e.n_violations") / F.greatest(F.col("n_rows"), F.lit(1)), 6).alias(
            "violation_rate"
        ),
        (F.col("e.n_violations") == 0).alias("passed"),
    )


def schema_drift_report(batch: DataFrame, target: DataFrame) -> DataFrame:
    """What would change if ``batch`` were appended to ``target``:
    one row per column with status ``added`` (batch-only — what K8
    evolution would ALTER in), ``removed`` (target-only — null-filled
    on append), ``type_changed``, or ``unchanged``. Pure schema
    metadata — no scan, no job, identical cost at 100 TB; the gate a
    pipeline consults BEFORE letting write_curated evolve a table."""
    b = {f.name.lower(): (f.name, f.dataType.simpleString()) for f in batch.schema.fields}
    t = {f.name.lower(): (f.name, f.dataType.simpleString()) for f in target.schema.fields}
    rows = []
    for key in sorted(set(b) | set(t)):
        bname, btype = b.get(key, (None, None))
        tname, ttype = t.get(key, (None, None))
        if key not in t:
            status = "added"
        elif key not in b:
            status = "removed"
        elif btype != ttype:
            status = "type_changed"
        else:
            status = "unchanged"
        rows.append((bname or tname, btype, ttype, status))
    return batch.sparkSession.createDataFrame(
        rows, "column string, batch_type string, table_type string, status string"
    )
