"""Change-data operators (SURVEY §2.2 [EXT]) — log compaction and
snapshot reconciliation for the lake's write side.

The reference's write path approximates upserts by overwriting whole
partitions (``src/purchase_orders.py:88``; made exact by
``engine.merge_upsert``). Two adjacent capabilities round that out:

* ``latest_snapshot`` — compact an append-only change log to the
  current row per key (the read-side MERGE: what a Delta table *is*,
  materialized from plain appended parquet). One window shuffle on the
  key — no driver-side state, no all-version materialization.
* ``table_diff`` — reconcile two snapshots into inserted / deleted /
  changed rows. Full-outer equi-join on the key plus a single
  ``xxhash64`` over the compared columns: the change detection is one
  64-bit comparison per row, not a column-by-column diff, so the
  shuffled payload stays (key, hash) regardless of row width. The
  standard migration/regression gate: "what did this rewrite actually
  change" over two 100 TB snapshots is two scans + one join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame,
    keys: Sequence[str],
    version_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Latest row per key from an append-only change log.

    ``row_number`` over (keys × version desc, tiebreak desc) — ties on
    the version column resolve via ``tiebreak`` so the result is
    deterministic under any partitioning. One shuffle on the key.
    """
    order = [F.col(version_col).desc()] + [F.col(t).desc() for t in tiebreak]
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Snapshot reconciliation: rows of ``right`` not in ``left``
    (``inserted``), rows gone from ``right`` (``deleted``), and rows
    whose compared columns changed (``changed``). Unchanged rows are
    dropped — the output is the (small) delta, never the snapshots.

    Returns the key columns + ``change_type``. ``compare_cols``
    defaults to every shared non-key column.
    """
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    # hash NULL-safely: cast to string with a sentinel, field-separated
    def row_hash(df: DataFrame) -> F.Column:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in compare_cols
        ]
        return F.xxhash64(*parts) if parts else F.lit(0).cast("long")

    l = left.select(*keys, row_hash(left).alias("__lh"))
    r = right.select(*keys, row_hash(right).alias("__rh"))
    joined = l.join(r, on=list(keys), how="full_outer")
    change = (
        F.when(F.col("__lh").isNull(), F.lit("inserted"))
        .when(F.col("__rh").isNull(), F.lit("deleted"))
        .when(F.col("__lh") != F.col("__rh"), F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )


def scd2_from_log(
    changes: DataFrame,
    keys: Sequence[str],
    sequence_col: str,
    op_col: str | None = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 from an append-only change log
    (the ``APPLY CHANGES … STORED AS SCD TYPE 2`` semantics of the
    public Delta Live Tables API, rebuilt as one window): every change
    event opens a dimension version valid from its sequence number
    until the key's NEXT event; the key's last event stays open
    (``is_current``). A delete event (``op_col = 'D'``) closes the
    previous version without opening one.

    Scale shape: ONE shuffle on the key (the window partition) — the
    lead() that closes each version is a partitioned window, never a
    global sort, and no state beyond the window frame. Deterministic:
    (keys, sequence, tiebreak) totally order the log, so the history
    is identical under any partitioning.

    Returns the change rows (minus deletes) plus ``valid_from``,
    ``valid_to`` (null while current) and ``is_current``.
    """
    order = [F.col(sequence_col).asc()] + [F.col(t).asc() for t in tiebreak]
    w = W.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(F.col(sequence_col)).over(w)
    out = (
        changes.withColumn("valid_from", F.col(sequence_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )
    if op_col is not None:
        # drop the delete events AFTER the window: their sequence
        # already closed the prior version's valid_to, and a key whose
        # last event was a delete keeps no current row. Null-safe: a
        # NULL op is an upsert (DLT APPLY CHANGES semantics), not a
        # silently-dropped row.
        out = out.filter(~F.upper(F.col(op_col)).eqNullSafe("D"))
    return out


def temporal_join(
    fact: DataFrame,
    hist: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time join against an SCD2 history (round 12) — the
    ``FOR SYSTEM_TIME AS OF`` semantics most lakehouses get wrong
    with a plain equi-join: each fact row attaches the dim version
    whose ``[valid_from, valid_to)`` interval contains the fact
    timestamp; facts before the key's first version, or after its
    deletion closed the last one, keep NULL dim values (left-outer).

    Plan: NOT the interval theta-join (|F|·|versions-per-key|
    candidates) — the as-of machinery's union + ONE window pass picks
    the latest ``valid_from <= ts`` linearly (`joins.asof_join`,
    certified), then versions already CLOSED at ts null out. One
    shuffle on the key, window-carried state, fact-linear at any
    scale. Pass only non-'D' history rows (delete events close
    intervals; they are not versions)."""
    from cbts_datalake_synnex_spark.operators.joins import asof_join

    # ONE struct per version, not bare columns: the as-of carry is
    # last(..., ignorenulls=True), so a version's NULL field (an OPEN
    # valid_to) would fail to overwrite the previous version's
    # non-NULL one — the same null-carry trap asof_nearest solved.
    # The struct itself is never NULL on history rows, so it carries
    # atomically; valid_from leads the struct so the default struct
    # tiebreak orders by it.
    carry = [valid_from, valid_to, *value_cols]
    hist2 = hist.select(
        *keys, F.col(valid_from), F.struct(*carry).alias("__ver")
    )
    picked = asof_join(
        fact,
        hist2,
        on=list(keys),
        left_ts=ts_col,
        right_ts=valid_from,
        value_cols=["__ver"],
    )
    ver = F.col("__ver")
    live = ver.isNotNull() & (
        ver.getField(valid_to).isNull()
        | (F.col(ts_col) < ver.getField(valid_to))
    )
    out = picked.withColumn("__live", live)
    for c in carry:
        out = out.withColumn(c, F.when(F.col("__live"), ver.getField(c)))
    return out.drop("__ver").withColumnRenamed("__live", "dim_matched")
