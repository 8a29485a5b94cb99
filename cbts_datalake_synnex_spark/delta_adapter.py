"""Every ``io.delta`` call the engine can make, in one adapter.

This image ships no delta-spark jars (SURVEY §8.1), so the Delta
branches of the engine cannot execute here. Keeping every DeltaTable
interaction behind this ~40-line surface means the *untestable* code is
minimal and the call-chain CONTRACT is still executable today:
``tests/test_delta_adapter.py`` installs a fake ``delta.tables`` module
and asserts the exact builder chains (merge clause order, conditions,
update maps) the adapter would issue against real Delta — the same
published API (`DeltaTable.forName(...).alias("t").merge(...)
.whenMatchedDelete/.whenMatchedUpdate[All]/.whenNotMatchedInsertAll
.execute()`).

On a cluster WITH Delta jars, `LakeEngine` auto-selects
``table_format="delta"`` (`engine._delta_available`) and routes
row-level DML through here; the transaction log then subsumes the
engine's snapshot journal.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


class DeltaAdapter:
    """Thin, contract-tested wrapper over ``delta.tables.DeltaTable``."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def _table(self, qtable: str):
        from delta.tables import DeltaTable  # type: ignore[import-not-found]

        return DeltaTable.forName(self.spark, qtable)

    def delete(self, qtable: str, condition: str | Any) -> None:
        self._table(qtable).delete(condition)
        self.spark.catalog.refreshTable(qtable)

    def update(self, qtable: str, condition, sets: Mapping[str, Any]) -> None:
        self._table(qtable).update(condition, dict(sets))
        self.spark.catalog.refreshTable(qtable)

    def upsert_all(self, qtable: str, source: DataFrame, keys: Sequence[str]) -> None:
        """MERGE with update-all/insert-all clauses (merge_upsert's shape)."""
        cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
        (
            self._table(qtable)
            .alias("t")
            .merge(source.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        self.spark.catalog.refreshTable(qtable)

    def merge(
        self,
        qtable: str,
        source: DataFrame,
        keys: Sequence[str],
        when_matched_update: Mapping[str, Any] | str | None,
        when_matched_delete: str | bool | None,
        when_not_matched_insert: str | bool,
    ) -> None:
        """Full-clause MERGE (merge_rows' shape), clauses in Delta's
        evaluation order: delete, update, insert."""
        cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
        m = self._table(qtable).alias("t").merge(source.alias("s"), cond)
        if when_matched_delete:
            m = m.whenMatchedDelete(
                condition=when_matched_delete
                if isinstance(when_matched_delete, str)
                else None
            )
        if when_matched_update == "all":
            m = m.whenMatchedUpdateAll()
        elif isinstance(when_matched_update, Mapping):
            m = m.whenMatchedUpdate(set=dict(when_matched_update))
        if when_not_matched_insert:
            m = m.whenNotMatchedInsertAll(
                condition=when_not_matched_insert
                if isinstance(when_not_matched_insert, str)
                else None
            )
        m.execute()
        self.spark.catalog.refreshTable(qtable)
