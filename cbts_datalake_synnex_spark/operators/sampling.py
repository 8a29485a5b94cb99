"""Deterministic sampling operators (SURVEY §2.10 [EXT]) — corpus
down-sampling for training-set assembly.

`df.sample()` / `sampleBy()` are seeded per-partition, so the selected
rows change whenever partitioning changes (repartition, AQE, cluster
size) — unacceptable for a resumable 100 TB pipeline. These operators
key selection off a content hash of a stable id instead (the same
md5-bucket discipline as `pipeline_train_test_split`): the sample is a
pure projection+filter, identical on any engine, any partitioning, any
scale, and re-runs land the exact same rows (idempotent appends).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5 hex → first 8 nibbles → bigint, uniform over [0, 2^32)
_BUCKETS = 1_000_000


def _hash_bucket(id_col: str, salt: str = "") -> F.Column:
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _BUCKETS


def hash_sample(df: DataFrame, id_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash — deterministic
    across engines/partitionings. ``salt`` derives independent samples
    from the same ids (e.g. one per epoch)."""
    return df.filter(_hash_bucket(id_col, salt) < int(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum rates (e.g. language rebalancing: keep 100% of the
    rare language, 10% of the dominant one). Strata not listed keep
    ``default_fraction``. Pure projection+filter — no shuffle, no
    sampleBy partition-dependence."""
    threshold = F.lit(int(default_fraction * _BUCKETS))
    for key, frac in fractions.items():
        threshold = F.when(
            F.col(strata_col) == key, F.lit(int(frac * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(_hash_bucket(id_col, salt) < threshold)
