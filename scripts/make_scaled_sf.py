"""Build a 10×-scaled bench dataset (≈ sf1) from the driver's sf0.1
parquet — the second scale point BENCH needs to separate fixed overhead
from scaling slope (a single-SF bench cannot distinguish a 2× constant
from a 2× slope, which is what "would survive 100×" claims rest on).

Scaling is replication with KEY SHIFTS so join cardinalities scale the
way a real TPC-H sf1 would: every fact/entity key shifts by
``replica * (max_key + 1)`` consistently across referencing tables
(customer↔orders↔lineitem, part/supplier↔lineitem, documents,
embeddings, events users). Dimension tables (region, nation) stay
single-copy, exactly like TPC-H.

Content perturbation keeps the [EXT] workloads honest:

* ``documents.text`` — every token gets a per-replica suffix, so
  in-replica near-duplicate structure is preserved EXACTLY (both sides
  of a pair transform identically) while cross-replica Jaccard drops
  to 0 — without this, every doc would acquire 9 perfect copies and
  the near-dup pair count would be C(10,2)·N instead of 10·(sf0.1
  pairs), changing the workload's shape rather than its scale.
* ``embeddings.embedding`` — dimensions rotate by a per-replica
  offset: norms and all in-replica angles are preserved (rotation is
  orthogonal), cross-replica cosine decorrelates.

Writes to ``.bench_sf1/`` at the repo root (gitignored — derived
artifact). Usage: python scripts/make_scaled_sf.py [replicas]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cbts_datalake_synnex_spark.workload.base import load_table  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get(
    "SPARK_GRAFT_SCALE_OUT",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_sf1"
    ),
)

# key columns shifted per replica, per table (consistent across refs)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
DIMS = ["region", "nation"]


def _strides(spark: SparkSession) -> dict[str, int]:
    """One stride per key FAMILY (custkey used by customer+orders must
    shift identically everywhere)."""
    out: dict[str, int] = {}
    fam = {
        "custkey": ("customer", "c_custkey"),
        "suppkey": ("supplier", "s_suppkey"),
        "partkey": ("part", "p_partkey"),
        "orderkey": ("orders", "o_orderkey"),
        "doc_id": ("documents", "doc_id"),
        "vec_id": ("embeddings", "vec_id"),
        "user_id": ("events", "user_id"),
        "event_id": ("events", "event_id"),
    }
    for name, (table, col) in fam.items():
        mx = load_table(spark, SRC, table).agg(F.max(F.col(col)).alias("m")).first()["m"]
        out[name] = int(mx) + 1
    return out


def _family(col: str) -> str:
    for fam in (
        "custkey",
        "suppkey",
        "partkey",
        "orderkey",
        "doc_id",
        "vec_id",
        "user_id",
        "event_id",
    ):
        if col.endswith(fam) or col == fam:
            return fam
    raise ValueError(col)


def scale_table(
    spark: SparkSession, table: str, replicas: int, strides: dict[str, int]
) -> DataFrame:
    # load_table handles the TIMESTAMP(NANOS) events column and NTZ
    # normalization; the scaled copy lands as ordinary µs timestamps.
    base = load_table(spark, SRC, table)
    if table in DIMS:
        return base
    reps = spark.range(replicas).select(F.col("id").cast("int").alias("__rep"))
    df = base.crossJoin(F.broadcast(reps))
    for col in KEYED[table]:
        stride = strides[_family(col)]
        df = df.withColumn(col, (F.col(col) + F.col("__rep").cast("long") * stride))
    if table == "documents":
        # per-replica token suffix: in-replica similarity exact,
        # cross-replica similarity zero
        df = df.withColumn(
            "text",
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit("_r"), F.col("__rep").cast("string")),
                    ),
                    " ",
                )
            ),
        )
    if table == "embeddings":
        # rotate dimensions by replica offset (orthogonal ⇒ in-replica
        # geometry preserved; cross-replica decorrelated)
        dim = F.size(F.col("embedding"))
        k = F.col("__rep") % dim
        df = df.withColumn(
            "embedding",
            F.when(F.col("__rep") == 0, F.col("embedding")).otherwise(
                F.concat(
                    F.slice(F.col("embedding"), k + 1, dim - k),
                    F.slice(F.col("embedding"), F.lit(1), k),
                )
            ),
        )
    return df.drop("__rep")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("make-scaled-sf")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    strides = _strides(spark)
    os.makedirs(OUT, exist_ok=True)
    for table in DIMS + list(KEYED):
        out = f"{OUT}/{table}.parquet"
        scale_table(spark, table, replicas, strides).write.mode("overwrite").parquet(out)
        print(f"{table}: written to {out}", flush=True)
    with open(os.path.join(OUT, "_SCALE"), "w") as f:
        f.write(f"replicas={replicas} src={SRC}\n")
    spark.stop()
    print("done")


if __name__ == "__main__":
    main()
