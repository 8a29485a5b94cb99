"""SURVEY §2.9 — the UDF/UDAF/grouped-map surface, demonstrated with
Arrow-vectorized pandas UDFs (never row-at-a-time ``F.udf``).

Each query is deliberately computable by DuckDB too, so even the
Python-boundary operators get full value-level oracle checks. These are
surface-coverage demos: every transform here COULD be a built-in
expression (and the built-in is what the rest of the workload uses) —
the point is pinning the Arrow round-trip semantics (nulls, types,
grouping) that real custom logic (model scoring, tokenizers) rides on.

Scale notes: scalar pandas UDFs stream Arrow batches inside the scan
stage (no shuffle); grouped-agg/grouped-map shuffle once on the group
key — identical to their built-in counterparts. The Python worker pool
is the throughput ceiling (SURVEY 'UDFs are the slow path'), which is
why only semantics that built-ins can't express should land here.

(pandas_udf objects are created inside each query function — the
decorator parses its DDL return type against the ACTIVE session, so
module-level creation would require a SparkContext at import time.)
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cbts_datalake_synnex_spark.workload.base import load_table, query


@query(
    "udf_scalar_sigmoid",
    oracle="""
    SELECT event_id, round(1.0 / (1.0 + exp(-value)), 6) AS sigmoid_value
    FROM events WHERE value IS NOT NULL
    """,
    doc="SURVEY §2.9 scalar pandas_udf (Series→Series, Arrow-batched) with null passthrough.",
)
def udf_scalar_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def sigmoid(v: pd.Series) -> pd.Series:
        return v.map(lambda x: None if pd.isna(x) else 1.0 / (1.0 + math.exp(-x)))

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return e.select("event_id", F.round(sigmoid("value"), 6).alias("sigmoid_value"))


@query(
    "udf_grouped_agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS w_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="SURVEY §2.9 UDAF — grouped-agg pandas_udf (Series→scalar), one shuffle like the built-in.",
)
def udf_grouped_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg_price("l_extendedprice", "l_quantity"), 6).alias("w_avg_price")
    )


@query(
    "udf_grouped_map_minmax",
    oracle="""
    WITH b AS (
      SELECT user_id, min(value) AS lo, max(value) AS hi
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           round(CASE WHEN b.hi = b.lo THEN 0.0 ELSE (e.value - b.lo) / (b.hi - b.lo) END, 6)
             AS value_scaled
    FROM events e JOIN b ON b.user_id = e.user_id
    WHERE e.value IS NOT NULL
    """,
    doc="SURVEY §2.9 grouped-map applyInPandas — per-user min-max scaling (full-group context per call).",
)
def udf_grouped_map_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        "event_id", "user_id", "value"
    )

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["value"].min(), pdf["value"].max()
        out = pdf[["event_id", "user_id"]].copy()
        if hi == lo:
            out["value_scaled"] = 0.0
        else:
            out["value_scaled"] = ((pdf["value"] - lo) / (hi - lo)).round(6)
        return out

    return e.groupBy("user_id").applyInPandas(
        scale, schema="event_id bigint, user_id bigint, value_scaled double"
    )


# ----------------------------------------------------------------------
# UDTF — the table-function rung of the ladder (SURVEY §2.9): one input
# row → many output rows. Demonstrated with token bigrams per document.
# NOTE the scale hierarchy: the BUILT-IN path (explode over transform,
# used here) keeps generation inside codegen; a Python @udtf expresses
# arbitrary row-expansion logic but pays the Python worker boundary —
# reserve it for semantics no higher-order function can express.
@query(
    "udtf_bigrams",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE lang = 'de'),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM grams GROUP BY bigram HAVING count(*) >= 25
    """,
    doc="SURVEY §2.9 UDTF — row-expanding table function (doc → bigrams) as "
    "explode(transform(...)): codegen'd generation, no Python boundary.",
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    toks = F.split(F.col("text"), " ")
    grams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(toks, i + 2)),
    )
    return (
        docs.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 25)
    )


@query(
    "udtf_python_bigrams",
    # identical semantics to udtf_bigrams (equivalence golden in tests/),
    # so it carries the same oracle — the Python boundary must not change
    # a single row.
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE lang = 'de'),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM grams GROUP BY bigram HAVING count(*) >= 25
    """,
    doc="SURVEY §2.9 UDTF — the same expansion as a Python arrow-batched "
    "mapInPandas table function: the escape hatch when no built-in expresses "
    "the row-expansion (tokenizers, parsers). Equivalence-tested against the "
    "codegen path.",
)
def udtf_python_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "de")

    def expand(batches):
        for pdf in batches:
            out = []
            for text in pdf["text"]:
                toks = text.split(" ")
                out.extend(" ".join(p) for p in zip(toks, toks[1:]))
            yield pd.DataFrame({"bigram": out})

    grams = docs.select("text").mapInPandas(expand, "bigram string")
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 25)
    )


# ----------------------------------------------------------------------
# §2.9 — the NATIVE Python UDTF API (Spark 4 `@udtf` + SQL LATERAL):
# the registered-table-function rung between codegen explode and the
# mapInPandas escape hatch. Same semantics as udtf_bigrams, so it
# carries the same oracle — crossing the UDTF boundary must not change
# a row.
@query(
    "udtf_lateral_bigrams",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE lang = 'de'),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM grams GROUP BY bigram HAVING count(*) >= 25
    """,
    doc="SURVEY §2.9 UDTF — the same expansion through the native Python UDTF "
    "API (@udtf class, spark.udtf.register, SQL LATERAL join): Arrow-batched "
    "per-row generator, planner-visible output schema.",
)
def udtf_lateral_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string")
    class BigramsUdtf:
        def eval(self, text: str):  # noqa: ANN001
            toks = text.split(" ")
            for a, b in zip(toks, toks[1:]):
                yield (f"{a} {b}",)

    spark.udtf.register("bigrams_udtf", BigramsUdtf)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    docs.createOrReplaceTempView("udtf_docs_de")
    return spark.sql(
        """
        SELECT b.bigram, count(*) AS n
        FROM udtf_docs_de d, LATERAL bigrams_udtf(d.text) b
        GROUP BY b.bigram HAVING count(*) >= 25
        """
    )


# ----------------------------------------------------------------------
# §2.9 — mapInArrow: the zero-copy rung below mapInPandas (RecordBatch
# in, RecordBatch out; no pandas materialization). Payload-byte
# accounting stays in Arrow compute end to end.
@query(
    "udf_arrow_batch_bytes",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS text_bytes,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    """,
    doc="SURVEY §2.9 — Arrow-native batch transform (mapInArrow, RecordBatch "
    "in/out, no pandas hop): per-doc byte + token accounting via pyarrow "
    "compute; the boundary of choice for binary-column pipelines.",
)
def udf_arrow_batch_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(
                        pc.add(pc.count_substring(text, " "), 1), pa.int64()
                    ),
                ],
                names=["doc_id", "text_bytes", "n_tokens"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(stats, "doc_id bigint, text_bytes bigint, n_tokens bigint")
