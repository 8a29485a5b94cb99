"""CSV/ORC source-sink roundtrip goldens (SURVEY §2.1/§2.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.sources.file_formats import (
    read_csv_all_string,
    read_orc,
    write_csv,
    write_orc,
)


def test_csv_roundtrip_hostile_values(spark, tmp_path):
    rows = [
        (0, 'comma, "quote"', "en"),
        (1, "new\nline and\ttab", "fr"),
        (2, None, "de"),                    # NULL text
        (3, "", "es"),                      # empty string is NOT null
        (4, "unicode λ→ü", "zh"),
        (5, "\\N literal backslash-N?", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = read_csv_all_string(spark, path)
    assert [f.dataType.simpleString() for f in back.schema.fields] == ["string"] * 3
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()}
    want = {str(i): (t, l) for i, t, l in rows}
    # NULL survives as None, empty string as "", text verbatim
    assert got == want


def test_csv_whitespace_payload_survives(spark, tmp_path):
    # the univocity writer trims by default; the dialect pins it off —
    # found by the hypothesis round-trip property (round 8)
    df = spark.createDataFrame(
        [(0, " "), (1, "  padded  "), (2, "\ttab-edge\t")], "k bigint, v string"
    )
    path = str(tmp_path / "csvws")
    write_csv(df, path)
    got = {r["k"]: r["v"] for r in read_csv_all_string(spark, path).collect()}
    assert got == {"0": " ", "1": "  padded  ", "2": "\ttab-edge\t"}


def test_csv_null_token_payload_is_the_documented_lossy_value(spark, tmp_path):
    # a payload exactly '\N' reads back as NULL — Spark's reader
    # applies nullValue after unquoting, so quoting can't protect it;
    # pinned here so a Spark upgrade that changes this breaks loudly
    df = spark.createDataFrame([(0, "\\N"), (1, "\\No")], "k bigint, v string")
    path = str(tmp_path / "csvnull")
    write_csv(df, path)
    got = {r["k"]: r["v"] for r in read_csv_all_string(spark, path).collect()}
    assert got == {"0": None, "1": "\\No"}


def test_csv_all_string_leaves_typing_to_policy(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5)], "a bigint, b double")
    path = str(tmp_path / "csv2")
    write_csv(df, path)
    back = read_csv_all_string(spark, path)
    assert dict(back.dtypes) == {"a": "string", "b": "string"}
    assert back.collect()[0]["a"] == "1"


def test_orc_roundtrip_full_fidelity(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    a = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.sha2(F.col("text"), 256).substr(1, 8).cast("string").isNotNull().cast("int")).alias("nn"),
        F.countDistinct(F.sha2("text", 256)).alias("d"),
    ).collect()[0]
    b = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.sha2(F.col("text"), 256).substr(1, 8).cast("string").isNotNull().cast("int")).alias("nn"),
        F.countDistinct(F.sha2("text", 256)).alias("d"),
    ).collect()[0]
    assert tuple(a) == tuple(b)


def test_orc_predicate_pushdown_in_plan(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "orc2")
    write_orc(docs, path)
    plan = (
        read_orc(spark, path)
        .filter(F.col("lang") == "en")
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "lang" in plan
    assert "ReadSchema" in plan
