"""The declared query workload — SURVEY §2's operator inventory as
(name → Spark callable, name → DuckDB oracle SQL) pairs.

Importing this package populates ``REGISTRY``; ``__spark_entry__.py``
re-exports it as ``queries()`` / ``oracle_sql()`` for the correctness
driver. Every entry is a *declarative* DataFrame/SQL plan — Catalyst
picks the physical strategy; pandas UDFs appear only in the [EXT]
operators whose semantics built-ins can't express (multimodal decode).
"""

from cbts_datalake_synnex_spark.workload.base import REGISTRY, Query, load_table

# Register on import.
from cbts_datalake_synnex_spark.workload import relational  # noqa: F401,E402
from cbts_datalake_synnex_spark.workload import extended  # noqa: F401,E402
from cbts_datalake_synnex_spark.workload import llm  # noqa: F401,E402
from cbts_datalake_synnex_spark.workload import udfs  # noqa: F401,E402
from cbts_datalake_synnex_spark.workload import events_analytics  # noqa: F401,E402
from cbts_datalake_synnex_spark.workload import lifecycle  # noqa: F401,E402
from cbts_datalake_synnex_spark.workload import functions_ext  # noqa: F401,E402

# ----------------------------------------------------------------------
# Certification rotation. The correctness driver samples the FIRST 50
# registry entries each round, so declaration order decides which
# queries accumulate driver-side DuckDB evidence. Rounds 1-3 certified
# the same 50 relational/scalar entries; rotate the never-sampled
# queries (X1-X8, pipelines, UDF/UDTF, lifecycle, CDC, events) to the
# front so they get rows this round, and park the already-certified
# set at the back for re-rotation later.
_ROUND4_FRONT = [
    # X1/X2 — dedup family
    "x1_exact_dedup",
    "x2_ngram_jaccard_pairs",
    "x2_edit_distance_pairs",
    "x2_minhash_lsh_pairs",
    "x2_simhash_near_dup",
    "x2_dedup_clusters",
    "x2_dedup_clusters_exact",
    # X3 — similarity search
    "x3_cosine_topk",
    "x3_lsh_ann_topk",
    "x3_ivf_topk",
    "x3_embedding_near_dup",
    "x3_normalize_quantize",
    # X4 — text analysis
    "x4_lang_id",
    "x4_quality_score",
    "x4_token_counts",
    "x4_tfidf_top_terms",
    "x4_fingerprint",
    "x4_redact_pii",
    "x4_repetition_stats",
    # X5 — multimodal
    "x5_multimodal_payload",
    "x5_frame_sample",
    "x5_decode_media",
    # X6-X8 — training-data pipelines
    "pipeline_training_set",
    "pipeline_train_test_split",
    "pipeline_stratified_sample",
    "pipeline_token_pack",
    "pipeline_decontaminate",
    "pipeline_mixture_weights",
    "pipeline_mixture_resample",
    # §2.9 UDF/UDTF
    "udf_scalar_sigmoid",
    "udf_grouped_agg_weighted_avg",
    "udf_grouped_map_minmax",
    "udtf_bigrams",
    "udtf_python_bigrams",
    # medallion lifecycle (the reference's core ETL)
    "lc_ingest_nested_json",
    "lc_staging_allstring_read",
    "lc_curate_staging_to_table",
    "lc_raw_archive_roundtrip",
    "lc_schema_evolution_append",
    "lc_schema_journal",
    "lc_merge_upsert",
    "lc_truncate_reload",
    "lc_partition_discovery",
    "lc_api_ingest",
    "lc_incremental_mv",
    "lc_incremental_stream_curate",
    # CDC + events analytics
    "cdc_latest_snapshot",
    "cdc_table_diff",
    "t_funnel_conversion",
    "t_hourly_retention",
]


def _rotate_registry() -> None:
    front = [n for n in _ROUND4_FRONT if n in REGISTRY]
    missing = [n for n in _ROUND4_FRONT if n not in REGISTRY]
    assert not missing, f"rotation references unknown queries: {missing}"
    rest = [n for n in REGISTRY if n not in set(front)]
    ordered = {n: REGISTRY[n] for n in front + rest}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate_registry()

__all__ = ["REGISTRY", "Query", "load_table"]
