"""Regenerate PLANS.md — formatted physical plans for the headline
queries, the artifact backing SCALING.md's plan-shape claims.

Usage: python scripts/gen_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cbts_datalake_synnex_spark.plans.inspect import explain_str  # noqa: E402
from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload import REGISTRY  # noqa: E402

# Every bench headliner is pinned unconditionally (BENCH_r{N} and the
# plan-drift tripwire must cover the same set — VERDICT r4 found the
# 2nd most expensive bench query missing from PLANS.md), plus extra
# scale-interesting shapes.
_EXTRA_SHOWCASE = [
    "j_market_share",
    "j5_banded_interval_join",
    "t_sliding_window",
    "t_session_window",
    "pipeline_token_pack",
    "pipeline_decontaminate",
    "x4_repetition_stats",
    "x2_edit_distance_pairs",
    "x2_ngram_jaccard_pairs",
    "x3_embedding_near_dup",
    "pipeline_mixture_resample",
    "u3_unpivot",
    "f_histogram",
    "x2_span_dedup",
    "x3_pq_topk",
    "x4_winnow_fingerprint",
    "pipeline_quality_filter",
    "dq_expectations",
    # round-7 shapes: the probe-only admission gate, the composed
    # hygiene aggregate, the repetition gates, the cluster-atomic
    # split, and within-doc repair
    "pipeline_incremental_admission",
    "x3_semantic_dedup",
    "pipeline_corpus_hygiene",
    "x4_repetition_flags",
    "pipeline_leakage_safe_split",
    "x4_collapse_repeated_lines",
    # round-8 shapes: the composed retrieve→rerank (cogrouped kNN +
    # per-query MMR, no full-vector-table broadcast)
    "pipeline_retrieve_rerank",
    # round-9 shapes: the unrolled PageRank fixpoint, the
    # partition-scan EWMA, the bigram-LM model join, and the
    # bucketed-motionless ANN index probe
    "j_copurchase_pagerank",
    "t_ewma_smooth",
    "x4_bigram_ppl",
    "x3_ann_index_probe",
    # round-9 late shapes: the struct-extremes single aggregate, the
    # vocab-table BPE fixpoint, the broadcast-matrix Lloyd iteration,
    # and the two runtime-pruning certifications (the plans SHOW the
    # dynamicpruning partition filter / might_contain probe)
    "x6_dpo_pairs",
    "x4_bpe_train",
    "x3_kmeans_refine",
    "lc_dpp_join",
    "lc_bloom_join",
    # the degree-oriented wedge join (equi-joins over pinned arcs)
    "j_triangle_count",
    # round-10 shapes: the dedup-free banded overlap join, the BSP
    # label-propagation round, the exploded-agg count-min build +
    # broadcast probe, the Expand-shared column profile, the annealed
    # epoch grid, and the (key,cnt) skew statistics
    "j5_interval_overlap_join",
    "j_label_propagation",
    "f_count_min_sketch",
    "dq_column_profile",
    "x8_curriculum_schedule",
    "dq_skew_profile",
    # round-10 late shapes: the two-window nearest as-of, the
    # HOF-only content-defined splitter, the sketch inner product,
    # the grid-bounded KS window, and the gated epoch explode
    "j6_asof_nearest",
    "x2_cdc_chunks",
    "f_cms_join_estimate",
    "dq_ks_test",
    "pipeline_epoch_repeat",
    # round-11 shapes: the exact weighted-Jaccard inverted index
    # (tf weights riding the same shuffle) and the weighted-LSH
    # verify over tf maps; lpa_bucketed/t_stream_heartbeat/
    # lc_join_estimate are engine-table/streaming certifications whose
    # interesting shapes (exchange-free BSP join, one-number state,
    # KB-sketch join) are pinned in their own raises/tests instead
    "x2_weighted_minhash_pairs",
    # round-11 late shapes: the candidate-bounded BM25 scorer, the
    # top-k-only RRF fusion, the one-plan unrolled-GD trajectory, and
    # the quantize/dequantize projection pair around the cosine top-k
    "x4_bm25_topk",
    "pipeline_rrf_fusion",
    "x4_logreg_train",
    "x3_sq8_recall",
    # round-13 shapes: the sorted-shingle ExactSubstr stream, the
    # two-level distributed ntile/CDF rewires (the plans SHOW every
    # Window node partitioned by __pid), and the gram-text NB langid
    "x2_exact_substring_dedup",
    "t_rfm_segments",
    "x8_quantile_normalize",
    "x4_langid_trained",
    # round-13 continuation shapes: the bounded-state KMV build +
    # sketch-frame theta set-ops, the entity-shuffle CUSUM/Holt
    # recurrences, the 9-row Benford agg, the completed-table Cramér
    # V, the one-scan R-replicate bootstrap, and the decode+hash
    # perceptual dedup
    "f_theta_sketch",
    "t_cusum_changepoint",
    "t_holt_trend",
    "dq_benford_test",
    "dq_cramers_v",
    "f_poisson_bootstrap",
    "x5_image_phash_dedup",
]
BENCH_QUERIES = [n for n, q in REGISTRY.items() if q.bench]
SHOWCASE = BENCH_QUERIES + [n for n in _EXTRA_SHOWCASE if n not in BENCH_QUERIES]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("gen-plans")
    out = [
        "# PLANS — formatted physical plans (generated by scripts/gen_plans.py)",
        "",
        "Plan *structure* is scale-invariant; this is the evidence behind",
        "SCALING.md. Regenerate after changing any workload query.",
        "",
    ]
    for name in SHOWCASE:
        q = REGISTRY[name]
        txt = explain_str(q.fn(spark, sf_dir), "formatted")
        # keep the tree + the scan details; drop codegen ids noise
        txt = re.sub(r"\[codegen id : \d+\]", "", txt)
        out.append(f"## {name}\n\n{q.doc}\n\n```\n{txt.strip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()
    print("PLANS.md written")


if __name__ == "__main__":
    main()
