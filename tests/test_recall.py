"""Approximate-operator quality gates (SURVEY §7: "LSH quality gates —
recall@k assertions vs exact baseline, not hash equality").

Every approximate operator (oracle=None in the registry) gets its
stronger assertion here:

* MinHash-LSH pairs — precision 1 by construction (candidates are
  verified with exact Jaccard), recall measured against the exact
  shingle-Jaccard baseline at the same shingle size.
* LSH-ANN top-k — recall@k against the exact brute-force cosine top-k.
* SimHash — golden behavior on constructed near-identical documents.
"""

from __future__ import annotations

from cbts_datalake_synnex_spark.operators import dedup, similarity
from cbts_datalake_synnex_spark.workload.base import load_table


import pytest

# Certification tier (round 14): excluded from the default driver-budget
# run via pytest.ini; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.7, shingle_size=3
    )
    approx = dedup.minhash_lsh_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.7, num_perm=32, bands=8, shingle_size=3
    )
    truth = {(r["doc1"], r["doc2"]) for r in exact.collect()}
    found = {(r["doc1"], r["doc2"]) for r in approx.collect()}
    assert truth, "testdata must contain near-duplicate documents"
    # no false positives (candidates are exact-verified) ...
    assert found <= truth
    # ... and the LSH curve at s≥0.7 (32 perms / 8 bands) keeps recall high
    recall = len(found & truth) / len(truth)
    assert recall >= 0.8, f"MinHash-LSH recall {recall:.3f} below gate"


def test_lsh_ann_recall_at_k(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id < 8)
    exact = similarity.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=5)
    approx = similarity.lsh_bucket_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=5)
    truth: dict[int, set[int]] = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["cand_id"])
    got: dict[int, set[int]] = {}
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    recalls = [
        len(got.get(qid, set()) & cands) / len(cands) for qid, cands in truth.items()
    ]
    mean_recall = sum(recalls) / len(recalls)
    # multi-probe hamming≤1 over 10 planes: useful-but-approximate;
    # gate at 0.4 mean recall@5 (exact operator remains the default).
    assert mean_recall >= 0.4, f"LSH-ANN mean recall@5 {mean_recall:.3f} below gate"


def test_ivf_recall_at_k(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id < 8)
    exact = similarity.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=5)
    approx = similarity.ivf_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=5)
    truth: dict[int, set[int]] = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["cand_id"])
    got: dict[int, set[int]] = {}
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    recalls = [len(got.get(q, set()) & c) / len(c) for q, c in truth.items()]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.4, f"IVF mean recall@5 {mean_recall:.3f} below gate"


def test_embedding_near_dup_lsh_recall_vs_brute_force(spark, sf_dir):
    """The registry's x3_embedding_near_dup runs the hyperplane-LSH
    path; this gates it against the O(N²) brute force it replaces:
    verification makes false positives impossible, so the only failure
    mode is a missed candidate — require recall ≥ 0.95 (observed 1.0
    on the testdata, which is why the registry keeps the exact SQL
    oracle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    truth = {
        (r["id1"], r["id2"])
        for r in similarity.embedding_near_dup_pairs(
            emb, id_col="vec_id", vec_col="embedding", threshold=0.4
        ).collect()
    }
    found = {
        (r["id1"], r["id2"])
        for r in similarity.embedding_near_dup_pairs_lsh(
            emb, id_col="vec_id", vec_col="embedding", threshold=0.4
        ).collect()
    }
    assert truth, "testdata must contain embedding near-duplicates"
    assert found <= truth, "LSH emitted a pair the exact join rejects (precision must be 1)"
    recall = len(found & truth) / len(truth)
    assert recall >= 0.95, f"embedding-LSH recall {recall:.3f} below gate"


def test_simhash_flags_near_identical_docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base),  # exact duplicate → hamming 0, banding-guaranteed
        (3, "completely different content about spark partitions and shuffles everywhere"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = {
        (r["doc1"], r["doc2"]): r["hamming"]
        for r in dedup.simhash_near_dup_pairs(df, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0, "identical docs must collide at hamming 0"
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_distance_tracks_edit_size(spark):
    # 60-token doc: a one-token edit moves few sign-sums across zero, a
    # full rewrite moves ~half — simhash distance must order them.
    base = " ".join(f"token{i}" for i in range(60))
    edited = base.replace("token30", "changed")
    different = " ".join(f"other{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, different)], "doc_id int, text string"
    )
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df, "doc_id", "text").collect()}
    near = bin(sigs[1] ^ sigs[2]).count("1")
    far = bin(sigs[1] ^ sigs[3]).count("1")
    assert near < far, f"one-token edit ({near}) must be closer than a rewrite ({far})"
    assert near <= 16, f"one-token edit of 60 tokens moved {near} bits — hash is broken"


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["p"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("p"), F.countDistinct("l_suppkey").alias("s"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: (r["n_parts_approx"], r["n_supps_approx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_parts_approx"),
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("n_supps_approx"),
        )
        .collect()
    }
    for flag, (p, s) in exact.items():
        ap, asup = approx[flag]
        # HLL++ with rsd=2%: allow 4 sigma
        assert abs(ap - p) <= max(4, 0.08 * p), f"{flag}: {ap} vs exact {p}"
        assert abs(asup - s) <= max(4, 0.08 * s), f"{flag}: {asup} vs exact {s}"


def test_dedup_clusters_connected_components(spark):
    # two clusters: {1,2,3} via chain 1-2, 2-3; {7,9}; singleton 5 only
    # appears via no pair (absent from output by contract)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc1 int, doc2 int"
    )
    out = {r["doc"]: r["canonical"] for r in dedup.dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_dedup_clusters_long_chain_converges(spark):
    # a 40-node chain exercises multi-round propagation
    pairs = spark.createDataFrame([(i, i + 1) for i in range(40)], "doc1 int, doc2 int")
    out = {r["doc"]: r["canonical"] for r in dedup.dedup_clusters(pairs).collect()}
    assert set(out.values()) == {0}
    assert len(out) == 41


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(5, "same"), (2, "same"), (9, "other")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r["n_copies"] for r in dedup.exact_dedup(df, ["text"], "doc_id").collect()}
    assert out == {2: 2, 9: 1}


def test_pq_recall_at_k(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id < 8)
    exact = similarity.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=5)
    approx = similarity.pq_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=5)
    truth: dict[int, set[int]] = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["cand_id"])
    got: dict[int, set[int]] = {}
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    recalls = [
        len(got.get(qid, set()) & cands) / len(cands) for qid, cands in truth.items()
    ]
    mean_recall = sum(recalls) / len(recalls)
    # ADC shortlist (k*8) + exact re-rank: the shortlist has to miss a
    # true top-5 neighbor entirely for recall to drop; gate at 0.7.
    assert mean_recall >= 0.7, f"PQ mean recall@5 {mean_recall:.3f} below gate"


def test_knn_join_recall_and_shape(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id % 5 == 0)
    exact = similarity.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=5)
    approx = similarity.knn_join(
        emb, queries, id_col="vec_id", vec_col="embedding",
        k=5, n_cells=16, n_probe=6, n_assign=2,
    )
    got = approx.collect()
    truth = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    found = {(r["query_id"], r["cand_id"]) for r in got}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.80, f"knn_join recall@5 {recall:.3f} below gate"
    # exactly k rows per query, ranks contiguous
    per_q: dict = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    n_queries = queries.count()
    assert len(per_q) == n_queries
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_knn_join_partitioning_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id % 5 == 0)
    a = similarity.knn_join(
        emb, queries, id_col="vec_id", vec_col="embedding", k=3, n_cells=8, n_probe=3
    )
    b = similarity.knn_join(
        emb.repartition(11), queries.repartition(7), id_col="vec_id",
        vec_col="embedding", k=3, n_cells=8, n_probe=3,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_knn_join_empty_corpus_schema(spark):
    empty = spark.createDataFrame([], "vec_id string, embedding array<double>")
    out = similarity.knn_join(empty, empty, id_col="vec_id", vec_col="embedding", k=3)
    # id types derive from the input schema (string here), not a hardcoded long
    assert [f.dataType.simpleString() for f in out.schema.fields[:2]] == ["string", "string"]
    assert out.count() == 0


def test_bitext_mine_partial_probe_recall(spark, sf_dir):
    """The n_probe scale lever (round 10, VERDICT r9 'weak' clear):
    partial probing must recover most of the exhaustive twin's best
    pairs — the `x3_ivf_topk` discipline applied to the mining
    composition. Exhaustive (n_probe=None -> every cell) remains the
    registry oracle; this gates the 100 TB form (n_probe=4 of 8 — a
    2x GEMM-work cut; the synthetic near-uniform embeddings are IVF's
    WORST case, real clustered embeddings trade far better. Measured
    here at land time: probe 2/8 pair-recall 0.544, 3/8 0.696,
    4/8 0.788 + mined 0.64)."""
    emb = load_table(spark, sf_dir, "embeddings")
    src = emb.filter(emb.vec_id % 2 == 0)
    tgt = emb.filter(emb.vec_id % 2 == 1)
    kw = dict(id_col="vec_id", vec_col="embedding", k=4, n_cells=8)
    exact = {
        r["src_id"]: r for r in similarity.bitext_mine(src, tgt, **kw).collect()
    }
    part = {
        r["src_id"]: r
        for r in similarity.bitext_mine(src, tgt, n_probe=4, **kw).collect()
    }
    # every source still gets exactly one best row
    assert set(part) == set(exact)
    pair_hits = sum(1 for s, r in exact.items() if part[s]["tgt_id"] == r["tgt_id"])
    pair_recall = pair_hits / len(exact)
    assert pair_recall >= 0.7, f"bitext partial-probe pair recall {pair_recall:.3f}"
    # the high-precision mined subset: accepted+mutual pairs found by
    # the partial probe must mostly agree with the exhaustive mining
    mined = {
        (s, r["tgt_id"]) for s, r in exact.items() if r["accepted"] and r["mutual"]
    }
    if mined:
        got = {
            (s, r["tgt_id"]) for s, r in part.items() if r["accepted"] and r["mutual"]
        }
        mined_recall = len(got & mined) / len(mined)
        assert mined_recall >= 0.55, f"bitext mined-pair recall {mined_recall:.3f}"


def test_weighted_minhash_recall_vs_exact(spark, sf_dir):
    """Round 11 (ICWS): no false positives (exact-verified), recall
    gated vs the exact weighted-Jaccard twin at the same threshold."""
    docs = load_table(spark, sf_dir, "documents")
    exact = dedup.weighted_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.7, shingle_size=3
    )
    approx = dedup.weighted_minhash_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.7,
        num_perm=16, bands=8, shingle_size=3,
    )
    truth = {(r["doc1"], r["doc2"]) for r in exact.collect()}
    found = {(r["doc1"], r["doc2"]) for r in approx.collect()}
    assert truth, "testdata must contain weighted near-duplicate documents"
    assert found <= truth
    recall = len(found & truth) / len(truth)
    assert recall >= 0.8, f"weighted-MinHash recall {recall:.3f} below gate"


def test_weighted_jaccard_sees_repetition_set_jaccard_misses(spark):
    """The reason the weighted tier exists: a doc that repeats a
    template heavily vs one containing it once — IDENTICAL under
    distinct-shingle (set) Jaccard, far apart under tf-weighted
    Jaccard."""
    from pyspark.sql import functions as F

    once = "alpha beta gamma delta epsilon zeta"
    many = " ".join(["alpha beta gamma delta epsilon zeta"] * 20)
    df = spark.createDataFrame(
        [(1, once), (2, many)], "doc_id bigint, text string"
    )
    setj = dedup.ngram_jaccard_pairs(
        df, id_col="doc_id", text_col="text", threshold=0.0, shingle_size=3
    ).first()
    wj = dedup.weighted_jaccard_pairs(
        df, id_col="doc_id", text_col="text", threshold=0.0, shingle_size=3
    ).first()
    # sets nearly identical (only the 2 wrap-around boundary shingles
    # differ: 4 shared / 6 distinct)
    assert setj["jaccard"] >= 0.6
    assert wj["wjaccard"] < 0.1  # weights expose the 20x repetition
    assert setj["jaccard"] - wj["wjaccard"] > 0.5


def test_sq8_roundtrip_error_bounded_and_recall(spark, sf_dir):
    """Round 11 (SQ8): reconstruction error is <= scale/2 per
    component by construction, constant vectors roundtrip exactly,
    and quantized-cosine recall@5 vs float stays high on the driver
    embeddings."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    quant = similarity.scalar_quantize(emb, "vec_id", "embedding")
    deq = similarity.sq_dequantized(quant, "vec_id")
    err = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .join(deq, "vec_id")
        .join(quant.select("vec_id", "scale"), "vec_id")
        .select(
            (
                F.array_max(
                    F.zip_with("v", "dqvec", lambda a, b: F.abs(a - b))
                )
                <= F.col("scale") / 2 + 1e-12
            ).alias("ok")
        )
    )
    assert err.filter(~F.col("ok")).count() == 0
    const = spark.createDataFrame(
        [(1, [2.5, 2.5, 2.5])], "vec_id bigint, embedding array<double>"
    )
    row = similarity.sq_dequantized(
        similarity.scalar_quantize(const, "vec_id", "embedding"), "vec_id"
    ).first()
    assert row["dqvec"] == [2.5, 2.5, 2.5]

    fq = emb.filter(F.col("vec_id") < 8)
    ft = similarity.cosine_topk(emb, fq, "vec_id", "embedding", k=5, engine="jvm")
    dq_q = deq.filter(F.col("vec_id") < 8)
    st = similarity.cosine_topk(deq, dq_q, "vec_id", "dqvec", k=5, engine="jvm")
    truth = {(r["query_id"], r["cand_id"]) for r in ft.collect()}
    got = {(r["query_id"], r["cand_id"]) for r in st.collect()}
    assert len(got & truth) / len(truth) >= 0.8


def test_weighted_minhash_tfidf_weight_hook(spark):
    """The tf= hook: smoothed-idf-weighted shingles flow through both
    the LSH path and the exact twin, with LSH ⊆ exact and agreeing
    scores (no false positives under ANY positive weight table)."""
    from pyspark.sql import functions as F

    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i j"),
        (3, "a b c a b c a b c a b c d e f"),
        (4, "q r s t u v w x y z"),
        (5, "a b c a b c a b c a b c d e f"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    base = dedup.weighted_shingle_tf(df, "doc_id", "text", 3)
    n_docs = df.count()
    idf = base.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    tfidf = (
        base.join(idf, "sh")
        .select(
            "doc",
            "sh",
            (F.col("w") * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 0.5))).alias("w"),
        )
        .filter(F.col("w") > 0)
        .localCheckpoint()
    )
    exact = {
        (r["doc1"], r["doc2"]): r["wjaccard"]
        for r in dedup.weighted_jaccard_pairs(
            df, "doc_id", "text", threshold=0.5, tf=tfidf
        ).collect()
    }
    lsh = {
        (r["doc1"], r["doc2"]): r["wjaccard"]
        for r in dedup.weighted_minhash_pairs(
            df, "doc_id", "text", threshold=0.5, num_perm=16, bands=8, tf=tfidf
        ).collect()
    }
    assert exact and set(lsh) <= set(exact)
    assert {(1, 2), (3, 5)} <= set(exact)
    for k, v in lsh.items():
        assert abs(v - exact[k]) < 1e-9


def test_pq_index_storage_recall_on_driver_embeddings(spark, sf_dir):
    """Round 12 (PQ postings storage): exhaustive probes of a
    storage='pq' index (dim 64 -> 16 int codes per vector, ~8x less
    postings IO than raw doubles before parquet dictionary coding)
    keep recall@5 vs the float index acceptable on the driver
    embeddings — the sq8 certification discipline applied to the
    coarsest storage tier. Near-random embeddings are PQ's worst
    case (no subspace structure to exploit), hence the finer m=16 /
    64-code setting and the 0.6 gate; real text embeddings cluster
    and do better."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.engine import LakeEngine

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") % 50 == 0)
    root = tempfile.mkdtemp(prefix="pqrec_")
    db = f"pqrec_{uuid.uuid4().hex[:8]}"
    eng = LakeEngine(spark, root, database=db)
    try:
        eng.build_ann_index("fl", emb, "vec_id", "embedding",
                            n_cells=8, n_assign=1)
        eng.build_ann_index("pq", emb, "vec_id", "embedding",
                            n_cells=8, n_assign=1, storage="pq",
                            pq_m=16, pq_codes=64)
        truth, got = {}, {}
        for r in eng.query_ann_index("fl", q, "vec_id", "embedding",
                                     k=5, n_probe=8).collect():
            truth.setdefault(r["query_id"], set()).add(r["cand_id"])
        for r in eng.query_ann_index("pq", q, "vec_id", "embedding",
                                     k=5, n_probe=8).collect():
            got.setdefault(r["query_id"], set()).add(r["cand_id"])
        recalls = [len(got.get(k_, set()) & c) / len(c) for k_, c in truth.items()]
        mean_recall = sum(recalls) / len(recalls)
        assert mean_recall >= 0.6, f"PQ recall@5 {mean_recall:.3f} below gate"
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(root, ignore_errors=True)
