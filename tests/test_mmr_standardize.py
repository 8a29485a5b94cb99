"""MMR rerank + embedding standardization goldens."""

from __future__ import annotations

from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators import similarity


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_mmr_prefers_diverse_over_redundant(spark):
    # q=10: a duplicates the query direction, b is a near-copy of a,
    # c is diverse — plain top-2 is (a, b); MMR at lambda=0.5 takes (a, c)
    vecs = _vecs(
        spark,
        [
            (10, [1.0, 0.0]),
            (1, [1.0, 0.0]),        # a: rel 1.0
            (2, [0.999, 0.0447]),   # b: rel ~0.999, sim(a,b) ~0.999
            (3, [0.7071, 0.7071]),  # c: rel ~0.707, diverse
        ],
    )
    queries = vecs.filter(F.col("vec_id") == 10)
    pool = similarity.cosine_topk(vecs, queries, id_col="vec_id", vec_col="embedding", k=3)
    out = similarity.mmr_rerank(
        pool, vecs, id_col="vec_id", vec_col="embedding", k=2, lambda_=0.5
    ).collect()
    picks = [r["cand_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]
    assert picks == [1, 3]
    # lambda=1 degenerates to pure relevance: (a, b)
    out_rel = similarity.mmr_rerank(
        pool, vecs, id_col="vec_id", vec_col="embedding", k=2, lambda_=1.0
    ).collect()
    assert [r["cand_id"] for r in sorted(out_rel, key=lambda r: r["mmr_rank"])] == [1, 2]


def test_mmr_partitioning_invariant(spark, sf_dir):
    from cbts_datalake_synnex_spark.workload.base import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    pool = similarity.cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10)
    a = similarity.mmr_rerank(pool, emb, id_col="vec_id", vec_col="embedding", k=3)
    b = similarity.mmr_rerank(
        pool.repartition(13), emb.repartition(7), id_col="vec_id", vec_col="embedding", k=3
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_standardize_hand_computed(spark):
    # dim0: values 1,3 -> mean 2, std 1; dim1 constant 5 -> centered only
    df = _vecs(spark, [(0, [1.0, 5.0]), (1, [3.0, 5.0])])
    out = {r["vec_id"]: r["embedding"] for r in
           similarity.standardize_embeddings(df, "embedding").collect()}
    assert out[0] == [-1.0, 0.0]
    assert out[1] == [1.0, 0.0]


def test_standardize_out_col_preserves_input(spark):
    df = _vecs(spark, [(0, [2.0, 4.0]), (1, [4.0, 8.0])])
    row = similarity.standardize_embeddings(df, "embedding", out_col="z").collect()[0]
    assert list(row["embedding"]) in ([2.0, 4.0], [4.0, 8.0])
    m0, s0 = 3.0, 1.0
    m1, s1 = 6.0, 2.0
    want = {
        0: [(2.0 - m0) / s0, (4.0 - m1) / s1],
        1: [(4.0 - m0) / s0, (8.0 - m1) / s1],
    }
    rows = similarity.standardize_embeddings(df, "embedding", out_col="z").collect()
    got = {r["vec_id"]: [round(x, 9) for x in r["z"]] for r in rows}
    assert got == {k: [round(x, 9) for x in v] for k, v in want.items()}


# --- random_project (round 8, JL ±1) --------------------------------------


def _py_project(rows, out_dim, salt="jl"):
    import hashlib
    import math

    out = {}
    for vid, vec in rows:
        for k in range(out_dim):
            s = 0.0
            for d, x in enumerate(vec):
                h = hashlib.md5(f"{salt}:{d}:{k}".encode()).hexdigest()
                sign = 1.0 if int(h[:8], 16) % 2 == 0 else -1.0
                s += float(x) * sign
            out[(vid, k)] = round(s / math.sqrt(out_dim), 6)
    return out


def test_random_project_matches_python_reference(spark):
    rows = [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0]), (3, [3.25, 1.0, -1.0])]
    df = _vecs(spark, rows)
    got = {
        (r["vec_id"], r["k"]): r["val"]
        for r in similarity.random_project(df, "vec_id", "embedding", out_dim=4).collect()
    }
    assert got == _py_project(rows, 4)


def test_random_project_is_linear_and_salted(spark):
    base = [(1, [1.0, 2.0, 3.0, 4.0])]
    scaled = [(1, [2.0, 4.0, 6.0, 8.0])]
    a = {
        r["k"]: r["val"]
        for r in similarity.random_project(_vecs(spark, base), "vec_id", "embedding", 4).collect()
    }
    b = {
        r["k"]: r["val"]
        for r in similarity.random_project(_vecs(spark, scaled), "vec_id", "embedding", 4).collect()
    }
    assert all(abs(b[k] - 2 * a[k]) < 1e-9 for k in a)  # projection is linear
    c = {
        r["k"]: r["val"]
        for r in similarity.random_project(
            _vecs(spark, base), "vec_id", "embedding", 4, salt="other"
        ).collect()
    }
    assert c != a  # a different salt is a different matrix


def test_random_project_partitioning_invariant(spark):
    rows = [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)]) for i in range(30)]
    df = _vecs(spark, rows)
    a = sorted(map(tuple, similarity.random_project(df, "vec_id", "embedding", 6).collect()))
    b = sorted(
        map(
            tuple,
            similarity.random_project(df.repartition(13), "vec_id", "embedding", 6).collect(),
        )
    )
    assert a == b


# --- hard_negatives (round 8) ----------------------------------------------


def _lvecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label int")


def test_hard_negatives_excludes_same_label_and_self(spark):
    # query 0 (label 1) is closest to 1 (same label) — mining must skip
    # it and return the other-label vectors in similarity order
    vecs = _lvecs(
        spark,
        [
            (0, [1.0, 0.0], 1),
            (1, [0.99, 0.1], 1),   # nearest, same label -> excluded
            (2, [0.9, 0.2], 2),    # nearest other-label
            (3, [0.0, 1.0], 2),    # orthogonal other-label
            (4, [-1.0, 0.0], 3),   # opposite
        ],
    )
    q = vecs.filter(F.col("vec_id") == 0)
    out = similarity.hard_negatives(vecs, q, "vec_id", "embedding", "label", m=2).collect()
    got = [(r["cand_id"], r["hn_rank"]) for r in sorted(out, key=lambda r: r["hn_rank"])]
    assert got == [(2, 1), (3, 2)]
    assert all(r["c_label"] != r["q_label"] for r in out)


def test_hard_negatives_query_with_no_negatives_yields_no_rows(spark):
    vecs = _lvecs(spark, [(0, [1.0, 0.0], 1), (1, [0.5, 0.5], 1)])
    out = similarity.hard_negatives(vecs, vecs, "vec_id", "embedding", "label", m=3)
    assert out.count() == 0


def test_hard_negatives_partitioning_invariant(spark):
    rows = [
        (i, [float((i * 3 + j) % 7) - 3.0 for j in range(4)], i % 3) for i in range(30)
    ]
    vecs = _lvecs(spark, rows)
    q = vecs.filter(F.col("vec_id") % 10 == 0)
    a = sorted(map(tuple, similarity.hard_negatives(vecs, q, "vec_id", "embedding", "label").collect()))
    b = sorted(
        map(
            tuple,
            similarity.hard_negatives(
                vecs.repartition(11), q, "vec_id", "embedding", "label"
            ).collect(),
        )
    )
    assert a == b


def test_hard_negatives_lane_equivalence(spark):
    """JVM fold and Arrow GEMM lanes must return identical rows —
    including rank order under rounded-cosine ties."""
    rows = [
        (i, [float((i * 5 + j * 2) % 9) - 4.0 for j in range(6)], i % 4)
        for i in range(40)
    ] + [
        # exact duplicate vectors with different ids/labels: rounded
        # ties at the cut, the id tiebreak must decide both lanes alike
        (100, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], 0),
        (101, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], 1),
        (102, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], 2),
        (103, [2.0, 4.0, 6.0, 8.0, 10.0, 12.0], 3),  # same direction
    ]
    vecs = _lvecs(spark, rows)
    q = vecs.filter(F.col("vec_id") % 7 == 0)
    a = sorted(map(tuple, similarity.hard_negatives(
        vecs, q, "vec_id", "embedding", "label", m=3, engine="jvm").collect()))
    b = sorted(map(tuple, similarity.hard_negatives(
        vecs, q, "vec_id", "embedding", "label", m=3, engine="arrow").collect()))
    assert a == b


def test_hard_negatives_lane_equivalence_null_labels(spark):
    """NULL labels must mine nothing in EITHER lane (SQL `!=` is
    NULL-absorbing; the Arrow lane masks them explicitly — ADVICE r8
    found numpy's `!=` treating None as a mismatch and mining it)."""
    rows = [
        (i, [float((i * 5 + j * 2) % 9) - 4.0 for j in range(6)], i % 3)
        for i in range(20)
    ] + [
        (200, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0], None),  # null-label cand
        (201, [0.5, 0.5, 0.5, 0.5, 0.5, 0.5], None),  # null-label query
    ]
    vecs = _lvecs(spark, rows)
    q = vecs.filter((F.col("vec_id") % 7 == 0) | (F.col("vec_id") == 201))
    a = sorted(map(tuple, similarity.hard_negatives(
        vecs, q, "vec_id", "embedding", "label", m=3, engine="jvm").collect()))
    b = sorted(map(tuple, similarity.hard_negatives(
        vecs, q, "vec_id", "embedding", "label", m=3, engine="arrow").collect()))
    assert a == b
    assert a, "non-null queries must still mine"
    mined_ids = {t[0] for t in a} | {t[2] for t in a}
    assert 200 not in mined_ids and 201 not in mined_ids


def test_hard_negatives_arrow_all_null_label_queries_empty(spark):
    vecs = _lvecs(spark, [(0, [1.0, 0.0], 1), (1, [0.5, 0.5], 2)])
    q = _lvecs(spark, [(9, [1.0, 0.0], None)])
    out = similarity.hard_negatives(
        vecs, q, "vec_id", "embedding", "label", m=3, engine="arrow"
    )
    assert out.count() == 0


def test_hard_negatives_distributed_equals_broadcast_lane(spark):
    """The knn_join→filter→truncate composition must equal the
    broadcast-contract operator wherever the pool covers the
    negatives: exhaustive probing + k_pool ≥ corpus makes the pool the
    full rounded ranking, so the two lanes coincide exactly."""
    rows = [
        (i, [float((i * 5 + j * 2) % 9) - 4.0 for j in range(6)], i % 3)
        for i in range(30)
    ] + [
        (100, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], 0),
        (101, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], 1),   # rounded tie twin
        (102, [2.0, 4.0, 6.0, 8.0, 10.0, 12.0], 2),  # same direction
        (103, [0.5, 0.5, 0.5, 0.5, 0.5, 0.5], None),  # null label
    ]
    vecs = _lvecs(spark, rows)
    q = vecs.filter(F.col("vec_id") % 7 == 0)
    a = sorted(map(tuple, similarity.hard_negatives(
        vecs, q, "vec_id", "embedding", "label", m=3, engine="jvm").collect()))
    b = sorted(map(tuple, similarity.hard_negatives_distributed(
        vecs, q, "vec_id", "embedding", "label",
        m=3, k_pool=64, n_cells=4, n_probe=4, n_assign=1).collect()))
    assert a == b


def test_hard_negatives_distributed_pool_bound_is_honest(spark):
    """With a pool too small to reach past a same-label crowd, the
    distributed lane returns FEWER negatives — the documented
    pool-bounded semantics, not silent wrongness."""
    # query 0 (label 0); its 3 nearest are all label 0; the only
    # other-label vector is far away
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.01], 0),
        (2, [0.98, 0.02], 0),
        (3, [0.97, 0.03], 0),
        (4, [-1.0, 0.0], 1),
    ]
    vecs = _lvecs(spark, rows)
    q = vecs.filter(F.col("vec_id") == 0)
    small = similarity.hard_negatives_distributed(
        vecs, q, "vec_id", "embedding", "label",
        m=1, k_pool=2, n_cells=2, n_probe=2, n_assign=1).collect()
    assert small == []  # pool exhausted by same-label neighbors
    full = similarity.hard_negatives_distributed(
        vecs, q, "vec_id", "embedding", "label",
        m=1, k_pool=4, n_cells=2, n_probe=2, n_assign=1).collect()
    assert [(r["cand_id"], r["hn_rank"]) for r in full] == [(4, 1)]


def test_bitext_mine_planted_pair_and_partitioning(spark):
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.operators.similarity import bitext_mine

    # plant one true translation pair (s0 <-> t1) in noise: s0 and t1
    # are near-identical, everything else points elsewhere
    src_rows = [
        (0, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.9, 0.1]),
        (6, [0.1, 0.8, 0.2]),
    ]
    tgt_rows = [
        (1, [0.99, 0.01, 0.0]),   # the planted counterpart of s0
        (3, [0.0, 0.7, 0.3]),
        (5, [0.0, 0.6, 0.4]),
        (7, [0.2, 0.5, 0.5]),
    ]
    src = spark.createDataFrame(src_rows, "vec_id bigint, v array<double>")
    tgt = spark.createDataFrame(tgt_rows, "vec_id bigint, v array<double>")
    out = {
        r["src_id"]: r
        for r in bitext_mine(
            src, tgt, id_col="vec_id", vec_col="v", k=2, n_cells=2
        ).collect()
    }
    assert len(out) == 4
    planted = out[0]
    assert planted["tgt_id"] == 1
    assert planted["accepted"] and planted["mutual"]
    # margins normalize hubness: every source got exactly one best row
    a = sorted(map(tuple, out.values()))
    b = sorted(
        map(
            tuple,
            bitext_mine(
                src.repartition(3), tgt.repartition(5),
                id_col="vec_id", vec_col="v", k=2, n_cells=2,
            ).collect(),
        )
    )
    assert a == b
