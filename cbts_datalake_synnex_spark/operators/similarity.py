"""Similarity search over embedding columns (SURVEY §2.10 X3).

* ``cosine_topk`` — exact brute-force baseline: broadcast the (small)
  query set against the candidate table; dot products run as built-in
  ``zip_with``/``aggregate`` higher-order functions (JVM, codegen) in
  double precision; per-query top-k via window rank. Scan-bound and
  embarrassingly parallel — correct at any scale, costly at high k·N.
* ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH (SimHash
  for vectors). Deterministic hash-derived hyperplanes bucket both
  sides; only same-bucket (multi-probe: hamming ≤ 1) pairs are scored.
  Recall < 1 by construction — tests assert recall@k against the exact
  operator rather than equality (SURVEY §7 "LSH quality gates").
* ``embedding_near_dup_pairs`` — all candidate pairs with cosine ≥ τ
  (embedding-space near-duplicate detection, X2's cousin).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Double-precision dot product of two array<float> columns via
    built-in higher-order functions — sequential fold, no UDF."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def _norm(v: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


ARROW_LANE_MIN_DIM = 128  # measured crossover (SCALING.md): BLAS GEMM
# amortization beats the JVM fold's O(d)-per-pair expression tree from
# ~128 dims; below it the Arrow serialization boundary costs more than
# it saves.


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    round_dp: int = 6,
    engine: str = "auto",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, cand_id, cosine, rank). Ranking uses the rounded
    similarity plus the candidate id as tiebreak so results are
    deterministic across engines/precisions.

    ``engine``: ``"jvm"`` forces the whole-stage-codegen higher-order
    fold, ``"arrow"`` forces the BLAS-GEMM `cosine_topk_arrow` lane,
    ``"auto"`` (default) probes the embedding width from one query row
    and routes wide embeddings (≥ `ARROW_LANE_MIN_DIM`) to the Arrow
    lane — both lanes return identical rows (equivalence golden), so
    the routing is purely a throughput decision.
    """
    if engine not in ("auto", "jvm", "arrow"):
        raise ValueError(f"engine: {engine!r}")
    if engine == "arrow":
        return cosine_topk_arrow(candidates, queries, id_col, vec_col, k, round_dp)
    if engine == "auto":
        probe = queries.select(F.size(F.col(vec_col)).alias("d")).first()
        if probe is not None and (probe["d"] or 0) >= ARROW_LANE_MIN_DIM:
            return cosine_topk_arrow(candidates, queries, id_col, vec_col, k, round_dp)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = candidates.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")).withColumn(
        "cnorm", _norm(F.col("cv"))
    )
    q = q.withColumn("qnorm", _norm(F.col("qv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), round_dp))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def exact_rescore(
    pairs: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_col: str = "query_id",
    cand_col: str = "cand_id",
    round_dp: int = 6,
    out_col: str = "cosine_exact",
) -> DataFrame:
    """Recompute the exact cosine for an (already-small) pair list —
    the verification step ANN report queries use to certify that an
    approximate index returned true similarities for whatever it
    returned. ``pairs`` is k·|queries| rows, so IT broadcasts into the
    vector table joins; the big vector side is never shuffled."""
    qv = vectors.select(F.col(id_col).alias(query_col), F.col(vec_col).alias("__qv"))
    cv = vectors.select(F.col(id_col).alias(cand_col), F.col(vec_col).alias("__cv"))
    # Both joins broadcast the POOL side (pairs, then pairs+cv — both
    # k·|queries| rows); the full vector table is always the streamed
    # probe side, never broadcast and never shuffled.
    pool = cv.join(F.broadcast(pairs), cand_col)
    return (
        qv.join(F.broadcast(pool), query_col)
        .withColumn(
            out_col,
            F.round(
                _dot(F.col("__qv"), F.col("__cv")) / (_norm(F.col("__qv")) * _norm(F.col("__cv"))),
                round_dp,
            ),
        )
        .drop("__qv", "__cv")
    )


def _hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible
    across runs/hosts with no RNG state (SURVEY §7: every approximate
    operator must be seedable/frozen for tests)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int.from_bytes(hashlib.md5(f"lshplane:{p}:{d}".encode()).digest()[:8], "big")
            row.append((h % 2_000_001) / 1_000_000.0 - 1.0)  # uniform [-1, 1]
        planes.append(row)
    return planes


def _bucket(vec_col: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-bit bucket id: bit p = (vec · plane_p) > 0."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long")))
    return sig


def lsh_bucket_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_tables: int = 8,
    bits_per_table: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    ``n_tables`` independent hash tables of ``bits_per_table`` sign
    bits each (the banding trick): a candidate is scored iff it shares
    at least one table's full signature with the query. For neighbor
    bit-agreement probability p = 1 − θ/π, recall per neighbor is
    1 − (1 − p^bits)^tables — e.g. p=0.8 → 0.96 with the defaults.
    The join is equi on (table, signature): the all-pairs cross join
    never materializes, and at 1000 executors it partitions cleanly by
    bucket. Scale rule: grow ``bits_per_table`` ≈ log2(N / wanted
    bucket size) as the candidate table grows; add tables to restore
    recall."""
    planes = _hyperplanes(n_tables * bits_per_table, dim)

    def table_buckets(vec: F.Column) -> F.Column:
        structs = []
        for t in range(n_tables):
            sub = planes[t * bits_per_table : (t + 1) * bits_per_table]
            structs.append(F.struct(F.lit(t).alias("t"), _bucket(vec, sub).alias("sig")))
        return F.array(*structs)

    c = candidates.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")).withColumn(
        "cnorm", _norm(F.col("cv"))
    ).withColumn("bucket", F.explode(table_buckets(F.col("cv"))))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).withColumn(
        "qnorm", _norm(F.col("qv"))
    ).withColumn("bucket", F.explode(table_buckets(F.col("qv"))))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", "qv", "cv", "qnorm", "cnorm")
        .dropDuplicates(["query_id", "cand_id"])
        .select(
            "query_id",
            "cand_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def _train_centroids(sample, k: int, lloyd_iters: int, restarts: int = 3):
    """Deterministic spherical k-means on a unit-normalized sample:
    seeded k-means++ (D² sampling under fixed RandomStates — no
    wall-clock randomness, so oracles stay stable), Lloyd refinement
    with empty-cell reseeding at the farthest point, best of
    ``restarts`` by quantization error. Robust to sample ORDER — the
    md5-shuffled unbiased sample must not hand Lloyd a clumped init
    (a first-k init on ordered ids only looked good because synthetic
    ids correlate with cluster structure — the exact bias the
    shuffled sample removes)."""
    import numpy as np

    k = min(k, len(sample))
    # best-of-N guards small-k init instability; at auto-scaled cell
    # counts (k in the hundreds) a single seeded run is already stable
    # and the extra restarts would triple a driver-side cost that now
    # scales with k
    if k > 128:
        restarts = 1

    def _pp_init(rng):
        # incremental D² maintenance: only the NEWEST center's
        # distances are computed per step — O(k·n·d) total, where the
        # naive re-min over all centers is O(k²·n·d) and dominates
        # training once k reaches the hundreds (the SemDeDup auto-cell
        # regime). min(clamp(a), clamp(b)) == clamp(min(a, b)), so the
        # D² weights are the same values as the batch formulation.
        first = sample[rng.randint(len(sample))]
        cents = [first]
        d = np.maximum(1.0 - sample @ first, 0.0)
        for _ in range(1, k):
            total = d.sum()
            if total <= 0:
                nxt = sample[rng.randint(len(sample))]
            else:
                nxt = sample[rng.choice(len(sample), p=d / total)]
            cents.append(nxt)
            d = np.minimum(d, np.maximum(1.0 - sample @ nxt, 0.0))
        return np.array(cents)

    def _lloyd(cents):
        cents = cents.copy()
        for _ in range(lloyd_iters):
            assign = np.argmax(sample @ cents.T, axis=1)  # cosine on unit rows
            for c in range(k):
                members = sample[assign == c]
                if len(members):
                    m = members.mean(axis=0)
                    cents[c] = m / max(np.linalg.norm(m), 1e-12)
                else:
                    far = np.min(1.0 - sample @ cents.T, axis=1)
                    cents[c] = sample[int(np.argmax(far))]
        return cents

    best, best_err = None, None
    for seed in range(restarts):
        cents = _lloyd(_pp_init(np.random.RandomState(seed)))
        err = float(np.mean(1.0 - np.max(sample @ cents.T, axis=1)))
        if best is None or err < best_err:
            best, best_err = cents, err
    return best


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 6,
    lloyd_iters: int = 8,
    n_assign: int = 2,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: partition the
    corpus into ``n_cells`` Voronoi cells around trained centroids;
    queries score only the ``n_probe`` nearest cells.

    Training is deterministic (`_train_centroids`: seeded k-means++ on
    an md5-shuffled unbiased sample, best-of-3 restarts) and driver-
    side on a bounded sample — the same budget class as any k-means
    trainer. Assignment stays a broadcast-projection, and the probe
    join is equi on cell id so it partitions cleanly. Recall grows
    with ``n_probe/n_cells`` (tests gate it vs the exact operator).
    Returns (query_id, cand_id, cosine, rank).
    """
    import numpy as np

    # --- train (driver-side on a bounded sample; deterministic) -------
    # md5(id) order: still deterministic (oracle-stable) but UNBIASED —
    # raw-id order correlates with content when ids follow crawl order,
    # skewing centroids/codebooks toward the earliest documents.
    seed_rows = (
        candidates.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("i").cast("string")), F.col("i"))
        .limit(max(n_cells * 64, 512))
        .collect()
    )
    if not seed_rows:
        return candidates.sparkSession.createDataFrame(
            [], "query_id long, cand_id long, cosine double, rank int"
        )
    sample = np.array([list(r["v"]) for r in seed_rows], dtype=np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    n_cells = min(n_cells, len(sample))  # degenerate corpus < n_cells
    cents = _train_centroids(sample, n_cells, lloyd_iters)

    # Centroids travel as BROADCAST DATA (a one-row matrix joined onto
    # each side), not as F.lit plan literals — plan size stays O(1) in
    # n_cells × dim instead of inlining every coordinate into the tree
    # (at 768-dim × 4k cells a literal tree is MBs of plan per query).
    cent_df = candidates.sparkSession.createDataFrame(
        [([[float(x) for x in c] for c in cents],)], "__cmat: array<array<double>>"
    )

    def nearest_cells(vec: F.Column, n: int) -> F.Column:
        """array of the n cell-ids with highest cosine to vec (unit
        centroids ⇒ dot product ranks cosine)."""
        scored = F.transform(
            F.col("__cmat"),
            lambda cv, i: F.struct(_dot(vec, cv).alias("s"), i.alias("c")),
        )
        return F.slice(F.reverse(F.array_sort(scored)), 1, n).getField("c")

    c = (
        candidates.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
        .crossJoin(F.broadcast(cent_df))
        .withColumn("cnorm", _norm(F.col("cv")))
        # multiple assignment: index each vector under its n_assign
        # nearest cells (2× index rows for a large recall gain — the
        # standard IVF lever for neighbors straddling cell borders);
        # dropDuplicates below collapses the double-probed hits.
        .withColumn("cell", F.explode(nearest_cells(F.col("cv"), n_assign)))
        .drop("__cmat")
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(cent_df))
        .withColumn("qnorm", _norm(F.col("qv")))
        .withColumn("cell", F.explode(nearest_cells(F.col("qv"), n_probe)))
        .drop("__cmat")
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def semantic_dedup(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    n_cells: int | None = None,
    lloyd_iters: int = 8,
    round_dp: int = 6,
    n_assign: int = 2,
    target_cell_size: int = 128,
    assign_engine: str = "auto",
) -> DataFrame:
    """X3+ — SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540, public): cluster the embedding space with the
    same deterministic spherical k-means as `ivf_topk`
    (`_train_centroids` on the md5-shuffled bounded sample), compute
    cosine pairs ONLY within each cell, and drop every vector that has
    a lower-id near-duplicate at cosine ≥ ``threshold`` in its cell.

    Scale shape: the paper's trick verbatim — clustering turns the
    O(N²) all-pairs cost into Σ|cell|², and the within-cell join is an
    EQUI-join on cell id, so it partitions cleanly; ``n_cells`` is the
    lever (the paper uses 11k clusters for LAION-440M) and
    ``n_cells=None`` (default) self-applies it: cells = N /
    ``target_cell_size`` (clamped [16, 1024]), so the join cost stays
    linear in N instead of silently going quadratic at a fixed cell
    count. Centroids travel as a one-row broadcast matrix like IVF's. Recall caveat, also the paper's:
    pairs straddling a cell boundary are missed — ``n_assign`` indexes
    each vector under its n nearest cells (IVF's multiple-assignment
    lever) to recover most boundary pairs, and the registry query
    certifies a recall floor against the exact all-pairs twin.

    Returns one row per input vector:
    (id, cell, keep, dup_of, dup_cosine) — ``cell`` the primary
    (nearest) cell, ``dup_of`` the LOWEST-id qualifying partner
    (deterministic tiebreak), NULL when kept.
    """
    import numpy as np

    if n_cells is None:
        # the paper's scale rule, self-applied: grow cells with the
        # corpus so each cell stays ~target_cell_size and the
        # within-cell join cost stays LINEAR in N (Σ|cell|² ≈
        # N·target). A fixed cell count silently degrades to the
        # quadratic all-pairs join as the corpus grows — measured 11×
        # wall per 10× data before this. The 1024 cap bounds driver
        # training and the broadcast centroid matrix; past ~128k·cells
        # vectors, raise the cap or pass externally-trained cells.
        n_vec = vectors.count()
        n_cells = max(16, min(1024, -(-n_vec // target_cell_size)))
    seed_rows = (
        vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("i").cast("string")), F.col("i"))
        .limit(min(max(n_cells * 64, 512), 65536))
        .collect()
    )
    if not seed_rows:
        # empty-corpus schema must match the non-empty path, including
        # the caller's id type (string/int ids, not hardcoded long)
        from pyspark.sql import types as T

        id_type = vectors.schema[id_col].dataType
        return vectors.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("id", id_type),
                    T.StructField("cell", T.IntegerType()),
                    T.StructField("keep", T.BooleanType()),
                    T.StructField("dup_of", id_type),
                    T.StructField("dup_cosine", T.DoubleType()),
                ]
            ),
        )
    sample = np.array([list(r["v"]) for r in seed_rows], dtype=np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    n_cells = min(n_cells, len(sample))
    cents = _train_centroids(sample, n_cells, lloyd_iters)
    cent_df = vectors.sparkSession.createDataFrame(
        [([[float(x) for x in c] for c in cents],)], "__cmat: array<array<double>>"
    )

    # top-n_assign cells per vector, scored against the broadcast
    # centroid matrix (same indexed-transform shape as ivf_topk). Two
    # lanes, the cosine_topk routing discipline: the JVM expression
    # costs O(n_cells·d) interpreted HOF work per row — fine at small
    # cell counts (and keeps certified/golden plans byte-stable), but
    # at auto-scaled cell counts one numpy GEMM per Arrow batch does
    # the same scoring at memory bandwidth. Tie order matches the JVM
    # `reverse(array_sort(struct(s, c)))` exactly: score desc, HIGHER
    # cell index first on equal scores.
    id_type = vectors.schema[id_col].dataType.simpleString()
    vec_type = vectors.schema[vec_col].dataType.simpleString()
    if assign_engine == "auto":
        assign_engine = "jvm" if n_cells <= 64 else "arrow"
    if assign_engine == "jvm":
        cell_scores = (
            "transform(__cmat, c -> aggregate(zip_with(v, c,"
            " (x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (a, b) -> a + b))"
        )
        ranked_cells = (
            f"slice(reverse(array_sort(zip_with({cell_scores},"
            f" sequence(1, size(__cmat)), (s, i) -> struct(s AS s, i AS c)))),"
            f" 1, {int(n_assign)})"
        )
        assigned = (
            vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .crossJoin(F.broadcast(cent_df))
            .withColumn("cells", F.expr(ranked_cells + ".c"))
            .drop("__cmat")
        )
    else:
        cmat = np.asarray(cents, dtype=np.float64)

        def _assign(batches):
            import pandas as pd

            k = cmat.shape[0]
            take = min(int(n_assign), k)
            for pdf in batches:
                if pdf.empty:
                    continue
                V = np.asarray(
                    [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
                )
                sims = V @ cmat.T  # (B, k)
                # stable argsort over the REVERSED columns: ties land
                # on the higher original index, the JVM order
                rev = np.argsort(-sims[:, ::-1], axis=1, kind="stable")[:, :take]
                cells = (k - rev).astype("int32")  # 1-based, like sequence(1, k)
                yield pd.DataFrame(
                    {"id": pdf["id"], "v": pdf["v"], "cells": list(cells)}
                )

        assigned = (
            vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .mapInPandas(_assign, schema=f"id {id_type}, v {vec_type}, cells array<int>")
        )
    exploded = assigned.select("id", "v", F.explode("cells").alias("cell"))

    def _cell_pairs(pdf):
        # One BLAS GEMM per cell (the cosine_topk_arrow discipline):
        # the JVM higher-order fold costs O(d) interpreted expression
        # work PER PAIR — at Σ|cell|² pairs that dominates the whole
        # operator (measured ~5× the assignment stage). Raw cosines
        # leave Python UNROUNDED with a loose threshold; the exact
        # HALF_UP round + filter happens JVM-side below, so the final
        # pair set is identical to the fold formulation's.
        import numpy as np
        import pandas as pd

        ids_raw = pdf["id"].to_numpy()
        if len(pdf) < 2:
            return pd.DataFrame(
                {"a_id": ids_raw[:0], "b_id": ids_raw[:0],
                 "cosine": np.array([], dtype="float64")}
            )
        order = np.argsort(ids_raw, kind="stable")
        ids = ids_raw[order]
        V = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["v"].iloc[order]]
        )
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sims_m = V @ V.T
        iu, ju = np.triu_indices(len(ids), 1)
        sims = sims_m[iu, ju]
        # pre-filter margin derived from round_dp: any raw sim that
        # could round UP to the threshold (>= threshold - 0.5 ulp of
        # the rounding grid) must survive to the JVM round+filter, or
        # the pair set diverges from the fold formulation's.
        keep = sims >= (threshold - 0.5 * 10.0 ** -round_dp - 1e-12)
        return pd.DataFrame(
            {"a_id": ids[iu[keep]], "b_id": ids[ju[keep]], "cosine": sims[keep]}
        )

    dup_pairs = (
        exploded.groupBy("cell")
        .applyInPandas(_cell_pairs, schema=f"a_id {id_type}, b_id {id_type}, cosine double")
        .withColumn("cosine", F.round(F.col("cosine"), round_dp))
        .filter(F.col("cosine") >= threshold)
        .select("b_id", "a_id", "cosine")
    )
    # lowest-id partner wins the dup_of slot (min over struct orders by
    # a_id first, carrying ITS cosine along — one agg, no window)
    dups = dup_pairs.groupBy("b_id").agg(
        F.min(F.struct(F.col("a_id"), F.col("cosine"))).alias("m")
    ).select(
        F.col("b_id").alias("id"),
        F.col("m.a_id").alias("dup_of"),
        F.col("m.cosine").alias("dup_cosine"),
    )
    return (
        assigned.select("id", F.element_at("cells", 1).alias("cell"))
        .join(dups, "id", "left")
        .select(
            "id",
            "cell",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
            "dup_cosine",
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All pairs with cosine ≥ threshold — BRUTE-FORCE baseline (O(N²)
    theta join). Kept as the recall yardstick for
    ``embedding_near_dup_pairs_lsh``, which is the operator the
    registry exposes; never run this on a large corpus.
    Returns (id1, id2, cosine)."""
    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1")).withColumn("n1", _norm(F.col("v1")))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2")).withColumn("n2", _norm(F.col("v2")))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("cosine", F.round(_dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_tables: int = 8,
    bits_per_table: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs with cosine ≥ threshold — the SCALE path:
    hyperplane-LSH candidate generation + exact cosine verification.

    Candidate generation: every vector lands in ``n_tables`` sign-bit
    buckets; the lower-id side additionally probes each bucket at
    hamming distance 1 (multi-probe), so a pair becomes a candidate iff
    some table's signatures agree on ≥ ``bits_per_table − 1`` bits.
    The join is equi on (table, signature) — the all-pairs cross join
    never materializes, and at 1000 executors it partitions by bucket.
    Candidates (≈ the near-duplicate count, tiny vs N²) are verified
    with exact cosine: NO false positives; recall per pair at angle θ is
    1 − (1 − P(hamming ≤ 1))^tables with bit-agreement p = 1 − θ/π —
    ≥ 0.997 at cosine 0.4 with the defaults, gated ≥ 0.95 vs the brute
    force in tests/test_recall.py. Scale rule: grow ``bits_per_table``
    ≈ log2(N / wanted bucket size); add tables to restore recall.
    Returns (id1, id2, cosine).
    """
    planes = _hyperplanes(n_tables * bits_per_table, dim)

    def table_sigs(vec: F.Column) -> F.Column:
        structs = []
        for t in range(n_tables):
            sub = planes[t * bits_per_table : (t + 1) * bits_per_table]
            structs.append(F.struct(F.lit(t).alias("t"), _bucket(vec, sub).alias("sig")))
        return F.array(*structs)

    sigs = (
        df.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("v"))
        .select("doc", F.explode(table_sigs(F.col("v"))).alias("ts"))
        .select("doc", F.col("ts.t").alias("t"), F.col("ts.sig").alias("sig"))
    )
    # multi-probe (one side only): the lower-id side also visits every
    # bucket one bit-flip away, so hamming-1 tables still collide.
    probes = sigs.select(
        "doc",
        "t",
        F.explode(
            F.array(
                F.col("sig"),
                *[
                    F.col("sig").bitwiseXOR(F.lit(1 << b).cast("long"))
                    for b in range(bits_per_table)
                ],
            )
        ).alias("sig"),
    )
    cand = (
        probes.alias("a")
        .join(
            sigs.alias("b"),
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id1"), F.col("b.doc").alias("id2"))
        .distinct()
    )
    # Verification mirrors minhash_lsh_pairs: broadcast the (small)
    # candidate set so the vector table is never shuffled for it.
    v1 = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1")).withColumn("n1", _norm(F.col("v1")))
    v2 = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2")).withColumn("n2", _norm(F.col("v2")))
    return (
        v1.join(F.broadcast(cand), "id1")
        .join(v2, "id2")
        .withColumn("cosine", F.round(_dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def normalize_quantize(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    bits_scale: int = 127,
) -> DataFrame:
    """L2-normalize + symmetric int8 quantization of an embedding
    column — the storage/bandwidth prep step of a vector pipeline
    (quantized vectors are 4× smaller to shuffle/store; cosine on
    normalized vectors reduces to a dot product).

    Pure higher-order-function projection (no UDF): component →
    ``floor(x/‖v‖·scale + 0.5)`` (explicit half-up — engine-portable,
    unlike round()'s tie modes). Zero-norm vectors quantize to an
    empty string with norm 0 rather than NaN.
    """
    v = F.col(vec_col)
    norm = _norm(v)
    q = F.transform(
        v,
        lambda x: F.floor(x.cast("double") / norm * bits_scale + F.lit(0.5)).cast("int"),
    )
    return df.select(
        F.col(id_col),
        F.round(norm, 6).alias("l2_norm"),
        F.when(norm == 0, F.lit(""))
        .otherwise(F.array_join(q.cast("array<string>"), ","))
        .alias("q_vec"),
    )


# ----------------------------------------------------------------------
# Product quantization (PQ) — the memory-compressed ANN index. Vectors
# are split into m subvectors; each subvector is replaced by the id of
# its nearest codebook centroid (trained per-subspace). Approximate
# query-candidate dot products then need only a (query × subspace ×
# code) lookup table — the corpus is never re-read at full width.
def train_pq_books(
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    n_codes: int,
    lloyd_iters: int = 2,
):
    """Train per-subspace PQ codebooks on a bounded, deterministic
    driver-side sample (round 12: factored out of `pq_topk` verbatim
    so `engine.build_ann_index(storage='pq')` trains the same way).
    md5(id) order: deterministic (oracle-stable) but UNBIASED — raw-id
    order correlates with content when ids follow crawl order, skewing
    codebooks toward the earliest documents. Trains on UNIT vectors so
    decoded/ADC products approximate cosine (the ranking target), not
    the norm-confounded raw dot. Returns (books, sd) — ``books[j]`` is
    an (n_codes, sd) array — or None for an empty corpus."""
    import numpy as np

    dim_row = candidates.select(F.size(F.col(vec_col)).alias("d")).first()
    if dim_row is None:
        return None
    dim = dim_row["d"]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sd = dim // m
    seed_rows = (
        candidates.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("i").cast("string")), F.col("i"))
        .limit(max(n_codes * 32, 512))
        .collect()
    )
    sample = np.array([list(r["v"]) for r in seed_rows], dtype=np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    n_codes = min(n_codes, len(sample))  # clamp: fewer vectors than codes
    books = []  # books[j] : (n_codes, sd)
    for j in range(m):
        sub = sample[:, j * sd : (j + 1) * sd]
        cents = sub[:n_codes].copy()
        for _ in range(lloyd_iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents)
    return books, sd


def pq_book_df(spark, books) -> DataFrame:
    """Codebooks as BROADCAST DATA — a one-row m × n_codes × sd tensor
    crossJoined onto each side, not F.lit plan literals: plan size
    stays O(1) in m · n_codes · sd (see ivf_topk's cent_df note)."""
    return spark.createDataFrame(
        [([[[float(x) for x in c] for c in b] for b in books],)],
        "__bmat: array<array<array<double>>>",
    )


def _pq_l2(a: F.Column, cent: F.Column) -> F.Column:
    diff = F.zip_with(
        a, cent, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
    )
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)


def pq_encode_codes(vec: F.Column, sd: int) -> F.Column:
    """array<int> of m nearest-centroid codes against the in-scope
    ``__bmat`` tensor (argmin via array_min over (dist, code) structs —
    deterministic tiebreak on code). ``vec`` should be unit-normalized
    by the caller (materialize the norm as a column FIRST — expressions
    inside higher-order lambdas are re-evaluated per element)."""
    return F.transform(
        F.col("__bmat"),
        lambda book, j: F.array_min(
            F.transform(
                book,
                lambda cent, c: F.struct(
                    _pq_l2(F.slice(vec, j * sd + 1, sd), cent).alias("d"),
                    c.alias("c"),
                ),
            )
        )["c"],
    )


def pq_decode_cv(codes: F.Column) -> F.Column:
    """Reconstruct the (approximate, unit-ish) vector from PQ codes by
    concatenating the coded centroids of the in-scope ``__bmat`` —
    a pure projection (the two-arg transform's second lambda parameter
    IS the 0-based subspace index)."""
    return F.flatten(
        F.transform(
            codes,
            lambda c, j: F.element_at(
                F.element_at(F.col("__bmat"), j + F.lit(1)), c + F.lit(1)
            ),
        )
    )


def pq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    m: int = 16,
    n_codes: int = 16,
    lloyd_iters: int = 2,
    refine_factor: int = 8,
) -> DataFrame:
    """Approximate top-k via product quantization with exact re-ranking.

    Train: per-subspace codebooks (``m`` subspaces × ``n_codes``
    centroids) on a bounded, deterministic driver-side sample (same
    policy as ``ivf_topk``). Encode: each candidate subvector maps to
    its nearest centroid with ``array_min`` over literal centroid
    arrays — a pure JVM projection, one pass, no shuffle. Score (ADC):
    a (query_id, subspace, code, partial-dot) lookup table of
    ``|Q|·m·n_codes`` rows — built declaratively and broadcast — joins
    the posexploded candidate codes; one hash-agg sums partials into
    approximate dot products. Re-rank: the ADC top ``k·refine_factor``
    shortlist joins back to the full vectors for exact cosine, so the
    returned scores are exact and recall is governed by shortlist
    coverage (tests gate recall@k vs ``cosine_topk``).

    At 100 TB: the corpus carries only ``m`` bytes of codes per vector
    through the scoring join (vs 4·dim for raw floats); the lookup
    table broadcasts; the only wide-row work is the final exact re-rank
    over ~|Q|·k·refine_factor candidates. Returns
    (query_id, cand_id, cosine, rank).
    """
    trained = train_pq_books(candidates, id_col, vec_col, m, n_codes, lloyd_iters)
    if trained is None:
        return candidates.sparkSession.createDataFrame(
            [], "query_id long, cand_id long, cosine double, rank int"
        )
    books, sd = trained
    n_codes = len(books[0])
    book_df = pq_book_df(candidates.sparkSession, books)

    def _encode(vec: F.Column) -> F.Column:
        return pq_encode_codes(vec, sd)

    # Norm materialized as a column BEFORE the lambda (expressions inside
    # higher-order lambdas are re-evaluated per element — no CSE).
    cand = (
        candidates.select(
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).alias("cv"),
            F.greatest(_norm(F.col(vec_col)), F.lit(1e-12)).alias("cn"),
        )
        .crossJoin(F.broadcast(book_df))
        .select(
            "cand_id",
            "cv",
            _encode(F.transform(F.col("cv"), lambda x: x.cast("double") / F.col("cn"))).alias("codes"),
        )
    )
    code_rows = cand.select("cand_id", F.posexplode("codes").alias("sub", "code"))

    # ADC lookup table: partial dot of each query subvector with every
    # centroid — |Q|·m·n_codes rows, built declaratively (posexplode of
    # the broadcast codebook tensor), broadcast into the code join.
    lut = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(book_df))
        .select("query_id", "qv", F.posexplode("__bmat").alias("sub", "book"))
        .select("query_id", "qv", "sub", F.posexplode("book").alias("code", "cent"))
        .select(
            "query_id",
            "sub",
            "code",
            _dot(F.slice(F.col("qv"), F.col("sub") * sd + 1, sd), F.col("cent")).alias("partial"),
        )
    )
    adc = (
        code_rows.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("query_id", "cand_id")
        .agg(F.sum("partial").alias("adot"))
        .filter(F.col("cand_id") != F.col("query_id"))
    )
    short_w = W.partitionBy("query_id").orderBy(F.desc("adot"), F.asc("cand_id"))
    shortlist = adc.withColumn("srank", F.row_number().over(short_w)).filter(
        F.col("srank") <= k * refine_factor
    )

    # Exact re-rank of the shortlist only.
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), _norm(F.col(vec_col)).alias("qnorm")
    )
    rescored = (
        shortlist.select("query_id", "cand_id")
        .join(cand.select("cand_id", "cv"), "cand_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * _norm(F.col("cv"))), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


# ----------------------------------------------------------------------
def label_outliers(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str = "label",
    sigma: float = 2.0,
    round_dp: int = 6,
) -> DataFrame:
    """X3 — per-class embedding outliers: distance of each vector from
    its label's centroid, flagged when beyond ``mean + sigma·stddev``
    of the label's own distance distribution. The data-pruning /
    label-noise-detection primitive (mislabeled or off-distribution
    examples sit far from their class prototype).

    Plan: posexplode to (label, pos) rows → centroid hash-agg (the
    ``label_centroids`` layout — no wide array aggregation state) →
    join back on (label, pos) — same key layout, one exchange reused —
    → per-vector distance hash-agg → per-label moment agg broadcast
    back. Everything keys on label/pos/vector id; no pairwise anything,
    so the shape survives arbitrary corpus size.

    Returns (id_col, label_col, dist, is_outlier) with ``dist`` rounded
    for cross-engine determinism; the threshold compare uses rounded
    values on both sides so borderline floats can't flip the flag
    between engines.
    """
    ex = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("lbl"),
        F.posexplode(vec_col).alias("pos", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    cent = ex.groupBy("lbl", "pos").agg(F.avg("x").alias("c"))
    dist = (
        ex.join(cent, ["lbl", "pos"])
        .groupBy("vid", "lbl")
        .agg(F.round(F.sqrt(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))), round_dp).alias("dist"))
    )
    stats = dist.groupBy("lbl").agg(
        F.round(F.avg("dist") + sigma * F.stddev("dist"), round_dp).alias("cutoff")
    )
    return (
        dist.join(F.broadcast(stats), "lbl")
        .select(
            F.col("vid").alias(id_col),
            F.col("lbl").alias(label_col),
            "dist",
            (F.col("dist") > F.col("cutoff")).alias("is_outlier"),
        )
    )


def cosine_topk_arrow(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Arrow-vectorized twin of `cosine_topk` — same exact semantics,
    different execution: the (small, broadcast-contract) query matrix
    is collected once into a numpy ``(Q, d)`` block; each candidate
    Arrow batch is scored against ALL queries with ONE BLAS GEMM
    (``(B, d) @ (d, Q)``) inside `mapInPandas`, emitting only the
    batch-local top-k per query; a final windowed top-k reduces the
    bounded union (batches x Q x k rows) globally.

    This is the §2.9 escape hatch used right: the JVM higher-order
    fold in `cosine_topk` is O(d) expression-tree work PER PAIR, while
    the GEMM amortizes across the batch at memory bandwidth — at large
    d the Arrow boundary pays for itself. Python state per batch is
    O(Q·k + B·d); nothing is ever collected to the driver except the
    query block (same bound as the broadcast in the exact twin).
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(id_col, vec_col).collect()
    q_ids = [r[0] for r in qrows]
    qm = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    id_type = candidates.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {id_type}, cand_id {id_type}, cosine double"

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            cm = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm @ qm.T  # (B, Q)
            kk = min(k + 1, sims.shape[0])  # +1 absorbs a self-match
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
            out_q, out_c, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                for i in top[:, j]:
                    if ids[i] != qid:
                        out_q.append(qid)
                        out_c.append(ids[i])
                        out_s.append(sims[i, j])
            yield pd.DataFrame({"query_id": out_q, "cand_id": out_c, "cosine": out_s})

    scored = (
        candidates.select(id_col, vec_col)
        .mapInPandas(score, schema=out_schema)
        .withColumn("cosine", F.round(F.col("cosine"), round_dp))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def truncate_embeddings(
    df: DataFrame,
    vec_col: str,
    d: int,
    renormalize: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """X3 — Matryoshka-style embedding truncation (Kusupati et al.
    2022, arXiv:2205.13147, public): keep the first ``d`` dimensions
    and (by default) re-normalize — MRL-trained models pack the most
    information into the leading dimensions, so a prefix slice is the
    cheap storage/bandwidth knob (d/dim of the bytes for most of the
    recall; re-normalization keeps cosine = dot). Pure projection —
    `slice` + one fold for the norm; no shuffle at any scale.

    Replaces ``vec_col`` (or writes ``out_col``) with
    array<double>; zero vectors stay zero instead of dividing by 0.
    """
    sliced = F.transform(
        F.slice(F.col(vec_col), 1, d), lambda x: x.cast("double")
    )
    if renormalize:
        nrm = _norm(sliced)
        sliced = F.when(nrm > 0, F.transform(sliced, lambda x: x / nrm)).otherwise(sliced)
    return df.withColumn(out_col or vec_col, sliced)


def matryoshka_report(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dims: tuple[int, ...] = (8, 16, 32),
    round_dp: int = 6,
) -> DataFrame:
    """X3 — truncation-quality report: for each candidate prefix
    dimension, how much vector mass survives — the number a platform
    consults BEFORE committing a corpus-wide `truncate_embeddings`
    rewrite. Per dim d': retention(v) = ||v[:d']|| / ||v|| (the cosine
    of a vector with its own zero-padded truncation — exactly the
    self-similarity the truncation preserves). One tagged projection +
    one hash aggregate over |dims| rows per vector; the shuffle
    carries (d', retention) pairs only.

    Returns one row per d' (ascending): (d_prime, n_vectors,
    avg_retention, min_retention, frac_ge_090).
    """
    full = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    fnorm = _norm(full)
    tagged = F.array(
        *[
            F.struct(
                F.lit(d).alias("d_prime"),
                # a zero vector loses nothing to truncation: retention 1
                F.when(
                    fnorm > 0, _norm(F.slice(full, 1, d)) / fnorm
                ).otherwise(F.lit(1.0)).alias("r"),
            )
            for d in sorted(dims)
        ]
    )
    ex = df.select(F.explode(tagged).alias("t")).select("t.d_prime", "t.r")
    return (
        ex.groupBy("d_prime")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("r"), round_dp).alias("avg_retention"),
            F.round(F.min("r"), round_dp).alias("min_retention"),
            F.round(
                F.avg((F.col("r") >= 0.90).cast("int")), round_dp
            ).alias("frac_ge_090"),
        )
        .orderBy("d_prime")
    )


def train_cells_list(
    vectors: DataFrame, id_col: str, vec_col: str, n_cells: int, lloyd_iters: int = 8
) -> list[list[float]] | None:
    """Bounded, deterministic IVF cell training (the `ivf_topk`
    budget): md5-ordered unbiased sample, seeded k-means++ + Lloyd.
    Returns the centroid list (≤ n_cells unit vectors) — the
    persistable form the ANN index stores as a table — or None on an
    empty corpus."""
    import numpy as np

    seed_rows = (
        vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("i").cast("string")), F.col("i"))
        .limit(max(n_cells * 64, 512))
        .collect()
    )
    if not seed_rows:
        return None
    sample = np.array([list(r["v"]) for r in seed_rows], dtype=np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    n_cells = min(n_cells, len(sample))
    cents = _train_centroids(sample, n_cells, lloyd_iters)
    return [[float(x) for x in c] for c in cents]


def _cmat_frame(spark, cents: list[list[float]]) -> DataFrame:
    """One-row broadcast centroid-matrix frame (the ivf_topk plan-size
    discipline: centroids travel as DATA, never as plan literals)."""
    return spark.createDataFrame([(cents,)], "__cmat: array<array<double>>")


def _fit_cells(vectors: DataFrame, id_col: str, vec_col: str, n_cells: int, lloyd_iters: int):
    """`train_cells_list` + the one-row broadcast matrix frame.
    Returns (cent_df, n_cells), or (None, 0) on an empty corpus."""
    cents = train_cells_list(vectors, id_col, vec_col, n_cells, lloyd_iters)
    if cents is None:
        return None, 0
    return _cmat_frame(vectors.sparkSession, cents), len(cents)


def _nearest_cells_col(vec: F.Column, n: int) -> F.Column:
    """Array of the n cell-ids with highest dot product to ``vec``
    against the broadcast ``__cmat`` (unit centroids ⇒ dot ranks
    cosine). Codegen projection — no shuffle, no python."""
    scored = F.transform(
        F.col("__cmat"),
        lambda cv, i: F.struct(_dot(vec, cv).alias("s"), i.alias("c")),
    )
    return F.slice(F.reverse(F.array_sort(scored)), 1, n).getField("c")


def assign_cells(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    cent_df: DataFrame,
    n_assign: int,
    out_id: str = "cand_id",
    out_vec: str = "cv",
) -> DataFrame:
    """(cell, out_id, out_vec) postings: each vector indexed under its
    ``n_assign`` nearest cells via the broadcast-matrix projection —
    the persistable assignment half of the IVF index."""
    return (
        vectors.select(F.col(id_col).alias(out_id), F.col(vec_col).alias(out_vec))
        .crossJoin(F.broadcast(cent_df))
        .withColumn("cell", F.explode(_nearest_cells_col(F.col(out_vec), n_assign)))
        .drop("__cmat")
    )


def knn_join(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 8,
    n_assign: int = 1,
    round_dp: int = 6,
    exclude_self: bool = True,
) -> DataFrame:
    """Distributed approximate kNN JOIN — top-k cosine neighbors in
    ``candidates`` for EVERY row of ``queries``, with BOTH sides too
    large to broadcast (the regime `cosine_topk`/`ivf_topk` don't
    cover: their query side is a broadcast by contract).

    Physical plan, scale-first: train IVF cells once on a bounded
    candidate sample (driver budget identical to `ivf_topk`); assign
    candidates to their ``n_assign`` nearest cells and queries to
    ``n_probe`` cells as broadcast-matrix codegen projections; then a
    **shuffle equi-join on cell id via cogrouped `applyInPandas`** —
    each cell's (Q_cell, d) × (d, C_cell) similarity block is ONE BLAS
    GEMM, emitting only k rows per (query, cell). The global reduce
    sees ≤ n_probe·k candidates per query. Nothing crosses the Arrow
    boundary except cell-local blocks; no side is ever collected or
    broadcast. Skew lever = n_cells (cells ≈ |C| / desired block rows).

    Determinism: rounded cosine + candidate-id tiebreak at BOTH the
    cell-local and global top-k, so results are partition- and
    engine-stable. Returns (query_id, cand_id, cosine, rank).
    """
    cent_df, n_cells = _fit_cells(candidates, id_col, vec_col, n_cells, lloyd_iters)
    id_type = queries.schema[id_col].dataType.simpleString()
    if cent_df is None:
        return queries.sparkSession.createDataFrame(
            [], f"query_id {id_type}, cand_id {id_type}, cosine double, rank int"
        )
    n_probe = min(n_probe, n_cells)
    n_assign = min(n_assign, n_cells)

    c = assign_cells(candidates, id_col, vec_col, cent_df, n_assign)
    q = assign_cells(
        queries, id_col, vec_col, cent_df, n_probe, out_id="query_id", out_vec="qv"
    )
    return cell_cogroup_topk(q, c, k, round_dp, exclude_self, id_type)


def cell_cogroup_topk(
    q: DataFrame,
    c: DataFrame,
    k: int,
    round_dp: int,
    exclude_self: bool,
    id_type: str,
) -> DataFrame:
    """The kNN-join scoring core over pre-assigned cells: cogrouped
    per-cell GEMM emitting ≤ k rows per (query, cell), then the global
    rounded+id-tiebreak reduce. ``q`` is (cell, query_id, qv), ``c``
    is (cell, cand_id, cv) — either freshly assigned (`knn_join`) or
    read motionless from a persisted postings table (`ann_probe`,
    where the bucketed-by-cell layout makes the candidate side's
    clustering requirement exchange-free)."""
    import numpy as np
    import pandas as pd

    out_schema = f"query_id {id_type}, cand_id {id_type}, cosine double"

    def score_cell(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame({"query_id": [], "cand_id": [], "cosine": []})
        # np.stack over the Arrow-decoded array cells — the previous
        # [list(v) for v in ...] round-tripped every element through
        # Python objects before re-vectorizing (guide §4.2: keep batch
        # work in native code); values are the same float64s either way
        qm = np.stack(qpdf["qv"].to_numpy()).astype(np.float64, copy=False)
        qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
        cm = np.stack(cpdf["cv"].to_numpy()).astype(np.float64, copy=False)
        cm /= np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-12)
        # raw doubles out; the JVM applies the canonical F.round after
        # the Arrow boundary (same discipline as cosine_topk_arrow, so
        # HALF_UP vs numpy banker's rounding can never diverge)
        sims = qm @ cm.T  # (Q, C)
        q_ids = qpdf["query_id"].to_numpy()
        c_ids = cpdf["cand_id"].to_numpy()
        # candidate-id order for deterministic ties
        order = np.argsort(c_ids, kind="stable")
        sims = sims[:, order]
        c_ids = c_ids[order]
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        # The cell-local cut sorts on round_dp-ROUNDED scores (the
        # same grid the global top-k window sees), so two candidates
        # that tie after rounding can never be split at the per-cell k
        # boundary by ulp-level raw differences — the id tiebreak
        # applies at BOTH levels. Columns ascend with cand_id, so ONE
        # stable argsort on -rounded across the whole matrix IS the
        # (rounded desc, id asc) order the old per-row
        # lexsort((position, -rounded)) computed — vectorized over all
        # rows instead of a Python loop per query. (numpy rounds
        # half-to-even vs the JVM's HALF_UP — divergence needs a
        # cosine exactly on the half-grid, measure-zero for float dot
        # products.)
        rounded = np.round(sims, round_dp)
        top = np.argsort(-rounded, axis=1, kind="stable")[:, :kk]
        out_q, out_c, out_s = [], [], []
        for i, qid in enumerate(q_ids):
            row = sims[i]
            taken = 0
            for j in top[i]:
                if exclude_self and c_ids[j] == qid:
                    continue
                out_q.append(qid)
                out_c.append(c_ids[j])
                out_s.append(row[j])
                taken += 1
                if taken >= k:
                    break
        return pd.DataFrame({"query_id": out_q, "cand_id": out_c, "cosine": out_s})

    # One exchange for BOTH reduces (round 14, guide §2.4): hash-
    # partitioning on query_id satisfies the (query_id, cand_id)
    # clustering the dedup aggregate needs AND the window's
    # partitionBy(query_id) — the explicit repartition lets Catalyst
    # run dropDuplicates and the top-k window off a single shuffle of
    # the ≤ n_probe·k-per-query candidate rows instead of two.
    per_cell = (
        q.groupBy("cell")
        .cogroup(c.groupBy("cell"))
        .applyInPandas(lambda qq, cc: score_cell(qq, cc), schema=out_schema)
        .withColumn("cosine", F.round(F.col("cosine"), round_dp))
        .repartition("query_id")
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        per_cell.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def ann_probe(
    postings: DataFrame,
    cents: list[list[float]],
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_probe: int = 4,
    round_dp: int = 6,
    exclude_self: bool = True,
) -> DataFrame:
    """X3 — probe a PERSISTED IVF index (round 9): the query half of
    `knn_join` against a stored postings table instead of a freshly
    assigned corpus. ``postings`` is (cell, cand_id, cv) — built once
    by `assign_cells` and written bucketed by ``cell``
    (`engine.build_ann_index`), so the cogroup's clustering
    requirement on the candidate side is satisfied by the bucket
    layout and the index side moves NOTHING: only the (tiny) probe
    batch is assigned, exploded to ``n_probe`` cells, and shuffled.
    Exhaustive probing (``n_probe >= n_cells``) returns the exact
    rounded-cosine top-k — the SQL-stateable form the registry
    certifies; partial probing trades recall for probe cost under the
    same determinism contract (rounded + id tiebreak at both cuts).
    """
    spark = queries.sparkSession
    id_type = queries.schema[id_col].dataType.simpleString()
    n_probe = min(n_probe, len(cents))
    q = assign_cells(
        queries,
        id_col,
        vec_col,
        _cmat_frame(spark, cents),
        n_probe,
        out_id="query_id",
        out_vec="qv",
    )
    c = postings.select("cell", "cand_id", "cv")
    return cell_cogroup_topk(q, c, k, round_dp, exclude_self, id_type)


def mmr_rerank(
    pairs: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    lambda_: float = 0.7,
    query_col: str = "query_id",
    cand_col: str = "cand_id",
    round_dp: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998,
    public): from each query's retrieved pool (``pairs`` from ANY
    retriever — cosine_topk, knn_join, ivf_topk), greedily pick ``k``
    results maximizing ``λ·rel(q,c) − (1−λ)·max_{s∈S} sim(c,s)`` — the
    standard diversity pass between retrieval and a context window, so
    near-duplicate hits don't crowd out coverage.

    Scale shape: the pool is k'·|queries| rows (the exact_rescore
    broadcast contract), so vector attachment is two broadcast joins
    against the big vector table (never shuffled); the greedy loop
    runs per query over ≤pool² in-memory cosines inside a query-sorted
    `mapInPandas` pass (one Python call per Arrow batch, not per
    query) — the declared §2.9 escape hatch for inherently sequential
    per-group logic (the BPE-apply precedent).

    Deterministic: relevance is re-derived from the vectors (rounded
    JVM-side), greedy ties break on (higher relevance, smaller cand
    id). Returns (query_id, cand_id, relevance, mmr_rank).
    """
    import numpy as np
    import pandas as pd

    qv = vectors.select(F.col(id_col).alias(query_col), F.col(vec_col).alias("__qv"))
    cv = vectors.select(F.col(id_col).alias(cand_col), F.col(vec_col).alias("__cv"))
    # Broadcast the pool-side intermediate (k'·|queries| rows) into the
    # big vector table at BOTH attachment joins — the vector table is
    # always the streamed side (the exact_rescore contract).
    cand_pool = cv.join(F.broadcast(pairs.select(query_col, cand_col)), cand_col)
    pool = qv.join(F.broadcast(cand_pool), query_col)
    id_type = vectors.schema[id_col].dataType.simpleString()
    out_schema = f"{query_col} {id_type}, {cand_col} {id_type}, relevance double, mmr_rank int"
    lam = float(lambda_)

    def greedy_one(pdf: pd.DataFrame) -> pd.DataFrame:
        # candidate-id order pins every downstream tiebreak
        pdf = pdf.sort_values(cand_col, kind="mergesort").reset_index(drop=True)
        cm = np.stack(pdf["__cv"].to_numpy()).astype(np.float64, copy=False)
        cm /= np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-12)
        q = np.asarray(list(pdf["__qv"].iloc[0]), dtype=np.float64)
        q /= max(np.linalg.norm(q), 1e-12)
        rel = np.round(cm @ q, round_dp)
        sim = cm @ cm.T
        n = len(pdf)
        chosen: list[int] = []
        avail = list(range(n))
        while avail and len(chosen) < k:
            if not chosen:
                scores = rel[avail]
            else:
                red = sim[np.ix_(avail, chosen)].max(axis=1)
                scores = lam * rel[avail] - (1.0 - lam) * red
            # argmax with (score desc, rel desc, cand-position asc) ties
            best = min(range(len(avail)), key=lambda i: (-scores[i], -rel[avail[i]], i))
            chosen.append(avail.pop(best))
        out = pdf.iloc[chosen]
        return pd.DataFrame(
            {
                query_col: out[query_col].to_numpy(),
                cand_col: out[cand_col].to_numpy(),
                "relevance": rel[chosen],
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
            }
        )

    # Round 14 (guide §4.1 "fewer, larger batches"): groupBy().
    # applyInPandas made ONE Python call (one Arrow batch, one pandas
    # frame) per query — |queries| × per-call overhead dominated the
    # operator (A/B at sf0.1: 1.60 s → 0.78 s, bit-identical output,
    # 2000 pools of ≤20 rows). Same exchange (hash on query_col) + the
    # same per-group sort the cogroup exec did internally, but ONE
    # mapInPandas call per Arrow batch, iterating the contiguous query
    # groups inside; a group split across batch boundaries is buffered
    # to the next batch (rows per query are contiguous after the sort),
    # and greedy_one receives exactly the rows applyInPandas would have.
    def greedy_batches(it):
        buf = None
        for pdf in it:
            if buf is not None and not buf.empty:
                pdf = pd.concat([buf, pdf], ignore_index=True)
            if pdf.empty:
                continue
            last_q = pdf[query_col].iloc[-1]
            mask = pdf[query_col] == last_q
            buf = pdf[mask]
            head = pdf[~mask]
            if not head.empty:
                yield pd.concat(
                    [greedy_one(g) for _, g in head.groupby(query_col, sort=False)],
                    ignore_index=True,
                )
        if buf is not None and not buf.empty:
            yield pd.concat(
                [greedy_one(g) for _, g in buf.groupby(query_col, sort=False)],
                ignore_index=True,
            )

    batched = pool.repartition(query_col).sortWithinPartitions(query_col, cand_col)
    return batched.mapInPandas(greedy_batches, schema=out_schema)


def standardize_embeddings(
    df: DataFrame,
    vec_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Per-dimension z-score standardization of an embedding column —
    the whitening step run before distance-based indexing when raw
    dimensions carry wildly different scales. Constant dimensions
    (std 0) are centered but not divided.

    Scale shape: per-dim moments via ONE aggregate over the corpus
    (`posexplode` → (dim) hash agg → re-assembled into two one-row
    broadcast arrays), application is a `zip_with` projection — the
    corpus is scanned twice, shuffled never.
    """
    dims = (
        df.select(F.posexplode(F.col(vec_col)).alias("d", "x"))
        .groupBy("d")
        .agg(F.avg("x").alias("m"), F.stddev_pop("x").alias("s"))
    )
    stats = dims.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "m"))), lambda e: e.getField("m")
        ).alias("__means"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "s"))), lambda e: e.getField("s")
        ).alias("__stds"),
    )
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), F.col("__means"), lambda x, m: x - m
    )
    scaled = F.zip_with(
        centered, F.col("__stds"), lambda x, s: F.when(s > 0, x / s).otherwise(x)
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col or vec_col, scaled)
        .drop("__means", "__stds")
    )


def random_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int,
    salt: str = "jl",
    round_dp: int = 6,
) -> DataFrame:
    """X3 — Johnson-Lindenstrauss random projection (Achlioptas 2003,
    database-friendly ±1 variant): y_k = (1/√out_dim) · Σ_d x_d · r(d,k)
    with r(d,k) ∈ {+1, −1} derived from the parity of
    md5("salt:d:k") — the dimensionality-reduction step run before an
    ANN index or a dedup pass when the raw embedding width is the cost
    driver.

    The projection matrix is never stored or shipped as data: its
    dim × out_dim sign entries are md5-regenerated IN-PLAN — but only
    once (a tiny derived frame of `dim` rows, broadcast), not once per
    (vector, d, k) triple; the first new-surfaces bench caught the
    per-triple formulation spending its wall on |corpus|·dim·out_dim
    md5 calls. The corpus-side work is one posexplode + one broadcast
    join + ONE (id)-keyed hash aggregate computing all out_dim
    components as parallel codegen sums (map-side combine; shuffle
    carries one row of out_dim partials per vector), then a stack to
    the long layout. Deterministic (no RNG state); ±1 multiplication
    is exact in any float precision, sums accumulate in double, and
    the output is rounded to ``round_dp`` — engine-replicable, and any
    OTHER engine regenerates entry (d, k) from the same hash.

    Vectors must share one width (the embedding-table contract; the
    sign table is built for the corpus max). Returns the long layout
    (id_col, k, val), k in [0, out_dim).
    """
    k = int(out_dim)
    spark = df.sparkSession
    dim_row = df.agg(F.max(F.size(F.col(vec_col))).alias("d")).first()
    dim = int(dim_row["d"] or 0)
    # dim × k md5 evaluations TOTAL, in-plan, broadcast to every task
    signs = spark.range(dim).select(
        F.col("id").cast("int").alias("d"),
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda kk: F.when(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit(salt), F.col("id"), kk)), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2
                == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        ).alias("s"),
    )
    e = (
        df.select(F.col(id_col), F.posexplode(F.col(vec_col)).alias("d", "x"))
        .join(F.broadcast(signs), "d")
        .select(F.col(id_col), F.col("x").cast("double").alias("x"), "s")
    )
    rt = F.sqrt(F.lit(float(k)))
    agg = e.groupBy(id_col).agg(
        *[
            F.round(F.sum(F.col("x") * F.element_at(F.col("s"), kk + 1)) / rt, round_dp).alias(
                f"__v{kk}"
            )
            for kk in range(k)
        ]
    )
    stack = ", ".join(f"{kk}, __v{kk}" for kk in range(k))
    return agg.select(
        F.col(id_col), F.expr(f"stack({k}, {stack}) AS (k, val)")
    ).select(F.col(id_col), F.col("k").cast("int").alias("k"), "val")


def hard_negatives(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    m: int = 3,
    round_dp: int = 6,
    engine: str = "auto",
) -> DataFrame:
    """X3 — hard-negative mining for contrastive training (DPR,
    Karpukhin et al. 2020 §4.2): for each query, the ``m`` most-similar
    candidates whose label DIFFERS from the query's — the negatives
    that actually move a contrastive loss, as opposed to the easy
    random ones. Returns (query_id, q_label, cand_id, c_label, cosine,
    hn_rank), deterministic via rounded-cosine ordering with the
    candidate id as tiebreak.

    Scale contract: same as `cosine_topk`'s exact lanes — the QUERY
    side broadcasts (bounded query batches, the training-loop shape),
    the candidate corpus streams; the label mismatch filters BEFORE
    the rank so the rank sees only true negatives. ``engine="auto"``
    routes on the PER-CANDIDATE work Q·d: past ~4096 the interpreted
    JVM fold loses to one BLAS GEMM per Arrow batch
    (`_hard_negatives_arrow`, the `cosine_topk_arrow` lane with the
    label mask applied before the batch-local cut; lane-equivalence
    golden-tested — measured 136 s → ~2 s at Q=2000, N=50k, d=64).
    For the both-sides-large regime, compose `knn_join` (cogrouped
    per-cell GEMM) → label filter → per-query rerank instead; this
    exact form is also that composition's verification twin. Null
    labels never match ``!=`` and are therefore excluded from mining —
    label your corpus first.
    """
    if engine not in ("auto", "jvm", "arrow"):
        raise ValueError(f"engine: {engine!r}")
    if engine == "arrow":
        return _hard_negatives_arrow(
            candidates, queries, id_col, vec_col, label_col, m, round_dp
        )
    if engine == "auto":
        probe = queries.select(F.size(F.col(vec_col)).alias("d")).first()
        d = (probe["d"] or 0) if probe is not None else 0
        # one bounded count job decides the lane (the admission gate's
        # broadcast_candidates precedent): the JVM fold costs O(Q·d)
        # interpreted expression work PER CANDIDATE ROW
        if d and queries.limit(4097 // max(d, 1) + 1).count() * d >= 4096:
            return _hard_negatives_arrow(
                candidates, queries, id_col, vec_col, label_col, m, round_dp
            )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col(label_col).alias("q_label"),
    ).withColumn("__qnorm", _norm(F.col("__qv")))
    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("__cv"),
        F.col(label_col).alias("c_label"),
    ).withColumn("__cnorm", _norm(F.col("__cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .filter(F.col("c_label") != F.col("q_label"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qnorm") * F.col("__cnorm")),
                round_dp,
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("hn_rank", F.row_number().over(w))
        .filter(F.col("hn_rank") <= m)
        .select("query_id", "q_label", "cand_id", "c_label", "cosine", "hn_rank")
    )


def _hard_negatives_arrow(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    m: int,
    round_dp: int,
) -> DataFrame:
    """GEMM lane for `hard_negatives` — `cosine_topk_arrow`'s shape
    with the label mask applied BEFORE the batch-local cut: the
    bounded query block (ids, labels, normalized (Q, d) matrix)
    collects once, each candidate Arrow batch scores against all
    queries with one BLAS GEMM, same-label, null-label and self pairs
    are masked to -inf (matching the JVM lane's SQL ``!=`` semantics,
    under which a NULL label on either side never mines — numpy's
    ``!=`` would otherwise treat None/NaN as a mismatch and mine it),
    and the batch emits every candidate whose ROUNDED score ties or
    beats the batch-local m-th rounded score (ties survive the cut —
    the knn_join round-8 discipline — so the global rounded+id window
    sees every contender). The rounded grid drives the CUT only; the
    emitted value is the raw double, with the canonical JVM ``F.round``
    (HALF_UP) applied after the Arrow boundary — the same cross-lane
    rounding discipline as `cosine_topk_arrow`/`knn_join` (numpy
    rounds half-to-even, so a cosine on the half-grid would otherwise
    store a different value between lanes). Python state per batch is
    O(B·d + B·Q sims); the driver holds only the query block.
    """
    import numpy as np
    import pandas as pd

    # NULL-label query rows are dropped at collect: the JVM lane's SQL
    # `c_label != q_label` never evaluates true for them, so they mine
    # nothing there and must mine nothing here either.
    qrows = (
        queries.select(id_col, label_col, vec_col)
        .filter(F.col(label_col).isNotNull())
        .collect()
    )
    id_type = candidates.schema[id_col].dataType.simpleString()
    lab_type = candidates.schema[label_col].dataType.simpleString()
    out_schema = (
        f"query_id {id_type}, q_label {lab_type}, cand_id {id_type}, "
        f"c_label {lab_type}, cosine double"
    )
    if not qrows:
        return candidates.sparkSession.createDataFrame(
            [], out_schema + ", hn_rank int"
        )
    q_ids = np.asarray([r[0] for r in qrows])
    q_labels = np.asarray([r[1] for r in qrows])
    qm = np.asarray([list(r[2]) for r in qrows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            labels = pdf[label_col].to_numpy()
            cm = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            raw = cm @ qm.T  # (B, Q) raw doubles — the emitted value
            sims = np.round(raw, round_dp)  # rounded grid drives the cut
            # notna mask: SQL `!=` is NULL-absorbing, numpy's isn't —
            # a None/NaN candidate label must never mine (ADVICE r8).
            allowed = (
                (labels[:, None] != q_labels[None, :])
                & (ids[:, None] != q_ids[None, :])
                & pd.notna(labels)[:, None]
            )
            sims[~allowed] = -np.inf
            kk = min(m, sims.shape[0])
            thr = -np.partition(-sims, kk - 1, axis=0)[kk - 1, :]  # (Q,)
            keep = allowed & (sims >= thr[None, :]) & np.isfinite(sims)
            ci, qi = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "query_id": q_ids[qi],
                    "q_label": q_labels[qi],
                    "cand_id": ids[ci],
                    "c_label": labels[ci],
                    "cosine": raw[ci, qi],
                }
            )

    scored = (
        candidates.select(id_col, label_col, vec_col)
        .mapInPandas(score, schema=out_schema)
        # canonical HALF_UP rounding happens JVM-side, after the Arrow
        # boundary — identical stored values across lanes and vs DuckDB
        .withColumn("cosine", F.round(F.col("cosine"), round_dp))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("hn_rank", F.row_number().over(w))
        .filter(F.col("hn_rank") <= m)
        .select("query_id", "q_label", "cand_id", "c_label", "cosine", "hn_rank")
    )


def hard_negatives_distributed(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    m: int = 3,
    k_pool: int = 20,
    round_dp: int = 6,
    n_cells: int = 16,
    n_probe: int = 4,
    n_assign: int = 1,
    lloyd_iters: int = 8,
) -> DataFrame:
    """X3 — hard-negative mining for the BOTH-SIDES-LARGE regime
    (VERDICT r8 #6: the escape hatch `hard_negatives` documented in
    prose, now pinned as code): `knn_join` retrieves a per-query pool
    of ``k_pool`` nearest candidates (cogrouped per-cell GEMM — neither
    side collected or broadcast), labels attach to the BOUNDED pool
    (broadcast the pool-side intermediate into each label table, the
    MMR attachment discipline — the big tables are never shuffled OR
    broadcast), the label-mismatch filter drops same-label/null-label
    rows (SQL ``!=``, NULL-absorbing — matching both `hard_negatives`
    lanes), and a per-query window truncates to ``m``.

    POOL-BOUNDED SEMANTICS: a query whose top-``k_pool`` neighbors are
    all same-label yields fewer than ``m`` negatives — the price of
    never streaming the corpus through a per-query rank. Size
    ``k_pool`` ≥ m + the expected same-label crowd. With exhaustive
    probing (``n_probe >= n_cells``) the pool is the EXACT rounded-
    cosine top-``k_pool`` (the knn_join determinism contract), so the
    whole composition is engine-replicable and SQL-stateable — the
    form the `x3_hard_negatives_distributed` oracle certifies; the
    golden proves equivalence to the broadcast-contract lane wherever
    the pool covers the negatives.

    Returns (query_id, q_label, cand_id, c_label, cosine, hn_rank).
    """
    pool = knn_join(
        candidates,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        k=k_pool,
        n_cells=n_cells,
        n_probe=n_probe,
        n_assign=n_assign,
        lloyd_iters=lloyd_iters,
        round_dp=round_dp,
        exclude_self=True,
    )
    c_lab = candidates.select(
        F.col(id_col).alias("cand_id"), F.col(label_col).alias("c_label")
    )
    q_lab = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("q_label")
    )
    att = c_lab.join(F.broadcast(pool), "cand_id")
    att = q_lab.join(F.broadcast(att), "query_id")
    mined = att.filter(F.col("c_label") != F.col("q_label"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        mined.withColumn("hn_rank", F.row_number().over(w))
        .filter(F.col("hn_rank") <= m)
        .select("query_id", "q_label", "cand_id", "c_label", "cosine", "hn_rank")
    )


def kmeans_refine(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """X3 — DISTRIBUTED Lloyd refinement (k-means over the full
    corpus): the scale-out counterpart of `_train_centroids`, which
    deliberately trains on a bounded md5 sample (the IVF/SemDeDup
    budget). A 100 TB curation pipeline does both — sample-train the
    seeds, then refine on ALL vectors so the final cells reflect the
    corpus, not the sample (Abbas 2023 runs full k-means before its
    within-cluster dedup). This operator is the refinement half, built
    so every stage is a standard shuffle: no stage ever holds more
    than (k x d) centroid state or a corpus-wide (cell, pos) hash agg.

    Per iteration: (1) ASSIGN — centroids travel as the one-row
    broadcast matrix frame (`_cmat_frame`, the ivf_topk plan-size
    discipline); each vector's squared-L2 distances to the k cells
    compute in a codegen-side HOF projection, argmin via struct-
    ordered `array_min` on the ROUND(round_dp) grid (distance ties
    break to the lowest cell id in both engines — the knn rounding
    discipline). No shuffle. (2) UPDATE — posexplode to (cell, pos, x)
    feeding one hash aggregate (map-side combine; the shuffle carries
    k x d partial means per map task, not vectors); the k x d result is
    collected (bounded by construction) and rebroadcast. Cells that
    lose every member keep their previous centroid (the standard empty-
    cell rule, stated identically by the oracle's left join).

    Seeds are the k vectors with the lowest (md5(id), id) order —
    deterministic, unbiased, SQL-stateable. Returns the long-format
    report (cell, pos, c, n_members, cell_inertia): final centroids
    with membership counts and per-cell inertia, where labels are the
    LAST assignment and centers the means those labels produced
    (sklearn's convention after a final update step).
    """
    spark = vectors.sparkSession
    v = vectors.select(
        F.col(id_col).alias("__vid"), F.col(vec_col).cast("array<double>").alias("__v")
    )
    seeds = (
        v.orderBy(F.md5(F.col("__vid").cast("string")), F.col("__vid"))
        .limit(k)
        .collect()
    )
    if not seeds:
        return spark.createDataFrame(
            [], "cell int, pos int, c double, n_members bigint, cell_inertia double"
        )
    cents = [list(r["__v"]) for r in seeds]
    k = len(cents)
    d = len(cents[0])

    def _assigned(cdf: DataFrame) -> DataFrame:
        scored = F.transform(
            F.col("__cmat"),
            lambda cv, i: F.struct(
                F.round(
                    F.aggregate(
                        F.zip_with(F.col("__v"), cv, lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0),
                        lambda acc, s: acc + s,
                    ),
                    round_dp,
                ).alias("d"),
                i.cast("int").alias("cell"),
            ),
        )
        return v.crossJoin(F.broadcast(cdf)).select(
            "__vid", "__v", F.array_min(scored).getField("cell").alias("cell")
        )

    assigned = None
    for _ in range(iters):
        # pin the assignment: both the update agg and (on the last
        # round) the report branches read it — without the pin each
        # branch re-runs the distance projection over the corpus
        assigned = _assigned(_cmat_frame(spark, cents)).localCheckpoint()
        means = (
            assigned.select("cell", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("c"))
        )
        got: dict[int, list[float]] = {}
        for r in means.collect():
            got.setdefault(r["cell"], [0.0] * d)[r["pos"]] = float(r["c"])
        cents = [got.get(i, cents[i]) for i in range(k)]

    cdf = _cmat_frame(spark, cents)
    memb = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    inert = (
        assigned.crossJoin(F.broadcast(cdf))
        .select(
            "cell",
            F.aggregate(
                F.zip_with(
                    F.col("__v"),
                    F.element_at(F.col("__cmat"), F.col("cell") + 1),
                    lambda x, c: (x - c) * (x - c),
                ),
                F.lit(0.0),
                lambda acc, s: acc + s,
            ).alias("d2"),
        )
        .groupBy("cell")
        .agg(F.round(F.sum("d2"), round_dp).alias("cell_inertia"))
    )
    cent_rows = spark.createDataFrame(
        [(i, p, c) for i, vec in enumerate(cents) for p, c in enumerate(vec)],
        "cell int, pos int, c double",
    ).select("cell", "pos", F.round("c", round_dp).alias("c"))
    # k-row report frames: broadcast so the k x d centroid rows never
    # shuffle for a join against k values
    return (
        cent_rows.join(F.broadcast(memb), "cell")
        .join(F.broadcast(inert), "cell")
        .select("cell", "pos", "c", "n_members", "cell_inertia")
    )


def bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    margin_threshold: float = 1.05,
    n_cells: int = 8,
    n_probe: int | None = None,
    lloyd_iters: int = 8,
    round_dp: int = 6,
) -> DataFrame:
    """X3 — margin-based bitext mining (Artetxe & Schwenk 2019,
    arXiv:1811.01136 §3.2 'ratio' margin; the CCMatrix/LASER parallel-
    corpus mining recipe, Schwenk 2021): for every source embedding,
    the best target candidate scored by cosine NORMALIZED by the
    average of both sides' k-NN neighborhoods — raw cosine thresholds
    fail under hubness (some vectors are near everything), the margin
    cancels it. The accepted pairs are the mined bitext a translation
    pipeline trains on.

    Scale shape: two `knn_join`s (cogrouped per-cell GEMM, neither
    side collected or broadcast — both "languages" are corpus-sized),
    each emitting the |side|·k top-pair frame, both
    localCheckpoint-pinned because every downstream branch (both
    neighborhood averages, both argmax passes) reads them; the
    neighborhood averages are key-grouped hash aggs on those compact
    frames, margins a broadcast-free equi-join attach, and the
    per-source / per-target argmaxes are windows over ≤ k rows per
    key.

    ``n_probe`` is the scale lever (the `ivf_topk` discipline).
    Default ``None`` probes every cell — EXACT top-k pools, so the
    whole composition is SQL-stateable (the registry oracle's form).
    At 100 TB exhaustive probing is distributed brute force
    (O(|src|·|tgt|) GEMM work); set ``n_probe << n_cells`` so each
    query scores only its nearest cells — per-side work drops to
    ~(n_probe/n_cells)·|src|·|tgt| at the usual IVF recall trade,
    gated in tests/test_recall.py against the exhaustive twin.

    Returns one row per SOURCE vector: (src_id, tgt_id, cosine,
    margin, accepted — margin > threshold, mutual — the target's own
    best-margin source is this source; mutual pairs are the
    high-precision subset the paper mines with).
    """
    probe = n_cells if n_probe is None else min(int(n_probe), n_cells)
    fwd = knn_join(
        tgt, src, id_col=id_col, vec_col=vec_col, k=k,
        n_cells=n_cells, n_probe=probe, lloyd_iters=lloyd_iters,
        round_dp=round_dp, exclude_self=False,
    ).localCheckpoint(eager=True)
    bwd = knn_join(
        src, tgt, id_col=id_col, vec_col=vec_col, k=k,
        n_cells=n_cells, n_probe=probe, lloyd_iters=lloyd_iters,
        round_dp=round_dp, exclude_self=False,
    ).localCheckpoint(eager=True)
    # neighborhood averages stay RAW: an average of rounded cosines can
    # land exactly on the rounding half-grid (observed: 0.2573155 at
    # 6dp), where cross-engine rounding modes flip the stored value;
    # dividing by the raw average leaves only summation-order ulps,
    # which the final margin rounding absorbs.
    fa = fwd.groupBy("query_id").agg(F.avg("cosine").alias("fa"))
    ba = bwd.groupBy("query_id").agg(F.avg("cosine").alias("ba"))

    def _margins(pairs: DataFrame, q_avg, c_avg, q_out, c_out) -> DataFrame:
        return (
            pairs.join(q_avg, "query_id")
            .join(
                c_avg.withColumnRenamed("query_id", "cand_id"),
                "cand_id",
            )
            .select(
                F.col("query_id").alias(q_out),
                F.col("cand_id").alias(c_out),
                "cosine",
                F.round(
                    F.col("cosine")
                    / ((F.col(fa.columns[1]) + F.col(ba.columns[1])) / 2),
                    round_dp,
                ).alias("margin"),
            )
        )

    fm = _margins(fwd, fa, ba, "src_id", "tgt_id")
    bm = _margins(bwd, ba, fa, "tgt_id", "src_id")
    wf = W.partitionBy("src_id").orderBy(F.desc("margin"), F.asc("tgt_id"))
    best = (
        fm.withColumn("rk", F.row_number().over(wf)).filter(F.col("rk") == 1).drop("rk")
    )
    wb = W.partitionBy("tgt_id").orderBy(F.desc("margin"), F.asc("src_id"))
    bbest = (
        bm.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select(F.col("tgt_id").alias("__bt"), F.col("src_id").alias("__bs"))
    )
    return best.join(
        bbest, best["tgt_id"] == bbest["__bt"], "left"
    ).select(
        "src_id",
        "tgt_id",
        "cosine",
        "margin",
        (F.col("margin") > F.lit(float(margin_threshold))).alias("accepted"),
        F.coalesce(F.col("__bs") == F.col("src_id"), F.lit(False)).alias("mutual"),
    )


# ----------------------------------------------------------------------
# Scalar (int8-grid) embedding quantization (round 11) — the standard
# 4× memory/IO lever for vector search at scale (FAISS SQ8, public):
# per-vector affine map onto a 0..255 integer grid. PQ (above) gets
# 32×+ compression by codebook lookup; SQ8 is the cheap, codebook-free
# point on the curve whose dequantized cosine stays within ~1e-2 of
# the float ranking — the usual first step before IVF postings are
# materialized at 100 TB.
def scalar_quantize(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    levels: int = 255,
) -> DataFrame:
    """(id, zero, scale, qvec): per-vector affine quantization
    q = round((v − min) / scale) with scale = (max − min)/levels
    (scale 1.0 for constant vectors — every q is then 0 and dequant
    returns the constant exactly). Pure projection — no shuffle, no
    state; round() half-up on the non-negative grid matches ANSI
    round, so an oracle re-derives every cell. Max reconstruction
    error is scale/2 by construction (golden-tested)."""
    v = F.col(vec_col)
    mn, mx = F.array_min(v), F.array_max(v)
    scale = F.when(mx > mn, (mx - mn) / F.lit(float(levels))).otherwise(F.lit(1.0))
    return df.select(
        F.col(id_col),
        mn.alias("zero"),
        scale.alias("scale"),
        F.transform(v, lambda x: F.round((x - mn) / scale, 0).cast("int")).alias(
            "qvec"
        ),
    )


def sq_dequantized(quant: DataFrame, id_col: str, out_col: str = "dqvec") -> DataFrame:
    """(id, dqvec): reconstruct doubles v' = zero + q·scale from a
    :func:`scalar_quantize` frame — the projection a quantized scorer
    applies on the fly (storage keeps the int grid)."""
    return quant.select(
        F.col(id_col),
        F.transform(
            F.col("qvec"), lambda q: F.col("zero") + q.cast("double") * F.col("scale")
        ).alias(out_col),
    )
