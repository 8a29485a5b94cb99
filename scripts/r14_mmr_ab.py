"""A/B mmr_rerank: per-group applyInPandas (old) vs batched mapInPandas
(one Python call per Arrow batch, groups buffered across batch splits).
Checks bit-identical output, then times both."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import _isolate  # noqa: E402
from cbts_datalake_synnex_spark.operators import similarity  # noqa: E402
from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload.base import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def mmr_batched(pairs, vectors, id_col, vec_col, k=5, lambda_=0.7,
                query_col="query_id", cand_col="cand_id", round_dp=6):
    qv = vectors.select(F.col(id_col).alias(query_col), F.col(vec_col).alias("__qv"))
    cv = vectors.select(F.col(id_col).alias(cand_col), F.col(vec_col).alias("__cv"))
    cand_pool = cv.join(F.broadcast(pairs.select(query_col, cand_col)), cand_col)
    pool = qv.join(F.broadcast(cand_pool), query_col)
    id_type = vectors.schema[id_col].dataType.simpleString()
    out_schema = f"{query_col} {id_type}, {cand_col} {id_type}, relevance double, mmr_rank int"
    lam = float(lambda_)

    def greedy_one(pdf: pd.DataFrame) -> pd.DataFrame:
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
            best = min(range(len(avail)), key=lambda i: (-scores[i], -rel[avail[i]], i))
            chosen.append(avail.pop(best))
        out = pdf.iloc[chosen]
        return pd.DataFrame({
            query_col: out[query_col].to_numpy(),
            cand_col: out[cand_col].to_numpy(),
            "relevance": rel[chosen],
            "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
        })

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


def main() -> None:
    spark = get_spark("r14_mmr_ab")
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 5 == 0)
    pool = similarity.knn_join(
        emb, queries, id_col="vec_id", vec_col="embedding",
        k=20, n_cells=16, n_probe=6, n_assign=2,
    ).localCheckpoint()

    old = similarity.mmr_rerank(pool, emb, id_col="vec_id", vec_col="embedding", k=5, lambda_=0.7)
    new = mmr_batched(pool, emb, id_col="vec_id", vec_col="embedding", k=5, lambda_=0.7)
    hexpr = F.sum(
        F.xxhash64("query_id", "cand_id", F.col("relevance").cast("string"), "mmr_rank").cast("decimal(38,0)")
    ).alias("h")
    ho = old.agg(hexpr).first()["h"]
    hn = new.agg(hexpr).first()["h"]
    co, cn = old.count(), new.count()
    print(f"hash old={ho} new={hn} equal={ho == hn}; rows {co}/{cn}", flush=True)
    assert ho == hn and co == cn

    for label, df_fn in (
        ("mmr OLD", lambda: similarity.mmr_rerank(pool, emb, id_col="vec_id", vec_col="embedding", k=5, lambda_=0.7)),
        ("mmr NEW", lambda: mmr_batched(pool, emb, id_col="vec_id", vec_col="embedding", k=5, lambda_=0.7)),
    ):
        df_fn().write.format("noop").mode("overwrite").save()
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            df_fn().write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{label}: min={min(ts)} runs={ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
