"""Stage attribution for the x3 cogroup/GEMM family at sf0.1:
- knn_join decomposition: cell training / assignment / cogroup GEMM /
  dedup+topk reduce
- pipeline_retrieve_rerank decomposition: pool pin / mmr pin / report
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _isolate  # noqa: E402
from cbts_datalake_synnex_spark.operators import similarity  # noqa: E402
from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload.base import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def knn_decomp(spark, k=5, n_cells=16, n_probe=6, n_assign=2):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 5 == 0)
    t0 = time.perf_counter()
    cent_df, nc = similarity._fit_cells(emb, "vec_id", "embedding", n_cells, 8)
    t1 = time.perf_counter()
    c = similarity.assign_cells(emb, "vec_id", "embedding", cent_df, n_assign)
    q = similarity.assign_cells(
        queries, "vec_id", "embedding", cent_df, n_probe, out_id="query_id", out_vec="qv"
    )
    c.write.format("noop").mode("overwrite").save()
    q.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    full = similarity.cell_cogroup_topk(q, c, k, 6, True, "bigint")
    full.write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    print(
        f"  knn: train={t1-t0:.2f} assign(2 noops)={t2-t1:.2f} cogroup+reduce={t3-t2:.2f} "
        f"total={t3-t0:.2f}",
        flush=True,
    )
    _isolate(spark)


def rerank_decomp(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 5 == 0)
    t0 = time.perf_counter()
    pool = similarity.knn_join(
        emb, queries, id_col="vec_id", vec_col="embedding",
        k=20, n_cells=16, n_probe=6, n_assign=2,
    ).localCheckpoint()
    t1 = time.perf_counter()
    mmr = similarity.mmr_rerank(
        pool, emb, id_col="vec_id", vec_col="embedding", k=5, lambda_=0.7
    ).localCheckpoint()
    t2 = time.perf_counter()
    rescored = similarity.exact_rescore(
        mmr.select("query_id", "cand_id", "relevance", "mmr_rank"),
        emb, id_col="vec_id", vec_col="embedding",
    )
    rescored.write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    print(
        f"  rerank: pool_pin={t1-t0:.2f} mmr_pin={t2-t1:.2f} rescore={t3-t2:.2f}",
        flush=True,
    )
    _isolate(spark)


def main() -> None:
    spark = get_spark("r14_x3_attr")
    for _ in range(3):
        knn_decomp(spark)
    for _ in range(3):
        rerank_decomp(spark)
    spark.stop()


if __name__ == "__main__":
    main()
