"""cbts_datalake_synnex_spark — a PySpark-native data-lake analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``jayson-bonelli/cbts-datalake-synnex`` (an AWS serverless Synnex
purchase-order data-lake ETL: Lambda ingest → S3 JSON staging → Glue
Spark → partitioned Parquet + Glue catalog → Athena SQL), rebuilt as a
single idiomatic PySpark application:

* Spark SQL replaces Athena (reference ``src/purchase_orders.py:23-24``).
* Native DataFrame jobs replace Glue DynamicFrames
  (reference ``src/glue/staging_to_curated.py``).
* A path-zoned Parquet lakehouse + the Spark catalog replace the Glue
  Data Catalog (reference ``utils.py:72-83``).

Beyond reference parity the engine ships the LLM-data-pipeline operator
set (deduplication, similarity search, multimodal columns, text
analysis) designed for 100 TB scale: declarative DataFrame plans so
Catalyst handles pushdown/pruning/join-strategy, broadcast for dims,
partial aggregation, Arrow-vectorized Pandas UDFs only where built-ins
cannot express the semantics.
"""

from cbts_datalake_synnex_spark.engine import LakeEngine
from cbts_datalake_synnex_spark.session import get_spark, tune_for_oracle

__all__ = ["LakeEngine", "get_spark", "tune_for_oracle"]

__version__ = "0.1.0"
