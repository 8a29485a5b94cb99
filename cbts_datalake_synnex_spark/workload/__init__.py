"""The declared query workload — SURVEY §2's operator inventory as
(name → Spark callable, name → DuckDB oracle SQL) pairs.

Importing this package populates ``REGISTRY``; ``__spark_entry__.py``
re-exports it as ``queries()`` / ``oracle_sql()`` for the correctness
driver. Every entry is a *declarative* DataFrame/SQL plan — Catalyst
picks the physical strategy; pandas UDFs appear only in the [EXT]
operators whose semantics built-ins can't express (multimodal decode).
"""

from cbts_datalake_synnex_spark.workload.base import REGISTRY, Query, load_table

# Register on import — order matters only for display.
from cbts_datalake_synnex_spark.workload import relational  # noqa: F401,E402
from cbts_datalake_synnex_spark.workload import extended  # noqa: F401,E402
from cbts_datalake_synnex_spark.workload import llm  # noqa: F401,E402
from cbts_datalake_synnex_spark.workload import udfs  # noqa: F401,E402
from cbts_datalake_synnex_spark.workload import events_analytics  # noqa: F401,E402
from cbts_datalake_synnex_spark.workload import lifecycle  # noqa: F401,E402
from cbts_datalake_synnex_spark.workload import functions_ext  # noqa: F401,E402

__all__ = ["REGISTRY", "Query", "load_table"]
