"""Ingest sources beyond the lake itself (SURVEY §2.1 S5/S6, §2.8 T3)."""

from cbts_datalake_synnex_spark.sources.api_source import (
    build_order_status_request,
    fan_out_fetch,
    parse_order_status_response,
)

__all__ = [
    "build_order_status_request",
    "parse_order_status_response",
    "fan_out_fetch",
]
