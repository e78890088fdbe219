"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship BM25 top-k over /root/testdata/sf0.001.
queries()     — one callable per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB-equivalent SQL for each SQL-expressible query.

Implementation lives in contextinator_spark/ (this file is the thin shim).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from contextinator_spark.entry_queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from contextinator_spark.entry_queries import q_bm25_topk

    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
