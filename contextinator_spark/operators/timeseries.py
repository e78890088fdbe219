"""Time-bucketed aggregations (ES date_histogram analog).

Pure-Catalyst scan-form operator over any frame with a timestamp column —
no index involved (ES runs date_histogram off doc_values the same way).
One codegen scan + one bucket-sized exchange; buckets are
date_trunc(interval) keys so partial aggregation combines map-side and
the exchange carries one row per (bucket[, group]) per input partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INTERVALS = {"year", "quarter", "month", "week", "day", "hour", "minute"}


def date_histogram(
    df: DataFrame,
    ts_col: str = "ts",
    interval: str = "day",
    value_col: str | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """ES date_histogram (calendar_interval): event counts per
    date_trunc(interval) bucket, optionally sub-grouped by `group_col`
    (the terms sub-aggregation) and carrying sum/avg of `value_col`
    (metric sub-aggregations), floats rounded to 6. min_doc_count=1
    semantics: empty buckets are absent (ES default is 0 WITH
    extended_bounds gap-filling — that variant needs a calendar spine
    join; documented, not the default). Output ordered by
    (bucket[, group])."""
    if interval not in _INTERVALS:
        raise ValueError(
            f"interval must be one of {sorted(_INTERVALS)}, got {interval!r}"
        )
    keys = [F.date_trunc(interval, F.col(ts_col)).alias("bucket")]
    if group_col:
        keys.append(F.col(group_col))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias(f"sum_{value_col}"))
        aggs.append(F.round(F.avg(value_col), 6).alias(f"avg_{value_col}"))
    out = df.groupBy(*keys).agg(*aggs)
    order = ["bucket"] + ([group_col] if group_col else [])
    return out.orderBy(*order)
