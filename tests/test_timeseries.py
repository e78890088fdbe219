"""date_histogram: bucket arithmetic, sub-group, metric sub-aggs."""

from __future__ import annotations

import datetime as dt

import pytest

from contextinator_spark.operators.timeseries import date_histogram

ROWS = [
    (dt.datetime(2024, 1, 1, 3, 5), "click", 2.0),
    (dt.datetime(2024, 1, 1, 9, 30), "view", 1.0),
    (dt.datetime(2024, 1, 2, 0, 0), "click", 4.0),
    (dt.datetime(2024, 1, 2, 23, 59), "click", 6.0),
    (dt.datetime(2024, 2, 1, 12, 0), "view", 10.0),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(ROWS, "ts timestamp, event_type string, value double")


def test_day_buckets_counts_and_metrics(events):
    rows = date_histogram(events, "ts", "day", value_col="value").collect()
    got = [(r["bucket"], r["n_events"], r["sum_value"], r["avg_value"]) for r in rows]
    assert got == [
        (dt.datetime(2024, 1, 1), 2, 3.0, 1.5),
        (dt.datetime(2024, 1, 2), 2, 10.0, 5.0),
        (dt.datetime(2024, 2, 1), 1, 10.0, 10.0),
    ]


def test_month_buckets_with_group(events):
    rows = date_histogram(events, "ts", "month", group_col="event_type").collect()
    got = [(r["bucket"], r["event_type"], r["n_events"]) for r in rows]
    assert got == [
        (dt.datetime(2024, 1, 1), "click", 3),
        (dt.datetime(2024, 1, 1), "view", 1),
        (dt.datetime(2024, 2, 1), "view", 1),
    ]


def test_bad_interval_rejected(events):
    with pytest.raises(ValueError, match="interval"):
        date_histogram(events, "ts", "fortnight")
