"""Replicates the driver's correctness gate locally: run each queries()
entry on Spark at sf0.01 and its oracle_sql() on DuckDB over the same
parquet, then compare row count + column names + order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float)):
        return f"{float(v):.9g}"
    return str(v)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _compare(name, sdf, con, sql):
    srows = sdf.collect()
    scols = sdf.columns
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    sset = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])
    dset = _rows_to_set(dcols, drows)
    mism = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mism, f"{name}: first value mismatches: {mism[:5]}"


def test_all_oracle_queries(spark, ddb):
    import __spark_entry__ as E

    qs, sqls = E.queries(), E.oracle_sql()
    assert qs, "no queries registered"
    for name, fn in qs.items():
        if name not in sqls:
            continue
        _compare(name, fn(spark, SF_DIR), ddb, sqls[name])


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["rank", "doc_id", "score"]
