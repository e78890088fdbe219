from __future__ import annotations

from pyspark.sql import functions as F

from contextinator_spark.functions.tokenize import (
    token_count_expr,
    token_count_udf,
    tokens_expr,
    tokens_udf,
)
from contextinator_spark.oracle import tokenize

CASES = [
    "def foo(bar): return bar_1 + 2",
    "CamelCase snake_case UPPER x9",
    "",
    "   ",
    "---!!!---",
    "a",
    "\x00\x01binary junk",
    "import numpy as np\nnp.sum([1,2])",
    "unicode café naïve 漢字 mixed_01",
]


def test_expr_udf_oracle_agree(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "id int, content string")
    out = (
        df.withColumn("a", tokens_expr("content"))
        .withColumn("b", tokens_udf(F.col("content")))
        .withColumn("na", token_count_expr("content"))
        .withColumn("nb", token_count_udf(F.col("content")))
        .orderBy("id")
        .collect()
    )
    for row, case in zip(out, CASES):
        expected = tokenize(case)
        assert row["a"] == expected, (case, row["a"], expected)
        assert row["b"] == expected
        assert row["na"] == len(expected)
        assert row["nb"] == len(expected)


def test_expr_udf_agree_on_corpus(spark, corpus):
    mismatch = (
        corpus.withColumn("a", tokens_expr("content"))
        .withColumn("b", tokens_udf(F.col("content")))
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert mismatch == 0
