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


def test_bytetok_matches_regex_reference():
    """Byte-level kernel (functions/bytetok.py) == regex tokenizer on random
    mixed batches: per-doc token counts AND per-doc term->tf maps."""
    import random
    import re
    import string
    from collections import Counter

    import numpy as np
    import pandas as pd

    from contextinator_spark.config import TOKEN_PATTERN
    from contextinator_spark.functions.bytetok import (
        batch_termfreq,
        batch_token_counts,
    )

    rx = re.compile(TOKEN_PATTERN)
    rng = random.Random(1234)
    alphabet = string.ascii_letters + string.digits + "_ .,;(){}[]#!\n\t" + "é漢İß"
    docs = [
        "".join(rng.choices(alphabet, k=rng.randint(0, 400))) for _ in range(200)
    ] + ["", "   ", "UPPER lower_case 123 __x__", "x" * 500 + " yz", None]
    s = pd.Series(docs, dtype=object)
    ref = [rx.findall(t.lower()) if isinstance(t, str) else [] for t in docs]

    assert np.array_equal(
        batch_token_counts(s), np.array([len(t) for t in ref], dtype=np.int64)
    )
    dl, didx, codes, tfs, uniq = batch_termfreq(s)
    got = [dict() for _ in docs]
    for d, c, t in zip(didx, codes, tfs):
        got[int(d)][uniq[c]] = int(t)
    for i, r in enumerate(ref):
        assert dict(Counter(r)) == got[i], (i, docs[i][:60] if docs[i] else docs[i])


def test_approx_bpe_cost_model():
    """Char-class cost model pinned against cl100k's published ballpark:
    ~3-4 chars/token on source code, ~4-5 on English prose; exact count
    hand-derived from the model's rules on a canonical snippet."""
    from contextinator_spark.functions.bpe_estimate import approx_bpe_len

    snippet = "def foo(bar):\n    return bar + 1"
    # def(1) foo(1) ( (1) bar(1) )(1) :(1) \n+indent(2) return(1) bar(1)
    # +(1) 1(1) — single spaces fold into the following token
    assert approx_bpe_len(snippet) == 12

    code = snippet * 50 + "\nvery_long_identifier_name = compute_the_value(x)\n" * 20
    ratio = len(code) / approx_bpe_len(code)
    assert 2.5 <= ratio <= 4.5, ratio

    prose = "The quick brown fox jumps over the lazy dog near the river bank. " * 20
    ratio_p = len(prose) / approx_bpe_len(prose)
    assert 3.5 <= ratio_p <= 5.5, ratio_p


def test_chunk_split_counts_track_bpe_budget():
    """Split counts on an over-budget fixture match ceil(total/512) within
    ±1 — the budget is now denominated in approximate-BPE tokens (F2), so
    boundaries approximate the reference's 512-tiktoken splits."""
    import math

    from contextinator_spark.operators.chunker import _token_count, chunk_file

    body = "\n".join(
        "    value_%d = compute(alpha, beta_%d) + 17" % (i, i) for i in range(400)
    )
    big = "def big():\n" + body
    nodes = chunk_file(big, "python")
    splits = [n for n in nodes if n["is_split"]]
    total = _token_count(big)
    expect = math.ceil(total / 512)
    assert abs(len(splits) - expect) <= 1, (len(splits), expect)
