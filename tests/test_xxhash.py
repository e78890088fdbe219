from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from contextinator_spark.functions.xxhash import spark_xxhash64_string, term_partition


def test_matches_spark_xxhash64(spark):
    rng = random.Random(7)
    cases = ["", "a", "def", "import", "x" * 31, "y" * 32, "z" * 100, "漢字テスト", "café"]
    cases += [
        "".join(rng.choices(string.printable, k=rng.randint(0, 200))) for _ in range(200)
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string").withColumn(
        "h", F.xxhash64("s")
    ).withColumn("p", F.pmod(F.xxhash64("s"), F.lit(32)).cast("int"))
    for r in df.collect():
        assert spark_xxhash64_string(r["s"]) == r["h"], repr(r["s"])
        assert term_partition(r["s"], 32) == r["p"]
