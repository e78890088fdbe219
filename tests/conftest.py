from __future__ import annotations

import pytest

from contextinator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("contextinator-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    from contextinator_spark.sources.corpus import synth_corpus

    df = synth_corpus(spark, n_files=200, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def corpus_rows():
    from contextinator_spark.sources.corpus import synth_corpus_rows

    return synth_corpus_rows(n_files=200, seed=42)
