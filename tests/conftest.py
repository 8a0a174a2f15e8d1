from __future__ import annotations

import pytest

from bilies_go_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bilies-go-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def small_corpus(spark):
    """~2k-turn deterministic transcripts with doc ids (t1 smoke size)."""
    from bilies_go_spark.corpus import assign_doc_ids, transcripts_df

    df = assign_doc_ids(transcripts_df(spark, 300, parallelism=8), num_partitions=8)
    df = df.persist()
    df.count()
    return df
