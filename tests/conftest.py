from __future__ import annotations

import pytest

from dane_visual_feature_extraction_worker_spark import EngineConfig, get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        EngineConfig(app_name="engine-tests", master="local[4]", shuffle_partitions=8)
    )
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    """Small seeded transcript table (FIXTURES.md §1): 30 convs incl. 2
    hot ones, cached for the whole test session."""
    from dane_visual_feature_extraction_worker_spark.datagen import gen_transcripts

    t = gen_transcripts(spark, n_convs=30, avg_turns=24, n_hot=2, hot_factor=10)
    t.cache().count()
    return t


@pytest.fixture(scope="session")
def transcripts_pd(transcripts):
    return transcripts.toPandas()
