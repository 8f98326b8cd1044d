from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from doc_parser_spark.session import get_spark

    spark = get_spark(app_name="doc_parser_spark_tests", master="local[4]",
                      shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def transcripts_pdf():
    from doc_parser_spark.sources.transcripts import generate_transcripts

    return generate_transcripts(n_convs=30, turns_mean=6, seed=42)
