import pytest

from crfsuite_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crfsuite_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def synth():
    from crfsuite_spark.datagen.transcripts import generate

    return generate(n_convs=30, turns_per_conv=10, hot_factor=0, seed=42)
