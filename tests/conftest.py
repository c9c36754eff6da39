import pytest


@pytest.fixture(scope="session")
def spark():
    from neuscraper_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages():
    from neuscraper_spark.corpus import gen_pages

    return gen_pages(seed=42, n_pages=40)
