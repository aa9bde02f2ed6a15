import pytest


@pytest.fixture(scope="session")
def spark():
    from microdata_rdf_streaming_parser_js_spark.session import get_spark

    s = get_spark(cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir_oracle():
    # the driver's correctness scale
    return "/root/testdata/sf0.01"
