import pytest

from kineo_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kineo-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def rel_store(spark):
    from kineo_spark.store import RelationalQuadStore

    return RelationalQuadStore(spark, SF_DIR)


@pytest.fixture(scope="session")
def fixture_store(spark):
    """The reference's 7-quad unit-test micro-fixture (FIXTURES.md §1;
    Tests/KineoTests/QueryEvaluation.swift:229-246)."""
    from kineo_spark.store import QuadsDataFrameStore

    G1 = "urn:g:default"
    FOAF = "http://xmlns.com/foaf/0.1/"
    DC11 = "http://purl.org/dc/elements/1.1/"
    EX = "http://example.org/"
    rows = [
        (0, EX + "Berlin", FOAF + "name", 2, "Berlin", "string", None, None, G1),
        (0, EX + "Berlin", FOAF + "homepage", 0, "http://www.berlin.de/en/", None, None, None, G1),
        (1, "a", DC11 + "title", 2, "Santa Monica", "string", None, None, G1),
        (1, "n1", FOAF + "name", 2, "a number", "string", None, None, EX + "numbers"),
        (1, "n1", EX + "value", 2, "32.7", "float", None, 32.7, EX + "numbers"),
        (1, "n2", EX + "value", 2, "-118", "integer", None, -118.0, EX + "numbers"),
        (1, "x", EX + "p", 2, "hello", "langString", "en", None, EX + "other"),
    ]
    return QuadsDataFrameStore.from_rows(spark, rows)
