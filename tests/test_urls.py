"""URL canonicalization edge cases (pipeline/urls.py)."""

from pyspark.sql import functions as F

from kineo_spark.pipeline import urls


def _canon(spark, *us):
    df = spark.createDataFrame([(u,) for u in us], "u string")
    out = df.select(
        urls.canonical_url(F.col("u")).alias("c"),
        urls.registrable_domain(urls.url_host(F.col("u"))).alias("d"),
    ).collect()
    return [(r.c, r.d) for r in out]


def test_case_port_fragment_tracking_sort(spark):
    got = _canon(
        spark,
        "HTTPS://Ex.COM:443/A/b/?z=2&utm_source=x&a=1#frag",
        "http://ex.com:8080/p?fbclid=1",
        "https://sub.news.co.uk:80/x",
    )
    assert got[0] == ("https://ex.com/A/b?a=1&z=2", "ex.com")
    # non-default port survives; all params were tracking -> none
    assert got[1] == ("http://ex.com:8080/p", "ex.com")
    # https on port 80 is NOT default; co.uk three-label domain
    assert got[2] == ("https://sub.news.co.uk:80/x", "news.co.uk")


def test_root_path_and_bare_host(spark):
    got = _canon(spark, "http://localhost/", "http://a.b.example.com")
    assert got[0] == ("http://localhost", "localhost")
    assert got[1] == ("http://a.b.example.com", "example.com")


def test_same_resource_same_key(spark):
    """The point of canonicalization: these all collapse to one key."""
    variants = [
        "http://WWW.Shop.com/item/9?a=1&utm_campaign=x",
        "http://www.shop.com:80/item/9/?utm_source=y&a=1",
        "http://www.shop.com/item/9?a=1#reviews",
    ]
    got = {c for c, _ in _canon(spark, *variants)}
    assert got == {"http://www.shop.com/item/9?a=1"}
