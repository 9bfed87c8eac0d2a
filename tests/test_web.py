"""URL canonicalization unit pins: every noise dimension collapses,
path case survives, garbage degrades without throwing."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.web import (
    canonicalize_url,
    url_dedup,
    url_domain,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [
        r.c for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()
    ]


def test_canonicalize_collapses_each_noise_dimension(spark):
    variants = [
        "HTTP://WWW.Site.com/a",          # scheme+host case, www.
        "http://site.com:80/a",           # default port
        "http://site.com/a/",             # trailing slash
        "http://site.com/a#section-2",    # fragment
        "http://site.com/a?utm_source=x&utm_medium=y",  # tracking only
        "http://site.com/a",              # already canonical
    ]
    assert set(_canon(spark, variants)) == {"http://site.com/a"}


def test_canonicalize_param_order_and_tracking_mix(spark):
    variants = [
        "https://site.com/p?b=2&a=1",
        "https://site.com/p?a=1&b=2",
        "https://site.com/p?utm_campaign=z&b=2&gclid=G&a=1&fbclid=F",
        "https://site.com/p?b=2&ref=tw&a=1&ref",
    ]
    assert set(_canon(spark, variants)) == {"https://site.com/p?a=1&b=2"}


def test_canonicalize_preserves_meaningful_differences(spark):
    # path CASE is significant (RFC 3986); :8080 is not a default port;
    # https:443 strips but http:443 must NOT; real params survive
    distinct = [
        "https://site.com/Path",
        "https://site.com/path",
        "https://site.com:8080/path",
        "http://site.com:443/path",
        "https://site.com/path?page=2",
    ]
    got = _canon(spark, distinct)
    assert len(set(got)) == 5
    assert got[3] == "http://site.com:443/path"


def test_canonicalize_edge_shapes(spark):
    got = _canon(
        spark,
        [
            "https://Example.COM:443/",   # root slash + port
            "https://example.com",        # bare host
            "  https://example.com/x  ",  # surrounding whitespace
            None,
        ],
    )
    assert got[0] == got[1] == "https://example.com"
    assert got[2] == "https://example.com/x"
    assert got[3] is None


def test_url_domain_and_dedup(spark):
    rows = [
        (1, "HTTP://WWW.A.com/p/?utm_source=x"),
        (2, "http://a.com/p"),
        (3, "http://a.com/q"),
        (4, "https://b.org/p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    doms = {
        r.d
        for r in df.select(
            url_domain(canonicalize_url(F.col("url"))).alias("d")
        ).collect()
    }
    assert doms == {"a.com", "b.org"}
    out = {
        (r.canonical_url, r.keeper_doc_id, r.n_variants, r.n_distinct_raw)
        for r in url_dedup(df, "url", "doc_id").collect()
    }
    assert out == {
        ("http://a.com/p", 1, 2, 2),
        ("http://a.com/q", 3, 1, 1),
        ("https://b.org/p", 4, 1, 1),
    }
