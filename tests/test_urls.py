"""URL canonicalization unit tests: each cleanup rule pinned on a
hand-written url, plus rule-order interactions (trailing slash before '?',
lead/mid/tail utm_ params) and the domain heuristic."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flow_spark.operators.text import (
    canonicalize_url,
    url_domain,
    url_host,
    url_scheme,
)


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()
    ]


def test_scheme_and_host_lowercased(spark):
    assert _canon(spark, ["HTTP://EXAMPLE.COM/a"]) == ["http://example.com/a"]


def test_www_and_default_ports_stripped(spark):
    got = _canon(
        spark,
        [
            "http://www.example.com:80/a",
            "https://www.example.com:443/a",
            "http://example.com:8080/a",   # non-default port KEPT
            "https://example.com:80/a",    # :80 is NOT https' default: kept
        ],
    )
    assert got == [
        "http://example.com/a",
        "https://example.com/a",
        "http://example.com:8080/a",
        "https://example.com:80/a",
    ]


def test_fragment_and_empty_query_dropped(spark):
    got = _canon(
        spark,
        ["http://e.com/a#sec", "http://e.com/a?#sec", "http://e.com/a?"],
    )
    assert got == ["http://e.com/a"] * 3


def test_utm_params_all_positions(spark):
    got = _canon(
        spark,
        [
            "http://e.com/a?utm_s=1",                # lone
            "http://e.com/a?utm_s=1&id=2",           # leading
            "http://e.com/a?id=2&utm_s=1",           # trailing
            "http://e.com/a?id=2&utm_s=1&utm_c=2",   # two mid/tail
            "http://e.com/a?utm_s=1&utm_c=2",        # only trackers
        ],
    )
    assert got == [
        "http://e.com/a",
        "http://e.com/a?id=2",
        "http://e.com/a?id=2",
        "http://e.com/a?id=2",
        "http://e.com/a",
    ]


def test_trailing_slash_rules(spark):
    got = _canon(
        spark,
        [
            "http://e.com/a/",
            "http://e.com/a/?id=1",
            "http://e.com/",          # root collapses to empty path
            "http://e.com/a//",
        ],
    )
    assert got == [
        "http://e.com/a",
        "http://e.com/a?id=1",
        "http://e.com",
        "http://e.com/a",
    ]


def test_domain_last_two_labels(spark):
    df = spark.createDataFrame(
        [
            ("http://a.b.example.com/x",),
            ("http://www.example.org/x",),
            ("http://localhost/x",),  # single label: kept whole
        ],
        "url string",
    )
    got = [r["d"] for r in df.select(url_domain("url").alias("d")).collect()]
    assert got == ["example.com", "example.org", "localhost"]


def test_domain_strips_explicit_port(spark):
    # url_host keeps a non-default port (different ORIGIN) but url_domain
    # must not fragment the same registrable domain by port.
    df = spark.createDataFrame(
        [
            ("http://a.example.com:8080/x",),
            ("http://a.example.com/x",),
            ("http://localhost:9000/x",),  # single label + port
        ],
        "url string",
    )
    hosts = [r["h"] for r in df.select(url_host("url").alias("h")).collect()]
    doms = [r["d"] for r in df.select(url_domain("url").alias("d")).collect()]
    assert hosts == ["a.example.com:8080", "a.example.com", "localhost:9000"]
    assert doms == ["example.com", "example.com", "localhost"]


def test_scheme_and_host_helpers(spark):
    df = spark.createDataFrame([("HtTpS://WWW.Ex.COM:443/p?q#f",)], "url string")
    row = df.select(
        url_scheme("url").alias("s"), url_host("url").alias("h")
    ).collect()[0]
    assert row["s"] == "https"
    assert row["h"] == "ex.com"


def test_canonical_collision_is_the_dedup_key(spark):
    # the whole point: all these crawl variants name the SAME page
    variants = [
        "http://www.Example.com:80/news/today/?utm_source=feed",
        "HTTP://example.COM/news/today#top",
        "http://example.com/news/today?utm_medium=a&utm_c=b",
    ]
    assert len(set(_canon(spark, variants))) == 1


def test_schemeless_input_gets_no_phantom_scheme(spark):
    got = _canon(spark, ["www.Example.com/a/?utm_s=1#f", "example.com"])
    assert got == ["example.com/a", "example.com"]
