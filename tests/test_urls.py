"""URL canonicalization fixtures (text/urls.py) — Spark and the DuckDB
twin must both produce these exact canonical forms."""

import duckdb
import pandas as pd
import pytest

from osm_spark.text import urls

CASES = [
    ("HTTP://Example.COM:80/path/", "http://example.com/path"),
    ("https://Example.com:443/a/b?utm_source=x&q=1#frag",
     "https://example.com/a/b?q=1"),
    ("https://example.com/?utm_campaign=z", "https://example.com"),
    ("http://user:pw@Host.org:8080/p?a=1&utm_medium=m&b=2",
     "http://user:pw@host.org:8080/p?a=1&b=2"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com", "https://example.com"),
    ("https://example.com/a/", "https://example.com/a"),
    ("http://example.com:80", "http://example.com"),
    ("https://example.com/x?utm_a=1&utm_b=2", "https://example.com/x"),
    ("https://a.b/p?utm_source=1&utm_medium=2&x=3&utm_term=4",
     "https://a.b/p?x=3"),
]


def test_spark_canonical(spark):
    df = spark.createDataFrame(pd.DataFrame({"url": [c[0] for c in CASES]}))
    got = [r["c"] for r in df.select(urls.url_canonical("url").alias("c")).collect()]
    assert got == [c[1] for c in CASES]


def test_duckdb_twin_matches():
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"url": [c[0] for c in CASES]}))
    got = con.execute(
        f"SELECT {urls.url_canonical_sql('url')} AS c FROM t"
    ).fetchdf()["c"].tolist()
    assert got == [c[1] for c in CASES]


def test_host_extraction(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"url": ["https://User@Sub.Host.COM:8443/p?q=1"]})
    )
    assert df.select(urls.url_host("url").alias("h")).collect()[0]["h"] == "sub.host.com"
