"""URL canonicalization (functions/urls.py): normalization rules,
registrable domains, blocklist anti-join plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.functions.urls import (
    filter_blocked_domains,
    normalize_url,
    registrable_domain,
    url_host,
)

CASES = [
    # (raw, normalized, host, domain)
    ("HTTP://WWW.Example.COM:80/Path/To?utm_source=x&id=5#frag",
     "http://www.example.com/Path/To?id=5", "www.example.com",
     "example.com"),
    ("https://News.BBC.co.uk:443/story?id=1&fbclid=z",
     "https://news.bbc.co.uk/story?id=1", "news.bbc.co.uk", "bbc.co.uk"),
    ("http://a.b.com:8080/x",  # non-default port survives
     "http://a.b.com:8080/x", "a.b.com", "b.com"),
    ("https://example.com/CaseSensitive/Path",
     "https://example.com/CaseSensitive/Path", "example.com",
     "example.com"),
    ("http://shop.example.com.au/y?utm_a=1&utm_b=2",  # all params tracked
     "http://shop.example.com.au/y", "shop.example.com.au",
     "example.com.au"),
    ("http://user@Host.Org/p", "http://user@host.org/p", "host.org",
     "host.org"),
    ("http://nodots/p", "http://nodots/p", "nodots", None),
]


def test_normalization_table(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "id int, url string"
    )
    got = {
        r.id: (r.n, r.h, r.d)
        for r in df.select(
            "id",
            normalize_url(F.col("url")).alias("n"),
            url_host(F.col("url")).alias("h"),
            registrable_domain(F.col("url")).alias("d"),
        ).collect()
    }
    for i, (_, n, h, d) in enumerate(CASES):
        assert got[i] == (n, h, d), f"case {i}"


def test_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "id int, url string")
    r = df.select(
        normalize_url(F.col("url")).alias("n"),
        url_host(F.col("url")).alias("h"),
        registrable_domain(F.col("url")).alias("d"),
    ).collect()[0]
    assert (r.n, r.h, r.d) == (None, None, None)


def test_normalize_idempotent(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "id int, url string"
    )
    once = df.select("id", normalize_url(F.col("url")).alias("u"))
    twice = once.select(
        "id", "u", normalize_url(F.col("u")).alias("u2")
    )
    assert twice.filter(F.col("u") != F.col("u2")).count() == 0


def test_blocklist_filter_and_plan(spark):
    df = spark.createDataFrame(
        [
            (1, "http://ok.example.com/a"),
            (2, "https://Evil.Spam-Site.com/b"),
            (3, "http://sub.tracker.io/c"),
        ],
        "id int, url string",
    )
    kept = filter_blocked_domains(df, "url", ["Spam-Site.com", "tracker.io"])
    assert sorted(r.id for r in kept.collect()) == [1]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_extra_suffixes(spark):
    df = spark.createDataFrame(
        [(1, "http://a.b.example.custom.tld/x")], "id int, url string"
    )
    base = df.select(registrable_domain(F.col("url")).alias("d")).collect()
    assert base[0].d == "custom.tld"
    ext = df.select(
        registrable_domain(
            F.col("url"), extra_suffixes=("custom.tld",)
        ).alias("d")
    ).collect()
    assert ext[0].d == "example.custom.tld"
