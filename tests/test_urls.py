"""URL canonicalization + URL-level dedup (operators/urls.py)."""

from pyspark.sql import functions as F

from tilecloud_chain_spark.operators import urls as U


def _canon(spark, url):
    return (
        spark.range(1)
        .select(U.canonicalize_url(F.lit(url)).alias("c"))
        .collect()[0]["c"]
    )


def test_canonicalize_cases(spark):
    cases = {
        # scheme+host lowered, default port stripped, params sorted
        "HTTP://CDN1.Example.COM:80/docs/page7?b=2&a=1":
            "http://cdn1.example.com/docs/page7?a=1&b=2",
        # https default port
        "https://Host.com:443/a": "https://host.com/a",
        # non-default port kept
        "http://host.com:8080/a": "http://host.com:8080/a",
        # duplicate + trailing slash collapse; path case preserved
        "http://h.com/Docs//Sub/": "http://h.com/Docs/Sub",
        # root path: trailing slash survives, empty path becomes /
        "http://h.com/": "http://h.com/",
        "http://h.com": "http://h.com/",
        # fragment dropped
        "http://h.com/a#section-2": "http://h.com/a",
        # tracking params dropped; all-tracking query drops the '?'
        "http://h.com/a?utm_source=x&utm_campaign=y": "http://h.com/a",
        "http://h.com/a?gclid=1&b=2&fbclid=3&ref=rss&msclkid=9":
            "http://h.com/a?b=2",
        # trailing-dot host
        "http://h.com./a": "http://h.com/a",
        # query VALUE case preserved, only scheme/host lowered
        "HTTPS://H.com/p?Key=Val": "https://h.com/p?Key=Val",
    }
    for raw, want in cases.items():
        assert _canon(spark, raw) == want, raw


def test_url_dedup_first_wins(spark):
    rows = [
        (10, "http://h.com/a?b=2&a=1"),
        (11, "HTTP://H.com:80/a?a=1&b=2#frag"),   # same canonical
        (12, "http://h.com/a?a=1&b=2&utm_source=x"),  # same canonical
        (13, "http://h.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: (r.canonical_url, r.keep)
           for r in U.url_dedup(df).collect()}
    assert out[10] == ("http://h.com/a?a=1&b=2", True)
    assert out[11] == ("http://h.com/a?a=1&b=2", False)
    assert out[12] == ("http://h.com/a?a=1&b=2", False)
    assert out[13] == ("http://h.com/other", True)


def test_url_dedup_plan_shape(spark):
    """First-occurrence-wins is a map-side-combinable min aggregation —
    a 10^9-times-fetched hot URL collapses per map task; never a window
    partitioned by the URL, and no Python UDF anywhere (pure codegen)."""
    df = spark.createDataFrame(
        [(i, f"http://h.com/p{i % 3}?utm_source=x&a=1") for i in range(60)],
        "doc_id long, url string",
    )
    out = U.url_dedup(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_malformed_urls_pass_through_unchanged(spark):
    """Scheme-less / relative / malformed URLs must NOT all collapse into
    one degenerate '://…' group (r6 ADVICE: first-wins would silently drop
    all-but-one of every unparseable URL in the corpus). They pass through
    as the raw string, so they only dedup against byte-identical rows."""
    for raw in ["/docs/page7?a=1", "example.com/a", "not a url", "ftp:/x"]:
        assert _canon(spark, raw) == raw, raw
    rows = [(1, "/rel/a"), (2, "/rel/b"), (3, "/rel/a"), (4, "no-scheme")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: r.keep for r in U.url_dedup(df).collect()}
    assert out == {1: True, 2: True, 3: False, 4: True}


def test_fragment_query_does_not_leak(spark):
    """A '?' appearing after '#' is fragment content, not a query — it
    must be dropped with the fragment (r6 ADVICE: the old query regex
    matched the first '?' anywhere)."""
    assert _canon(spark, "http://h.com/a#sec?x=1") == "http://h.com/a"
    assert (_canon(spark, "http://h.com/a?b=2#sec?x=1")
            == "http://h.com/a?b=2")
