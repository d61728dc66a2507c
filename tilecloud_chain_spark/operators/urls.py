"""URL canonicalization + URL-level dedup (training-data brief: corpus
pipelines dedupe fetched pages by canonical URL before any content-level
pass — the cheapest dedup axis, applied first at 10^12-row scale).

No direct reference counterpart (the reference's store/url.py:43-117 only
FETCHES from URLs); this is the standard web-corpus admission op (CCNet /
CommonCrawl pipelines key their first dedup round on canonicalized URL).

Everything here is pure JVM Column math (regexp + array ops — no Python in
the hot path, whole-stage-codegen'd) and every step is replayed exactly by
the DuckDB oracle (`__spark_entry__.oracle_sql()['url_dedup_docs']`):
regexp part extraction, tracking-param filter, lexicographic (binary) sort
of the surviving query params, and the default-port CASE are all engine-
portable constructs.

Scale shape: canonicalization is per-row narrow work; the dedup is ONE
hash shuffle of (canonical_url, doc_id) pairs — first-occurrence-wins is a
map-side-combinable min aggregation + broadcast-eligible join back, never
a row_number window partitioned by the URL (a crawl that fetched one hot
URL 10^9 times would funnel into a single task's window sort; the min-agg
collapses those rows per map task first — same argument as
operators/dedup.py line-level dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tracking params dropped during canonicalization (case-sensitive on the
# key, like the oracle): utm_* plus the common click-id params.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z]+|fbclid|gclid|msclkid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# query extracted from the PRE-fragment substring (see canonicalize_url):
# a '?' inside the fragment ('#sec?x=1') is fragment content, not a query
_QUERY_RE = r"\?(.*)$"
_PREFRAGMENT_RE = r"^([^#]*)"


def canonicalize_url(url) -> F.Column:
    """Canonical form of ``url`` (a Column or column name):

    - scheme and host lowercased; trailing dot stripped from the host
    - default port stripped (``:80`` for http, ``:443`` for https)
    - fragment dropped
    - path: duplicate slashes collapsed, trailing slash stripped (root
      kept), empty path becomes ``/``
    - query: tracking params (``utm_*``, ``fbclid``, ``gclid``,
      ``msclkid``, ``ref``) and empty fragments dropped, the rest sorted
      lexicographically (binary) and re-joined; an emptied query drops the
      ``?`` entirely

    Pure Column expression — codegen'd, no UDF."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    # split host[:port]; strip one trailing dot from the host part
    host = F.regexp_replace(
        F.regexp_extract(hostport, r"^([^:]*)", 1), r"\.$", ""
    )
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    hostc = F.when(
        (port == "") | default_port, host
    ).otherwise(F.concat(host, F.lit(":"), port))
    raw_path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.regexp_replace(raw_path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"(.)/$", r"$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(
        F.regexp_extract(u, _PREFRAGMENT_RE, 1), _QUERY_RE, 1
    )
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qjoined = F.array_join(kept, "&")
    qpart = F.when(qjoined == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), qjoined)
    )
    canonical = F.concat(scheme, F.lit("://"), hostc, path, qpart)
    # scheme-less / relative / malformed URLs all extract to the same
    # degenerate '://<path>' — canonicalizing them would collapse every
    # unparseable URL in the corpus into ONE dedup group and first-
    # occurrence-wins would drop all but one of those documents. Pass the
    # raw string through instead: such rows only ever group with byte-
    # identical siblings (plain exact-string dedup, always safe).
    return F.when((scheme == "") | (host == ""), u).otherwise(canonical)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level first-occurrence-wins dedup: adds ``canonical_url`` and a
    ``keep`` flag (true on the min-``id_col`` row of each canonical-URL
    group). Input rows are preserved — filter on ``keep`` to take
    survivors, or keep the flag for lineage.

    The winner per group is a map-side-combinable ``min`` aggregation
    joined back on the canonical key — a 10^9-times-fetched hot URL
    collapses inside each map task instead of flooding one window sort."""
    canon = df.withColumn("canonical_url", canonicalize_url(url_col))
    winners = canon.groupBy("canonical_url").agg(
        F.min(F.col(id_col)).alias("_keep_id")
    )
    return (
        canon.join(winners, "canonical_url")
        .withColumn("keep", F.col(id_col) == F.col("_keep_id"))
        .drop("_keep_id")
    )
