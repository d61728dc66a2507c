"""Property-based tests (hypothesis) for round-4 operators: the Spark
implementations must match straightforward pure-Python references on
arbitrary generated corpora — not just the handpicked fixtures."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

_WORDS = ["alpha", "beta", "gamma", "delta", "x", "boiler", "plate"]

line_st = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=4).map(" ".join)
doc_st = st.lists(line_st, min_size=1, max_size=6).map("\n".join)


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(doc_st, min_size=1, max_size=8))
def test_dedup_lines_matches_python_reference(spark, texts):
    """Corpus line dedup == a sequential first-occurrence scan over docs in
    id order (including duplicate empty lines and all-dup docs)."""
    from tilecloud_chain_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_kept)
        for r in dedup_lines(df).collect()
    }
    seen: set[str] = set()
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        assert got[i] == ("\n".join(kept), len(lines), len(kept)), (i, t)


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(st.integers(0, 5000), min_size=1, max_size=40),
    shard_bytes=st.integers(1, 8192),
)
def test_shard_assignments_matches_cumsum_reference(spark, sizes, shard_bytes):
    from tilecloud_chain_spark.operators.sampling import shard_assignments

    df = spark.createDataFrame(
        list(enumerate(sizes)), "doc_id long, n long"
    )
    got = {
        r.id: (r.n_bytes, r.shard, r.offset_in_shard)
        for r in shard_assignments(df, shard_bytes, size_col="n").collect()
    }
    before = 0
    for i, n in enumerate(sizes):
        shard = before // shard_bytes
        assert got[i] == (n, shard, before - shard * shard_bytes), (i, n)
        before += n


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(doc_st, min_size=1, max_size=6))
def test_within_doc_line_stats_matches_reference(spark, texts):
    from tilecloud_chain_spark.operators.text import within_doc_line_stats

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_distinct_lines)
        for r in within_doc_line_stats(df).collect()
    }
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = list(dict.fromkeys(lines))
        assert got[i] == ("\n".join(kept), len(lines), len(kept)), (i, t)
