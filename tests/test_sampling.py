"""Deterministic sampling / leakage-safe split (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from tilecloud_chain_spark.operators import sampling as SA


def test_hex_threshold_edges():
    assert SA.hex_threshold(0.0) == "0" * 32
    assert SA.hex_threshold(1.0) == "g"  # > any md5 hex digest
    t = SA.hex_threshold(0.5)
    assert len(t) == 32 and t.startswith("8")


def test_deterministic_sample_stable_and_nested(spark):
    """Hash gating: re-runs agree exactly, and thresholds NEST — the 20%
    sample is a strict subset of the 50% sample under the same salt (an RNG
    sample has neither property)."""
    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    s50a = {r.doc_id for r in SA.deterministic_sample(df, 0.5, "doc_id").collect()}
    s50b = {r.doc_id for r in SA.deterministic_sample(df, 0.5, "doc_id").collect()}
    s20 = {r.doc_id for r in SA.deterministic_sample(df, 0.2, "doc_id").collect()}
    assert s50a == s50b
    assert s20 <= s50a
    assert abs(len(s50a) / 5000 - 0.5) < 0.05
    assert abs(len(s20) / 5000 - 0.2) < 0.05
    # a different salt draws a different (still deterministic) sample
    other = {r.doc_id for r in SA.deterministic_sample(df, 0.5, "doc_id", salt="v2").collect()}
    assert other != s50a


def test_stratified_sample_quotas(spark):
    df = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("stratum"),
    )
    out = SA.stratified_sample(
        df, "stratum", {"0": 0.5, "1": 0.1, "2": 1.0}, "doc_id"
    )
    counts = {r.stratum: r.n for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts["2"] == 2000  # fraction 1.0 keeps everything
    assert abs(counts["0"] / 2000 - 0.5) < 0.07
    assert abs(counts["1"] / 2000 - 0.1) < 0.05
    # unknown strata default to 0
    extra = df.withColumn("stratum", F.lit("9"))
    assert SA.stratified_sample(extra, "stratum", {"0": 1.0}, "doc_id").count() == 0


def test_leakage_safe_split_keeps_clusters_whole(spark):
    """Every member of a cluster lands on the same side — the property a
    row-level split violates (near-dup test rows leaking train content)."""
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 500).cast("string").alias("cluster"),
    )
    out = SA.leakage_safe_split(df, "cluster", test_fraction=0.25)
    per_cluster = out.groupBy("cluster").agg(
        F.countDistinct("split").alias("sides")
    )
    assert per_cluster.agg(F.max("sides")).collect()[0][0] == 1
    test_clusters = out.filter(F.col("split") == "test").select("cluster").distinct().count()
    assert abs(test_clusters / 500 - 0.25) < 0.07
    # rows hashed directly WOULD split clusters (sanity of the property)
    naive = SA.leakage_safe_split(df, "doc_id", test_fraction=0.25)
    naive_sides = naive.groupBy("cluster").agg(F.countDistinct("split").alias("s"))
    assert naive_sides.agg(F.max("s")).collect()[0][0] == 2


def test_resize_area_and_operator(spark):
    """Multimodal resize: exact box means, constant stays constant bit-exact,
    and the DataFrame stage round-trips through the codec."""
    import numpy as np

    from tilecloud_chain_spark.functions import image as IMG
    from tilecloud_chain_spark.operators.raster import resize_images
    from tilecloud_chain_spark.sources.images import synth_images

    # 2x2 box mean, exact
    img = np.array([[0, 255, 0, 255], [0, 255, 0, 255],
                    [100, 100, 200, 200], [100, 100, 200, 200]], dtype=np.uint8)
    small = IMG.resize_area(img, 2, 2)
    assert small.tolist() == [[128, 128], [100, 200]]
    # constant image stays bit-exact constant at any size
    const = np.full((32, 32, 4), 77, dtype=np.uint8)
    assert (IMG.resize_area(const, 7, 5) == 77).all()

    from tilecloud_chain_spark.config import SWISSGRID_5
    df = synth_images(spark, 20, SWISSGRID_5, size=32)
    out = resize_images(df.select("image_id", F.col("bytes").alias("data")), 8, 8)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert (r.src_w, r.src_h) == (32, 32)
        dec = IMG.decode(bytes(r.data), "png")
        assert dec.shape[:2] == (8, 8)
    # determinism
    again = {r.image_id: bytes(r.data) for r in
             resize_images(df.select("image_id", F.col("bytes").alias("data")), 8, 8).collect()}
    assert {r.image_id: bytes(r.data) for r in rows} == again


def test_token_stream_chunks(spark):
    """Concat-and-chunk: offsets are contiguous in id order, chunk ids match
    hand computation, boundary docs straddle, empty docs touch 0 chunks."""
    from tilecloud_chain_spark.operators.text import token_stream_chunks

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, ""), (4, "f g h i j"), (5, "k")],
        "doc_id int, text string",
    )
    rows = {r.id: r for r in token_stream_chunks(docs, chunk_tokens=4).collect()}
    # token counts: 3, 2, 0, 5, 1 -> offsets 0..3, 3..5, 5..5, 5..10, 10..11
    assert (rows[1].start_off, rows[1].end_off) == (0, 3)
    assert (rows[2].start_off, rows[2].end_off) == (3, 5)
    assert (rows[3].start_off, rows[3].end_off) == (5, 5)
    assert (rows[4].start_off, rows[4].end_off) == (5, 10)
    assert (rows[5].start_off, rows[5].end_off) == (10, 11)
    # chunks of 4 tokens: doc1 -> chunk 0 only; doc2 straddles 0-1;
    # doc3 empty -> 0 chunks; doc4 spans chunks 1-2; doc5 in chunk 2
    assert (rows[1].chunk_first, rows[1].chunk_last, rows[1].n_chunks) == (0, 0, 1)
    assert (rows[2].chunk_first, rows[2].chunk_last, rows[2].n_chunks) == (0, 1, 2)
    assert rows[3].n_chunks == 0
    assert (rows[4].chunk_first, rows[4].chunk_last, rows[4].n_chunks) == (1, 2, 2)
    assert (rows[5].chunk_first, rows[5].chunk_last, rows[5].n_chunks) == (2, 2, 1)
    # stream property: every chunk boundary is covered exactly once
    total = 11
    covered = sorted((rows[i].start_off, rows[i].end_off) for i in rows)
    assert covered[0][0] == 0 and covered[-1][1] == total
    for (s1, e1), (s2, e2) in zip(covered, covered[1:]):
        assert e1 == s2
    # scale shape: the prefix sum must NOT funnel all rows into one
    # partition (an unpartitioned Spark window would show
    # "Exchange SinglePartition" in the plan)
    out = token_stream_chunks(docs, chunk_tokens=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_token_chunks_oracle_tokenizer_parity(spark):
    """The token_chunks oracle must tokenize EXACTLY like Spark's tokens()
    (\\s+ regex) — a single-space split diverges on tabs/newlines and would
    shift every downstream offset. Both engines over the same tricky text."""
    import duckdb

    from tilecloud_chain_spark.operators.text import token_count

    tricky = [(1, "a\tb c"), (2, "x\n\ny  z"), (3, "  lead trail  "), (4, "")]
    df = spark.createDataFrame(tricky, "doc_id int, text string")
    got = {r.doc_id: r.n for r in
           df.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    con = duckdb.connect()
    oracle = dict(con.execute(
        "SELECT doc_id, len(list_filter(string_split_regex(trim(text), '\\s+'),"
        " x -> x != '')) FROM (VALUES (1, 'a\tb c'), (2, 'x' || chr(10) || chr(10) || 'y  z'),"
        " (3, '  lead trail  '), (4, '')) AS t(doc_id, text)"
    ).fetchall())
    assert got == {1: 3, 2: 3, 3: 2, 4: 0}
    assert oracle == got


def test_resize_area_upscale_no_black_rows():
    """Upscaling must never emit the zero-filled rows/columns the raw
    integer-boundary boxes degenerate to when out > in (advisor-confirmed
    bug): constants stay constant, gradients stay within bounds."""
    import numpy as np

    from tilecloud_chain_spark.functions.image import resize_area

    assert (resize_area(np.full((4, 4), 100, np.uint8), 8, 8) == 100).all()
    assert (resize_area(np.full((4, 4, 4), 33, np.uint8), 9, 7) == 33).all()
    mixed = resize_area(np.full((4, 16), 7, np.uint8), 8, 8)  # up x, down y
    assert mixed.shape == (8, 8) and (mixed == 7).all()
    g = (np.arange(16, dtype=np.uint8).reshape(4, 4) * 16)
    gu = resize_area(g, 8, 8)
    assert gu.min() >= 0 and gu.max() <= 240
    assert all(list(gu[i]) == sorted(gu[i]) for i in range(8))  # monotone rows


def test_shard_assignments_matches_global_cumsum(spark, sf_dir):
    """Distributed prefix-sum sharding == DuckDB's true global cumsum
    (different formulation, identical math), and shard payloads respect the
    budget + one-sample overshoot bound."""
    import duckdb

    from tilecloud_chain_spark.operators.sampling import shard_assignments

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = shard_assignments(
        docs, shard_bytes=4096, size_expr=F.length("text")
    )
    got = {(r.id, r.n_bytes, r.shard, r.offset_in_shard) for r in out.collect()}
    con = duckdb.connect()
    want = {
        tuple(r)
        for r in con.execute(f"""
            WITH t AS (
              SELECT doc_id AS id, CAST(len(text) AS BIGINT) AS n_bytes
              FROM read_parquet('{sf_dir}/documents.parquet')
            ), c AS (
              SELECT id, n_bytes,
                     SUM(n_bytes) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING)
                     - n_bytes AS before
              FROM t
            )
            SELECT id, n_bytes,
                   CAST(floor(before / 4096.0) AS BIGINT) AS shard,
                   CAST(before - CAST(floor(before / 4096.0) AS BIGINT) * 4096 AS BIGINT)
                     AS offset_in_shard
            FROM c
        """).fetchall()
    }
    assert got == want
    # budget bound: every shard holds <= shard_bytes + its last sample
    rows = sorted(got, key=lambda r: (r[2], r[0]))
    by_shard = {}
    for _id, nb, sh, _off in rows:
        by_shard.setdefault(sh, []).append(nb)
    for sh, sizes in by_shard.items():
        assert sum(sizes) - sizes[-1] < 4096
    # contiguity: shard ids are consecutive from 0
    assert sorted(by_shard) == list(range(len(by_shard)))


def test_shard_assignments_partition_invariant(spark, sf_dir):
    from tilecloud_chain_spark.operators.sampling import shard_assignments

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {tuple(r) for r in shard_assignments(docs, 2048, size_expr=F.length("text")).collect()}
    b = {tuple(r) for r in shard_assignments(docs.repartition(13), 2048, size_expr=F.length("text")).collect()}
    assert a == b
