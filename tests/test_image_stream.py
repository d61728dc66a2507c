"""Streaming image-corpus ingest (streaming/image_stream.py): in-batch
pair dedup, cross-batch caption/phash-near admission, exactly-once
replay semantics, and the genuine Structured Streaming drain."""

import pytest
from pyspark.sql import functions as F

from tilecloud_chain_spark.functions.image import hamming64
from tilecloud_chain_spark.operators.image_dedup import image_caption_dedup
from tilecloud_chain_spark.streaming.image_stream import (
    admit_image_batch,
    drain_image_ingest,
    make_image_processor,
    phash_near_anti_join,
)

IMG_SCHEMA = "image_id long, w int, h int, caption string, phash long"


def _rows(spec):
    """spec: list of (image_id, caption, phash) -> full-schema tuples."""
    return [(i, 640, 480, c, p) for i, c, p in spec]


# ---------------------------------------------------------------------------
# phash_near_anti_join


def test_phash_near_anti_join_exact_vs_bruteforce(spark):
    import hashlib

    def _h(i):
        v = int.from_bytes(hashlib.md5(b"st%d" % i).digest()[:8], "big")
        return v - (1 << 64) if v >= 1 << 63 else v

    seen_hashes = [_h(i) for i in range(40)]

    def _flip(h, *bits):
        for b in bits:
            h ^= 1 << b
        h &= (1 << 64) - 1
        return h - (1 << 64) if h >= 1 << 63 else h

    batch_hashes = (
        [_h(100 + i) for i in range(20)]          # novel
        + [_h(3), _flip(_h(7), 2)]                # exact + hamming-1 hits
        + [_flip(_h(11), 1, 9, 33)]               # hamming 3 <= 6 -> hit
        + [_flip(_h(13), 0, 8, 16, 24, 32, 40, 48)]  # hamming 7 -> admitted
    )
    batch = spark.createDataFrame(
        _rows([(i, f"c{i}", h) for i, h in enumerate(batch_hashes)]), IMG_SCHEMA
    )
    seen = spark.createDataFrame([(h,) for h in seen_hashes], "phash long")
    got = sorted(
        r.image_id for r in phash_near_anti_join(batch, seen, 6).collect()
    )
    want = sorted(
        i for i, h in enumerate(batch_hashes)
        if all(hamming64(h, s) > 6 for s in seen_hashes)
    )
    assert got == want
    assert len(want) == 21  # 20 novel + the hamming-7 row


# ---------------------------------------------------------------------------
# admit_image_batch kernel


def test_admit_batch_in_batch_dedup_matches_operator(spark):
    spec = [
        (0, "cap a", 100),
        (1, "cap a", 0xFF << 40),   # caption dup of 0 (phash far from all)
        (2, "cap b", 100 ^ 3),      # phash hamming-2 near-dup of 0
        (3, "cap c", 0xFF << 24),   # novel (>= hamming 10 from everything)
    ]
    batch = spark.createDataFrame(_rows(spec), IMG_SCHEMA)
    got = sorted(r.image_id for r in admit_image_batch(batch, None).collect())
    want = sorted(
        r.image_id
        for r in image_caption_dedup(batch, 6).filter(F.col("keep")).collect()
    )
    assert got == want == [0, 3]


def test_admit_batch_cross_batch_anti_joins(spark):
    seen_spec = [(0, "old cap", 500)]
    seen = spark.createDataFrame(
        _rows(seen_spec), IMG_SCHEMA
    ).select(F.md5("caption").alias("caption_hash"), "phash")
    spec = [
        (10, "old cap", 0xF0F0F00000),  # caption seen -> dropped
        (11, "new cap", 500 ^ 7),     # phash hamming-3 of seen -> dropped
        (12, "new cap2", 0xFF << 32),  # novel -> admitted
    ]
    batch = spark.createDataFrame(_rows(spec), IMG_SCHEMA)
    out = admit_image_batch(batch, seen)
    assert sorted(r.image_id for r in out.collect()) == [12]
    assert "caption_hash" in out.columns


# ---------------------------------------------------------------------------
# processor replay idempotency (exactly-once)


def test_processor_replay_is_idempotent(spark, tmp_path):
    out_dir, state_dir = str(tmp_path / "corpus"), str(tmp_path / "state")
    process = make_image_processor(out_dir, state_dir)
    b0 = spark.createDataFrame(
        _rows([(0, "a", 10), (1, "a", 0xFF << 40), (2, "b", 0xFF00)]),
        IMG_SCHEMA,
    )
    process(b0, 0)
    first = sorted(
        r.image_id for r in spark.read.parquet(out_dir).collect()
    )
    assert first == [0, 2]
    # replay batch 0 (crash between writes and streaming commit): the state
    # read must exclude batch 0's own hashes, so the rewrite is identical
    process(b0, 0)
    again = sorted(r.image_id for r in spark.read.parquet(out_dir).collect())
    assert again == first
    # next batch dedups against batch 0's state
    b1 = spark.createDataFrame(
        _rows([(10, "a", 0xF0F0F0), (11, "c", 10 ^ 1), (12, "d", 0xFF000000)]),
        IMG_SCHEMA,
    )
    process(b1, 1)
    allrows = sorted(r.image_id for r in spark.read.parquet(out_dir).collect())
    assert allrows == [0, 2, 12]


# ---------------------------------------------------------------------------
# genuine Structured Streaming drain (file source, availableNow)


def test_stream_ingest_two_waves(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir, state_dir = str(tmp_path / "corpus"), str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    wave1 = spark.createDataFrame(
        _rows([(0, "a", 10), (1, "a", 0xFF << 40), (2, "b", 0xFF00)]),
        IMG_SCHEMA,
    )
    wave1.write.parquet(in_dir)
    drain_image_ingest(spark, in_dir, out_dir, state_dir, ckpt)
    assert sorted(
        r.image_id for r in spark.read.parquet(out_dir).collect()
    ) == [0, 2]
    # wave 2 arrives later: one near-dup of wave 1, one novel
    wave2 = spark.createDataFrame(
        _rows([(10, "c", 10 ^ 3), (11, "d", 0xFF0000)]), IMG_SCHEMA
    )
    wave2.write.mode("append").parquet(in_dir)
    drain_image_ingest(spark, in_dir, out_dir, state_dir, ckpt)
    assert sorted(
        r.image_id for r in spark.read.parquet(out_dir).collect()
    ) == [0, 2, 11]


# ---------------------------------------------------------------------------
# plan shape: the state side is never broadcast


def test_phash_near_anti_join_never_broadcasts_state(spark):
    batch = spark.createDataFrame(
        _rows([(i, f"c{i}", i * 7919) for i in range(5)]), IMG_SCHEMA
    )
    seen = spark.createDataFrame(
        [(i * 104729,) for i in range(5000)], "phash long"
    )
    out = phash_near_anti_join(batch, seen, 6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the probe (batch) side may be broadcast; the corpus-sized state must
    # not be the build side of a broadcast: assert no broadcast node sits
    # directly over the state scan by checking the hit-join's build side
    # row estimate — cheap proxy: with a 1000x size skew AQE must not pick
    # the LARGE side. Structurally: at most one BroadcastExchange feeding
    # the block equi-join.
    assert plan.count("BroadcastExchange") <= 1, plan


def test_phash_near_anti_join_validates_radius(spark):
    batch = spark.createDataFrame(_rows([(0, "a", 1)]), IMG_SCHEMA)
    seen = spark.createDataFrame([(2,)], "phash long")
    with pytest.raises(ValueError):
        phash_near_anti_join(batch, seen, 64)
