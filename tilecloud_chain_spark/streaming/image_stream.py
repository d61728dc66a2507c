"""Streaming image-corpus ingest — continuous admission of arriving
image+caption rows (the north-rule table shape) as a Structured Streaming
flow; the image twin of ``corpus_stream`` and the streaming twin of the
batch ``image_admission`` capstone (``operators/image_curation.py``).

Arriving image-metadata files stream through pair dedup WITHIN the batch
and near-dup admission against everything ever admitted (cross-batch,
crash-safe), and accepted rows land in the batch-partitioned corpus:

    readStream(files) -> in-batch image_caption_dedup (caption-equal OR
        phash-near components, min-id survivor)
        -> caption-hash anti-join against seen state (PRIOR batches only)
        -> phash-near anti-join against seen state (pigeonhole block join)
        -> overwrite corpus/batch=<id> + overwrite state/batch=<id>

Scale shape: the seen state holds (caption_hash, phash) per admitted
image — 40 bytes vs the image payload, tiny relative to the corpus. The
caption check is one hash-keyed anti-join. The phash-near check is the
pigeonhole block join (``operators/dedup.py:int64_near_pairs``'s
argument) expressed CROSS-table: both sides explode to
``max_hamming + 1`` (chunk, key) block rows and equi-join — the
micro-batch side is small, so AQE broadcasts IT against the corpus-sized
state (the batch probes the state, never the reverse; the state is never
broadcast and never self-joins). Exactly-once follows the same
idempotent-foreachBatch pattern as ``corpus_stream``: both writes are
batch_id-keyed OVERWRITES and the state read excludes the in-flight
batch's own partition, so a crash-replay rewrites identical partitions
instead of appending duplicates or wiping the batch."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from tilecloud_chain_spark.operators.dedup import blocked_keys
from tilecloud_chain_spark.operators.image_dedup import image_caption_dedup

IMG_SCHEMA = "image_id long, w int, h int, caption string, phash long"


def phash_near_anti_join(
    batch: DataFrame,
    seen_phash: DataFrame,
    max_hamming: int = 6,
    phash_col: str = "phash",
) -> DataFrame:
    """Drop batch rows whose phash is within ``max_hamming`` of ANY hash
    in ``seen_phash`` (one ``phash`` column). Pigeonhole block join:
    slice 64 bits into ``max_hamming + 1`` blocks — a pair within the
    radius agrees exactly on at least one block — then popcount-verify
    and left-anti on the hit set. Differs from ``phash_decontaminate``
    in the join direction: here the SMALL side is the batch and the
    large side is the ever-growing seen state, so neither side is
    force-broadcast — the equi-join on (chunk, key) lets AQE broadcast
    the batch side."""
    probe = blocked_keys(
        batch.select(phash_col).distinct(), phash_col, max_hamming,
        hash_out="_bh",
    )
    state = blocked_keys(
        seen_phash.select(phash_col).distinct(), phash_col, max_hamming,
        hash_out="_sh",
    )
    hits = (
        probe.join(state, ["chunk", "key"])
        .filter(F.bit_count(F.col("_bh").bitwiseXOR(F.col("_sh"))) <= max_hamming)
        .select(F.col("_bh").alias(phash_col))
        .distinct()
    )
    return batch.join(hits, phash_col, "left_anti")


def admit_image_batch(
    batch: DataFrame,
    seen: DataFrame | None,
    max_hamming: int = 6,
    id_col: str = "image_id",
    caption_col: str = "caption",
    phash_col: str = "phash",
) -> DataFrame:
    """Pure (testable) admission kernel: in-batch pair dedup (min-id
    survivor per caption/phash component) + caption-hash and phash-near
    anti-joins against the ``seen`` state table (columns caption_hash,
    phash; or None). Returns admitted rows with their ``caption_hash``."""
    keep = image_caption_dedup(
        batch, max_hamming, id_col=id_col,
        phash_col=phash_col, caption_col=caption_col,
    ).filter(F.col("keep")).select(id_col)
    fresh = batch.join(keep, id_col).withColumn(
        "caption_hash", F.md5(F.col(caption_col))
    )
    if seen is not None:
        fresh = fresh.join(
            seen.select("caption_hash").distinct(), "caption_hash", "left_anti"
        )
        fresh = phash_near_anti_join(
            fresh, seen.select(phash_col), max_hamming, phash_col=phash_col
        )
    return fresh


def make_image_processor(
    output_dir: str, state_dir: str, max_hamming: int = 6
):
    """The foreachBatch body, exposed for direct testing (replay = calling
    it twice with the same batch_id must be a no-op rewrite)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession

        def _has_data(d: str) -> bool:
            # skip '_'/'.'-prefixed dirs (crashed-write _temporary staging)
            # exactly like corpus_stream — see the rationale there
            if not os.path.exists(d):
                return False
            for _root, dirs, files in os.walk(d):
                dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
                if any(f.endswith(".parquet") for f in files):
                    return True
            return False

        seen = None
        if _has_data(state_dir):
            # prior batches only: a replay must not anti-join against the
            # state its own first attempt already wrote (corpus_stream's
            # permanent-loss scenario applies identically here)
            seen = (
                sess.read.parquet(state_dir)
                .filter(F.col("batch") != int(batch_id))
                .select("caption_hash", "phash")
            )
        fresh = admit_image_batch(batch, seen, max_hamming).localCheckpoint(
            eager=True
        )
        fresh.drop("caption_hash").write.mode("overwrite").parquet(
            f"{output_dir}/batch={batch_id}"
        )
        fresh.select("caption_hash", "phash").write.mode("overwrite").parquet(
            f"{state_dir}/batch={batch_id}"
        )

    return process


def stream_ingest_images(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 6,
    available_now: bool = True,
):
    """Start the image-ingest stream (parquet file source). Returns the
    streaming query; with ``available_now`` it drains the current files
    and stops — rerun later to pick up new arrivals exactly where it
    left off."""
    process = make_image_processor(output_dir, state_dir, max_hamming)
    stream = spark.readStream.schema(IMG_SCHEMA).parquet(input_dir)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain_image_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 6,
    timeout_s: float = 120.0,
) -> None:
    """Run one availableNow drain to completion."""
    q = stream_ingest_images(
        spark, input_dir, output_dir, state_dir, checkpoint_dir,
        max_hamming=max_hamming, available_now=True,
    )
    q.awaitTermination(timeout_s)
    if q.isActive:  # pragma: no cover - defensive
        q.stop()
        raise TimeoutError("image ingest drain did not finish in time")
