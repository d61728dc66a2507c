"""Streaming corpus ingest — the training-data admission pipeline as a
Structured Streaming flow (task-brief extension; the batch twin is
``clean_corpus`` in the driver contract).

Arriving document files stream through quality admission and EXACT dedup
against everything ever admitted (cross-batch, crash-safe), and accepted
rows land in the batch-partitioned output corpus:

    readStream(files) -> quality filter -> in-batch first-wins dedup
        -> anti-join against the seen-hash table (PRIOR batches only)
        -> overwrite corpus/batch=<id> + overwrite state/batch=<id>

Scale shape: the seen-hash table holds one md5 per admitted doc (32 bytes
vs the document body — tiny relative to the corpus) and the per-batch
anti-join is one hash-keyed shuffle join; in-batch dedup is one
first-occurrence aggregation over the batch. Exactly-once: the file
source's checkpoint replays an unacknowledged batch with the SAME
batch_id, and both writes are batch_id-keyed OVERWRITES
(``.../batch=<id>/``) — a replay rewrites the identical partitions instead
of appending duplicates, the standard idempotent-foreachBatch pattern.
(An append-mode output would duplicate rows exactly when a crash lands
between the corpus append and the state append: the replayed batch's
hashes were never persisted, so the anti-join could not drop them.)"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from tilecloud_chain_spark.operators.text import quality_score

DOC_SCHEMA = "doc_id long, text string"


def admit_batch(
    batch: DataFrame,
    seen: DataFrame | None,
    min_quality: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pure (testable) admission kernel: quality gate + in-batch first-wins
    exact dedup + anti-join against the ``seen`` hash table (or None).
    Returns admitted rows with their ``content_hash``."""
    hashed = (
        batch.filter(quality_score(F.col(text_col)) >= min_quality)
        .withColumn("content_hash", F.md5(F.col(text_col)))
    )
    win = Window.partitionBy("content_hash").orderBy(id_col)
    first = (
        hashed.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if seen is not None:
        first = first.join(seen, "content_hash", "left_anti")
    return first


def stream_ingest_corpus(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.2,
    available_now: bool = True,
):
    """Start the ingest stream (parquet file source). Returns the streaming
    query; with ``available_now`` it drains the current files and stops —
    rerun later to pick up new arrivals exactly where it left off."""
    process = make_processor(output_dir, state_dir, min_quality)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def make_processor(output_dir: str, state_dir: str, min_quality: float = 0.2):
    """The foreachBatch body, exposed for direct testing (replay = calling
    it twice with the same batch_id must be a no-op rewrite)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession

        def _has_data(d: str) -> bool:
            # Spark ignores '_'/'.'-prefixed dirs (e.g. a crashed write's
            # _temporary staging) — counting files inside them would claim
            # state exists that read.parquet cannot see, wedging every
            # replay on 'Unable to infer schema'
            if not os.path.exists(d):
                return False
            for _root, dirs, files in os.walk(d):
                dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
                if any(f.endswith(".parquet") for f in files):
                    return True
            return False

        seen = None
        if _has_data(state_dir):
            # EXCLUDE the in-flight batch's own partition: a replay (crash
            # after the writes, before the streaming commit) re-reads state
            # that already holds THIS batch's hashes — without the filter
            # the anti-join would drop every row and the overwrite below
            # would replace the batch's corpus/state partitions with empty
            # data (permanent loss). Prior batches only.
            seen = (
                sess.read.parquet(state_dir)
                .filter(F.col("batch") != int(batch_id))
                .select("content_hash")
            )
        fresh = admit_batch(batch, seen, min_quality).localCheckpoint(eager=True)
        # batch_id-keyed OVERWRITE on both sides: a replayed batch recomputes
        # the identical row set (state read excludes itself) and rewrites the
        # same partitions — idempotent, never appends duplicates
        fresh.drop("content_hash").write.mode("overwrite").parquet(
            f"{output_dir}/batch={batch_id}"
        )
        fresh.select("content_hash").write.mode("overwrite").parquet(
            f"{state_dir}/batch={batch_id}"
        )

    return process


def drain_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.2,
    timeout_s: float = 120.0,
) -> None:
    """Run one availableNow drain to completion."""
    q = stream_ingest_corpus(
        spark, input_dir, output_dir, state_dir, checkpoint_dir,
        min_quality=min_quality, available_now=True,
    )
    q.awaitTermination(timeout_s)
    if q.isActive:  # pragma: no cover - defensive
        q.stop()
        raise TimeoutError("corpus ingest drain did not finish in time")
