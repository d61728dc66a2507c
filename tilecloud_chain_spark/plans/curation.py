"""Resumable image-curation plan — the north-rule contract applied to the
image+caption table: every admission stage checkpoints through the
:class:`CheckpointStore` with per-partition lineage rows (id range, row
count, bytes, wall time), so a killed run resumes exactly — done stages
are skipped, error/uncommitted stages re-execute (the same
stage-commit/retry semantics as the tile pipeline,
``plans/pipeline.py:generate_tiles``; reference parity
store/postgresql.py:443-477).

Stage graph (each stage = one ``run_stage`` call, keyed zoom=0):

    dedup     image_caption_dedup  -> (image_id, dup_group, keep)
    decontam  phash_decontaminate  -> (image_id, contaminated)   [optional]
    clip      clip_filter          -> (image_id, clip_score, keep) [optional]
    admitted  join of the committed flag outputs + bucket + admitted
    batches   aspect_bucket_pack over the ADMITTED rows only
    schedule  epoch_schedule over the committed batch table

Later stages read the committed parquet of earlier stages
(``store.output``), never the live lineage — a resume recomputes
nothing upstream of the first non-done stage. The final ``admitted``
output joined with ``batches`` is row-identical to the single-shot
composed operator (``operators/image_curation.py:image_admission``);
the driver gate pins that equivalence against the same DuckDB oracle.

Scale shape: stage outputs are narrow flag tables keyed by the single
image_id (the lineage 'cell'); image bytes never enter a stage shuffle.
Lineage is appended in the SAME pass that writes the stage (one job per
stage), and the atomic tmp-dir publish makes each stage exactly-once."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tilecloud_chain_spark.checkpoint import CheckpointStore
from tilecloud_chain_spark.operators.image_curation import (
    DEFAULT_BUCKETS,
    aspect_bucket_pack,
    bucket_expr,
    clip_filter,
    epoch_schedule,
    phash_decontaminate,
)
from tilecloud_chain_spark.operators.image_dedup import image_caption_dedup

_Z = 0  # single partition key: curation stages are not zoom-structured


def curate_images(
    spark: SparkSession,
    imgs: DataFrame,
    store: CheckpointStore,
    eval_df: DataFrame | None = None,
    clip_pairs: DataFrame | None = None,
    *,
    clip_threshold: float = 0.28,
    dedup_hamming: int = 6,
    decontam_hamming: int = 2,
    batch_size: int = 64,
    world_size: int = 8,
    seed: str = "epoch0",
    buckets=DEFAULT_BUCKETS,
    job_id: str | None = None,
) -> str:
    """Run (or resume) the staged admission pipeline; returns job_id.

    Pass the returned ``job_id`` back in to resume after a kill: done
    stages are skipped (their committed parquet is reused), the failed
    stage re-executes. The caller must supply the same inputs on resume —
    the store checkpoints stage OUTPUTS, not the source table."""
    if job_id is None:
        job_id = store.create_job("curate_images", command="curate_images")

    cell = F.col("image_id").alias("cell")

    def _dedup() -> DataFrame:
        return image_caption_dedup(imgs, dedup_hamming).select(
            "image_id", "dup_group", "keep", cell
        )

    store.run_stage(job_id, "dedup", _Z, _dedup)

    if eval_df is not None:
        def _decontam() -> DataFrame:
            return phash_decontaminate(imgs, eval_df, decontam_hamming).select(
                "image_id", "contaminated", cell
            )

        store.run_stage(job_id, "decontam", _Z, _decontam)

    if clip_pairs is not None:
        def _clip() -> DataFrame:
            return clip_filter(clip_pairs, clip_threshold).select(
                "image_id", "clip_score", "keep", cell
            )

        store.run_stage(job_id, "clip", _Z, _clip)

    def _admitted() -> DataFrame:
        base = imgs.select(
            "image_id", "w", "h", bucket_expr("w", "h", buckets).alias("bucket")
        )
        dd = store.output(job_id, "dedup", _Z).select(
            "image_id", F.col("keep").alias("dedup_keep")
        )
        base = base.join(dd, "image_id")
        if clip_pairs is not None:
            cf = store.output(job_id, "clip", _Z).select(
                "image_id", F.col("keep").alias("_ck")
            )
            base = base.join(cf, "image_id", "left")
            clip_keep = F.coalesce(F.col("_ck"), F.lit(True))
        else:
            clip_keep = F.lit(True)
        if eval_df is not None:
            ct = store.output(job_id, "decontam", _Z).select(
                "image_id", F.col("contaminated").alias("_ct")
            )
            base = base.join(ct, "image_id", "left")
            contaminated = F.coalesce(F.col("_ct"), F.lit(False))
        else:
            contaminated = F.lit(False)
        return base.select(
            "image_id", "w", "h", "bucket",
            clip_keep.alias("clip_keep"),
            contaminated.alias("contaminated"),
            "dedup_keep",
            (clip_keep & ~contaminated & F.col("dedup_keep")).alias("admitted"),
            cell,
        )

    store.run_stage(job_id, "admitted", _Z, _admitted)

    def _batches() -> DataFrame:
        adm = store.output(job_id, "admitted", _Z).filter(F.col("admitted"))
        return aspect_bucket_pack(adm, batch_size, buckets).select(
            "image_id", "bucket", "batch_index", "slot", cell
        )

    store.run_stage(job_id, "batches", _Z, _batches)

    def _schedule() -> DataFrame:
        bk = store.output(job_id, "batches", _Z)
        return epoch_schedule(bk, world_size, seed=seed).withColumn(
            "cell",
            F.col("bucket").cast("long") * F.lit(1_000_000_000).cast("long")
            + F.col("batch_index").cast("long"),
        )

    store.run_stage(job_id, "schedule", _Z, _schedule)
    return job_id


def admission_table(store: CheckpointStore, job_id: str) -> DataFrame:
    """The composed-operator-shaped result from a finished job: one row
    per image with every stage flag and the training-batch coordinates
    (NULL batch/slot for rejected rows) — row-identical to
    ``image_admission``."""
    adm = store.output(job_id, "admitted", _Z).drop("cell")
    packed = store.output(job_id, "batches", _Z).select(
        "image_id", "batch_index", "slot"
    )
    return adm.join(packed, "image_id", "left").select(
        "image_id", "clip_keep", "contaminated", "dedup_keep", "admitted",
        "bucket", "batch_index", "slot",
    )
