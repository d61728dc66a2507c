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
    assemble_admission,
    bucket_expr,
    clip_filter,
    compose_admission_flags,
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
    caption_near_threshold: float | None = None,
    decontam_hamming: int = 2,
    batch_size: int = 64,
    world_size: int = 8,
    seed: str = "epoch0",
    buckets=DEFAULT_BUCKETS,
    job_id: str | None = None,
    with_schedule: bool = True,
) -> str:
    """Run (or resume) the staged admission pipeline; returns job_id.

    Pass the returned ``job_id`` back in to resume after a kill: done
    stages are skipped (their committed parquet is reused), the failed
    stage re-executes. The caller must supply the same inputs on resume —
    the store checkpoints stage OUTPUTS, not the source table. The
    parameter set is recorded in the job marker at creation and a resume
    with DIFFERENT parameters is refused — otherwise the new values would
    be silently ignored for committed stages (or, worse, a mid-run kill
    would yield a mixed-parameter admission table)."""
    import json

    params = json.dumps({
        "clip_threshold": float(clip_threshold),
        "dedup_hamming": int(dedup_hamming),
        "caption_near_threshold": (
            None if caption_near_threshold is None
            else float(caption_near_threshold)
        ),
        "decontam_hamming": int(decontam_hamming),
        "batch_size": int(batch_size),
        "world_size": int(world_size),
        "seed": str(seed),
        "buckets": [list(b) for b in buckets],
        "has_eval": eval_df is not None,
        "has_clip": clip_pairs is not None,
    }, sort_keys=True)
    command = f"curate_images {params}"
    if job_id is None:
        job_id = store.create_job("curate_images", command=command)
    else:
        prev = store.job(job_id).get("command", "")
        if prev != command:
            raise ValueError(
                f"job {job_id} was created with different parameters — "
                f"resume must reuse them (or start a new job).\n"
                f"  recorded: {prev}\n  requested: {command}"
            )

    cell = F.col("image_id").alias("cell")

    def _dedup() -> DataFrame:
        return image_caption_dedup(
            imgs, dedup_hamming,
            caption_near_threshold=caption_near_threshold,
        ).select(
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
        cf = None
        if clip_pairs is not None:
            cf = store.output(job_id, "clip", _Z).select(
                "image_id", F.col("keep").alias("_ck")
            )
        ct = None
        if eval_df is not None:
            ct = store.output(job_id, "decontam", _Z).select(
                "image_id", F.col("contaminated").alias("_ct")
            )
        # the same single-source admission rule as the composed operator
        return compose_admission_flags(
            base, dd, clip_flags=cf, contam_flags=ct
        ).withColumn("cell", F.col("image_id"))

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

    if with_schedule:
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
    return assemble_admission(adm, packed)
