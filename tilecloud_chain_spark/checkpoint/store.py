"""Per-zoom stage checkpointing with per-partition lineage and exact resume.

Models the reference's PostgreSQL job/queue store
(/root/reference/tilecloud_chain/store/postgresql.py:143-194: ``job`` rows
with status/meta_tiles_total, ``queue`` rows keyed by zoom with status
created|pending|done|error) and its retry semantics — "only the meta tiles
currently in error are requeued, done rows untouched"
(store/postgresql.py:443-477) — re-expressed for Spark's execution model:

- Spark task success replaces the per-row ``pending`` lock + countdown
  (SKIP LOCKED, ``elapsed_togenerate``): the unit of atomicity is the *stage
  commit*, not the row claim.
- The store is **log-structured**: every mutation is an append (queue rows,
  status markers, stage manifests); current state is a reconciliation read
  (latest marker wins). This is exactly Iceberg's snapshot model; on a real
  cluster these directories become Iceberg tables and ``_commit_marker``
  becomes a snapshot commit / MERGE. Parquet + atomic rename is the
  sandbox stand-in (no Iceberg runtime jars in this environment).
- **Per-partition lineage rows** (partition id, cell range, row count,
  bytes, wall ms — BASELINE.json mandate) are produced inside the stage's
  own ``mapInPandas`` pass and written INTO THE SAME parquet files as the
  data (a ``_lineage`` struct column, null on data rows): lineage commits
  atomically with exactly the data it describes. ``output()`` filters
  ``_lineage IS NULL``; ``lineage()`` reads the complement.
- **Exact resume**: ``run_stage`` is a no-op when the stage's commit marker
  exists; a killed run re-executes only uncommitted stages against the same
  deterministic inputs. ``retry_errors`` re-opens only stages marked
  ``error``.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def with_lineage(df: DataFrame, cell_col: str = "cell", bytes_col: str | None = None,
                 salt_col: str | None = None) -> DataFrame:
    """Pass-through that appends one lineage row per partition.

    Output schema = input schema + ``_lineage`` struct; data rows carry
    ``_lineage = NULL``, and each partition emits one trailing row with the
    data columns NULL and ``_lineage`` set. Single compute pass — no second
    job, no recompute; wall_ms is the partition's real processing time.
    """
    import pandas as pd

    in_cols = df.columns
    has_cell = cell_col in in_cols
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", _lineage struct<partition_id: int, salt: int, cell_min: bigint, "
        "cell_max: bigint, row_count: bigint, bytes: bigint, wall_ms: bigint>"
    )

    def wrap(batches):
        from pyspark import TaskContext

        t0 = time.perf_counter()
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        rows = 0
        nbytes = 0
        cmin = None
        cmax = None
        salt = None
        for pdf in batches:
            rows += len(pdf)
            if bytes_col is not None and bytes_col in pdf:
                nbytes += int(pdf[bytes_col].map(lambda b: len(b) if b is not None else 0).sum())
            if has_cell and len(pdf):
                lo = int(pdf[cell_col].min())
                hi = int(pdf[cell_col].max())
                cmin = lo if cmin is None else min(cmin, lo)
                cmax = hi if cmax is None else max(cmax, hi)
            if salt_col is not None and salt_col in pdf and len(pdf):
                salt = int(pdf[salt_col].iloc[0])
            out = pdf.copy()
            out["_lineage"] = None
            yield out
        wall = int((time.perf_counter() - t0) * 1000)
        tail = pd.DataFrame({c: [None] for c in in_cols})
        tail["_lineage"] = [
            {
                "partition_id": pid,
                "salt": salt,
                "cell_min": cmin,
                "cell_max": cmax,
                "row_count": rows,
                "bytes": nbytes,
                "wall_ms": wall,
            }
        ]
        yield tail

    return df.mapInPandas(wrap, out_schema)


class CheckpointStore:
    """Filesystem-rooted job/queue/stage/lineage store (Iceberg-analog)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        from tilecloud_chain_spark.checkpoint.merge import MergeTable

        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "jobs"), exist_ok=True)
        # stage-status control plane: Iceberg-shaped MERGE/DELETE table —
        # every transition below is a logged MERGE INTO / DELETE FROM, so a
        # real Iceberg catalog is a drop-in (see checkpoint/merge.py)
        self._status = MergeTable(
            os.path.join(root, "status"),
            ["job_id", "stage", "zoom", "status", "started_at", "error", "wall_s", "at"],
        )

    # -- jobs (reference job table, store/postgresql.py:143-167) ------------

    def create_job(self, name: str, command: str = "") -> str:
        job_id = uuid.uuid4().hex[:12]
        self._append_marker(
            os.path.join(self.root, "jobs", f"{job_id}.json"),
            {
                "job_id": job_id,
                "name": name,
                "command": command,
                "status": "created",
                "created_at": time.time(),
            },
        )
        return job_id

    def job(self, job_id: str) -> dict:
        with open(os.path.join(self.root, "jobs", f"{job_id}.json")) as f:
            return json.load(f)

    def _append_marker(self, path: str, payload: dict) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)  # atomic on POSIX — the "snapshot commit"

    # -- queue (reference queue table, store/postgresql.py:170-194) ---------

    def enqueue(self, job_id: str, metatiles: DataFrame) -> int:
        """Append work rows (the master role's queue put, generate.py:164-168).
        Returns meta_tiles_total (store/postgresql.py:285-290)."""
        path = os.path.join(self.root, "queue", f"job={job_id}")
        metatiles.write.mode("append").partitionBy("z").parquet(path)
        n = self.spark.read.parquet(path).count()
        j = self.job(job_id)
        j["meta_tiles_total"] = n
        j["status"] = "started"
        self._append_marker(os.path.join(self.root, "jobs", f"{job_id}.json"), j)
        return n

    def queue(self, job_id: str, zoom: int | None = None) -> DataFrame:
        df = self.spark.read.parquet(os.path.join(self.root, "queue", f"job={job_id}"))
        if zoom is not None:
            df = df.filter(F.col("z") == zoom)
        return df

    # -- stages ---------------------------------------------------------------

    def _stage_dir(self, job_id: str, stage: str, zoom: int) -> str:
        return os.path.join(self.root, "stages", f"job={job_id}", f"stage={stage}", f"z={zoom}")

    def set_status(self, job_id: str, stage: str, zoom: int, status: str,
                   **extra) -> None:
        """One status transition = one MERGE INTO (upsert on the stage key)."""
        self._status.merge(
            [{"job_id": job_id, "stage": stage, "zoom": int(zoom),
              "status": status, "at": time.time(), **extra}],
            on=["job_id", "stage", "zoom"],
        )

    def stage_status(self, job_id: str, stage: str, zoom: int) -> str:
        df = self._status.read()
        if not len(df):
            return "created"
        hit = df[(df.job_id == job_id) & (df.stage == stage) & (df.zoom == zoom)]
        return str(hit.iloc[0]["status"]) if len(hit) else "created"

    def run_stage(
        self,
        job_id: str,
        stage: str,
        zoom: int,
        build: Callable[[], DataFrame],
        cell_col: str = "cell",
        bytes_col: str | None = None,
    ) -> dict:
        """Execute one per-zoom stage exactly once.

        Skips when already ``done`` (exact resume); on failure the marker is
        ``error`` and a later ``run_stage``/``retry_errors`` re-executes —
        only error/uncommitted stages re-run, done stages are untouched
        (reference retry parity, store/postgresql.py:443-477).
        """
        status = self.stage_status(job_id, stage, zoom)
        if status == "done":
            return {"skipped": True, "status": "done"}
        self.set_status(job_id, stage, zoom, "pending", started_at=time.time())
        out_dir = self._stage_dir(job_id, stage, zoom)
        tmp_dir = f"{out_dir}.inprogress-{uuid.uuid4().hex}"
        t0 = time.perf_counter()
        try:
            df = build()
            with_lin = with_lineage(df, cell_col=cell_col, bytes_col=bytes_col)
            with_lin.write.mode("overwrite").parquet(tmp_dir)
            if os.path.exists(out_dir):  # failed earlier attempt's partial data
                import shutil

                shutil.rmtree(out_dir)
            os.makedirs(os.path.dirname(out_dir), exist_ok=True)
            os.replace(tmp_dir, out_dir)  # atomic publish of data+lineage
        except Exception as exc:
            self.set_status(job_id, stage, zoom, "error", error=str(exc)[:2000])
            raise
        wall = time.perf_counter() - t0
        self.set_status(job_id, stage, zoom, "done", wall_s=round(wall, 3))
        return {"skipped": False, "status": "done", "wall_s": wall}

    def requeue_stale_pending(self, job_id: str, max_pending_minutes: float = 10.0) -> list[tuple[str, int]]:
        """ST2 — lost-worker recovery: pending stages older than
        ``max_pending_minutes`` (reference default 10, configuration.py:2348;
        maintenance loop store/postgresql.py:700-713) reset to created so a
        later run re-executes the stage. One ``DELETE FROM status WHERE
        status='pending' AND started_at < cutoff`` (Iceberg row-level op)."""
        cutoff = time.time() - max_pending_minutes * 60
        gone = self._status.delete_where(
            f"job_id == {job_id!r} and status == 'pending' and started_at < {cutoff!r}"
        )
        return [(r["stage"], int(r["zoom"])) for r in gone]

    def retry_errors(self, job_id: str) -> list[tuple[str, int]]:
        """Reset error stages to created (requeue-only-errors, reference
        store/postgresql.py:443-477). One ``DELETE FROM status WHERE
        status='error'``. Returns the (stage, zoom) pairs reopened."""
        gone = self._status.delete_where(
            f"job_id == {job_id!r} and status == 'error'"
        )
        return [(r["stage"], int(r["zoom"])) for r in gone]

    # -- reads ----------------------------------------------------------------

    def output(self, job_id: str, stage: str, zoom: int | None = None) -> DataFrame:
        base = os.path.join(self.root, "stages", f"job={job_id}", f"stage={stage}")
        path = base if zoom is None else os.path.join(base, f"z={zoom}")
        df = self.spark.read.option("recursiveFileLookup", "true").parquet(path)
        return df.filter(F.col("_lineage").isNull()).drop("_lineage")

    def lineage(self, job_id: str, stage: str | None = None) -> DataFrame:
        base = os.path.join(self.root, "stages", f"job={job_id}")
        if stage is not None:
            base = os.path.join(base, f"stage={stage}")
        df = self.spark.read.option("recursiveFileLookup", "true").parquet(base)
        return df.filter(F.col("_lineage").isNotNull()).select("_lineage.*")

    def report(self, job_id: str) -> dict:
        """A1/A5 rollup: totals + throughput from lineage (the reference's
        end-of-run report, generate.py:410-482)."""
        lin = self.lineage(job_id)
        agg = lin.agg(
            F.sum("row_count").alias("rows"),
            F.sum("bytes").alias("bytes"),
            F.sum("wall_ms").alias("cpu_ms"),
            F.count("*").alias("partitions"),
        ).collect()[0]
        rows = agg["rows"] or 0
        return {
            "job_id": job_id,
            "rows": rows,
            "bytes": int(agg["bytes"] or 0),
            "partitions": agg["partitions"],
            "cpu_ms": int(agg["cpu_ms"] or 0),
            "ms_per_row": (float(agg["cpu_ms"]) / rows) if rows else None,
        }
