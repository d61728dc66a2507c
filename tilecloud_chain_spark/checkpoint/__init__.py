"""Checkpoint / lineage / resume (SURVEY.md §7.1 step 9)."""

from tilecloud_chain_spark.checkpoint.store import CheckpointStore, with_lineage

__all__ = ["CheckpointStore", "with_lineage"]
