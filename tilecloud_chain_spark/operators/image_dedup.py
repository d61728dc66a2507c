"""Image+caption pair-level dedup — THE dedup of the north-rule input
table (BASELINE.json input_hint: ``(image_id, bytes, w, h, fmt, caption,
phash)`` at 10^12 rows): two images are duplicates when their captions
are exactly equal OR their perceptual hashes are within a hamming radius;
duplicate groups are the connected components of that union graph, and
one row per group survives (min id).

No reference counterpart (the reference has no content dedup at all);
this composes the engine's existing text-dedup machinery — exact-group
star edges (``operators/dedup.py`` collapse pattern), pigeonhole int64
near-pairing (:func:`~tilecloud_chain_spark.operators.dedup.int64_near_pairs`),
and large-star/small-star connected components — over the image table.

Scale design (the same collapse-before-blocking argument measured flat in
SKEW_BENCH for text LSH):

- exact caption groups NEVER meet the join pairwise: a min-id star
  (rep -> member) contributes O(n) edges where all-pairs would be O(n²) —
  10^9 copies of one stock photo caption stay linear;
- exact phash groups likewise collapse to a min-id star;
- the hamming block join runs over DISTINCT phash values only (one rep
  per value), so a phash repeated 10^9 times enters each pigeonhole
  bucket ONCE — connectivity through the full group is preserved by its
  star edges;
- connected components runs over rep-level edges, O(log n) rounds.

Everything before CC is codegen'd Column math — no Python in the path
(the phash column is an input, computed once at ingest by the Arrow
decode stage, ``sources/images.py`` / ``sources/media.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tilecloud_chain_spark.operators.dedup import (
    connected_components,
    int64_near_pairs,
)


def _star_edges(df: DataFrame, group_col: str, id_col: str) -> DataFrame:
    """O(n) min-id star edges (rep, member) per exact-duplicate group —
    map-side-combinable min agg + join, never a group-partitioned window."""
    reps = df.groupBy(group_col).agg(F.min(id_col).alias("_rep"))
    return (
        df.join(reps, group_col)
        .filter(F.col(id_col) != F.col("_rep"))
        .select(F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"))
    )


def image_caption_dedup(
    imgs: DataFrame,
    max_hamming: int = 6,
    id_col: str = "image_id",
    phash_col: str = "phash",
    caption_col: str = "caption",
) -> DataFrame:
    """Dedup the image+caption table: (id_col, dup_group, keep) — one row
    per input image, ``dup_group`` = min id of its duplicate component,
    ``keep`` true on the surviving (min-id) row.

    Duplicate edge when captions are exactly equal OR phash hamming
    distance <= ``max_hamming``; duplicate groups are connected components
    of the union graph (a near-dup of a caption-dup is a dup of both)."""
    base = imgs.select(
        F.col(id_col), F.col(phash_col).alias("_ph"), F.col(caption_col).alias("_cap")
    ).localCheckpoint(eager=True)  # referenced by 3 edge builders + final join

    cap_edges = _star_edges(base, "_cap", id_col)
    ph_edges = _star_edges(base, "_ph", id_col)
    # hamming-near edges between DISTINCT phash values (one min-id rep per
    # value; hamming 0 cannot occur across distinct values, so these are
    # exactly the 1..max_hamming pairs)
    ph_reps = base.groupBy("_ph").agg(F.min(id_col).alias("id"))
    near_edges = int64_near_pairs(
        ph_reps, max_hamming, hash_col="_ph", id_col="id", materialize=False
    ).select("id_a", "id_b")

    edges = cap_edges.unionAll(ph_edges).unionAll(near_edges)
    cc = connected_components(edges)
    out = base.join(
        cc.withColumnRenamed("id", id_col), id_col, "left"
    )
    grp = F.coalesce("component", F.col(id_col))
    return out.select(
        F.col(id_col),
        grp.alias("dup_group"),
        (grp == F.col(id_col)).alias("keep"),
    )
