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
    minhash_dedup_pairs,
)


def image_caption_dedup(
    imgs: DataFrame,
    max_hamming: int = 6,
    id_col: str = "image_id",
    phash_col: str = "phash",
    caption_col: str = "caption",
    caption_near_threshold: float | None = None,
    caption_shingle_k: int = 3,
    caption_max_bucket: int | None = None,
) -> DataFrame:
    """Dedup the image+caption table: (id_col, dup_group, keep) — one row
    per input image, ``dup_group`` = min id of its duplicate component,
    ``keep`` true on the surviving (min-id) row.

    Duplicate edge when captions are exactly equal OR phash hamming
    distance <= ``max_hamming``; duplicate groups are connected components
    of the union graph (a near-dup of a caption-dup is a dup of both).

    ``caption_near_threshold`` adds a third edge family: captions that are
    NEAR-duplicates (shingle-Jaccard >= threshold via the engine's
    MinHash-LSH path) also connect — catching the re-encoded image whose
    caption was trivially edited ("my dog!" vs "my dog") AND whose phash
    drifted past ``max_hamming``, which the exact families both miss. The
    LSH runs over one representative per DISTINCT caption (the kind=0
    slice of the same aggregate the star edges use), so a caption flood —
    10^9 copies of one stock caption — enters shingling/banding ONCE and
    stays O(n) end-to-end; exact-duplicate members reach the near-edge
    through their caption-exact star. ``caption_max_bucket`` passes
    through as the LSH degenerate-bucket backstop (default None = exact
    LSH semantics, required for the cross-engine oracle).

    Both exact-group star families (caption-equal, phash-equal) ride ONE
    min-agg + ONE join: each row explodes to its (kind, key) group keys,
    the per-key min id comes back as the star center, and the phash-rep
    table the hamming block join needs falls out of the same aggregate
    (kind=1 slice) instead of its own groupBy. Captions enter the shuffle
    as a two-seed ``xxhash64`` pair (128 effective bits — a false key
    collision needs ~2^64 DISTINCT captions, vastly beyond any corpus),
    never as raw strings: at 10^12 rows that is the difference between
    shuffling 16-byte keys and shuffling full caption bytes, twice.
    NULL captions / NULL phashes contribute no group keys (matching the
    previous inner-join semantics: an absent caption equals nothing)."""
    base = imgs.select(
        F.col(id_col), F.col(phash_col).alias("_ph"), F.col(caption_col).alias("_cap")
    ).localCheckpoint(eager=False)  # referenced by the edge builders + final
    # join; LAZY — the reps aggregation below is the first action and
    # materializes it in the same job (r8: each eager ckpt here was a
    # dedicated ~0.3 s toy-scale job)

    cap_key = F.struct(
        F.lit(0).alias("kind"),
        F.xxhash64("_cap").alias("k1"),
        F.xxhash64(F.lit("s1"), F.col("_cap")).alias("k2"),
    )
    ph_key = F.struct(
        F.lit(1).alias("kind"), F.col("_ph").alias("k1"), F.lit(0).alias("k2")
    )
    keys = F.filter(
        F.array(
            F.when(F.col("_cap").isNotNull(), cap_key),
            F.when(F.col("_ph").isNotNull(), ph_key),
        ),
        lambda s: s.isNotNull(),
    )
    keyed = base.select(F.col(id_col), F.explode(keys).alias("k")).select(
        id_col, "k.kind", "k.k1", "k.k2"
    )
    # materialized once: referenced by the star join, the hamming block
    # join's flood probe + both self-join sides, and (with caption_near)
    # the caption-rep semi-join — unmaterialized, the group aggregate
    # would re-run per reference
    # LAZY ckpt: int64_near_pairs' flood probe is the first action and
    # materializes this (and base) in one job
    reps = keyed.groupBy("kind", "k1", "k2").agg(
        F.min(id_col).alias("_rep")
    ).localCheckpoint(eager=False)
    star_edges = (
        keyed.join(reps, ["kind", "k1", "k2"])
        .filter(F.col(id_col) != F.col("_rep"))
        .select(F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    # hamming-near edges between DISTINCT phash values (one min-id rep per
    # value; hamming 0 cannot occur across distinct values, so these are
    # exactly the 1..max_hamming pairs)
    ph_reps = reps.filter(F.col("kind") == 1).select(
        F.col("k1").alias("_ph"), F.col("_rep").alias("id")
    )
    # distinct_pairs=False: these edges feed connected components, which
    # tolerates the per-agreeing-block duplicates — one exchange fewer
    near_edges = int64_near_pairs(
        ph_reps, max_hamming, hash_col="_ph", id_col="id", materialize=False,
        distinct_pairs=False,
    ).select("id_a", "id_b")

    edges = star_edges.unionAll(near_edges)
    if caption_near_threshold is not None:
        # one representative per DISTINCT caption: reuse the kind=0 slice
        # of the star aggregate (no second caption groupBy); reps pick
        # their caption text back up with a semi-join, so only (id, hash)
        # ever crossed the group shuffle
        cap_rep_ids = reps.filter(F.col("kind") == 0).select(
            F.col("_rep").alias(id_col)
        )
        cap_texts = base.join(cap_rep_ids, id_col, "left_semi").select(
            id_col, "_cap"
        )
        cap_near = minhash_dedup_pairs(
            cap_texts,
            threshold=caption_near_threshold,
            k=caption_shingle_k,
            text_col="_cap",
            id_col=id_col,
            # input is already one row per distinct caption — the md5
            # collapse would be a pure no-op pass
            collapse_exact=False,
            max_bucket=caption_max_bucket,
        ).select("id_a", "id_b")
        edges = edges.unionAll(cap_near)
    # sparse CC output — the left join + coalesce below supplies the
    # singleton/root rows (identical dup_group labels, fewer jobs)
    cc = connected_components(edges, emit_singletons=False)
    out = base.join(
        cc.withColumnRenamed("id", id_col), id_col, "left"
    )
    grp = F.coalesce("component", F.col(id_col))
    return out.select(
        F.col(id_col),
        grp.alias("dup_group"),
        (grp == F.col(id_col)).alias("keep"),
    )
