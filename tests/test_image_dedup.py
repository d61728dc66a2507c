"""Image+caption pair-level dedup (operators/image_dedup.py) — the dedup
of the north-rule (image_id, bytes, w, h, fmt, caption, phash) table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilecloud_chain_spark.config import SWISSGRID_5
from tilecloud_chain_spark.functions import image as IMG
from tilecloud_chain_spark.operators.image_dedup import image_caption_dedup
from tilecloud_chain_spark.sources.images import synth_images


def _brute_components(rows, max_hamming):
    """Union-find over caption-equal OR phash-near edges."""
    parent = {r["image_id"]: r["image_id"] for r in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            if a["caption"] == b["caption"] or IMG.hamming64(
                a["phash"], b["phash"]
            ) <= max_hamming:
                union(a["image_id"], b["image_id"])
    return {r["image_id"]: find(r["image_id"]) for r in rows}


def test_image_caption_dedup_real_images(spark):
    """Real codec path: a decoded-then-slightly-perturbed re-encode is a
    phash near-dup; an exact caption copy with different pixels links via
    the caption edge; both fold into one component with the original."""
    base = synth_images(spark, 12, SWISSGRID_5, size=32).select(
        "image_id", "bytes", "fmt", "caption", "phash"
    )
    rows = [r.asDict() for r in base.collect()]

    # near-dup: decode real PNG bytes, nudge one pixel, re-encode, re-phash
    src = rows[0]
    px = IMG.decode(src["bytes"], src["fmt"]).copy()
    px[0, 0] = np.clip(px[0, 0].astype(int) + 2, 0, 255).astype(px.dtype)
    near = dict(src)
    near["image_id"] = "img_near_dup"
    near["bytes"] = IMG.encode(px, src["fmt"])
    near["phash"] = IMG.phash64(px)
    near["caption"] = "a completely different caption"
    assert 0 < IMG.hamming64(near["phash"], src["phash"]) <= 6 or (
        near["phash"] == src["phash"]
    )

    # caption-dup: same caption, unrelated pixels (far phash)
    other = dict(rows[5])
    capdup = dict(rows[1])
    capdup["image_id"] = "img_cap_dup"
    capdup["caption"] = rows[0]["caption"]
    capdup["phash"] = other["phash"] ^ 0x5A5A5A5A5A5A5A5  # far from everything
    all_rows = rows + [near, capdup]

    df = spark.createDataFrame(
        [(r["image_id"], r["caption"], r["phash"]) for r in all_rows],
        "image_id string, caption string, phash long",
    )
    got = {
        r.image_id: (r.dup_group, r.keep)
        for r in image_caption_dedup(df, max_hamming=6).collect()
    }
    want = _brute_components(all_rows, 6)
    assert len(got) == len(all_rows)
    for rid, comp in want.items():
        assert got[rid][0] == comp, rid
        assert got[rid][1] == (comp == rid), rid
    # the injected rows actually landed with the original
    assert want["img_near_dup"] == rows[0]["image_id"]
    assert want["img_cap_dup"] == rows[0]["image_id"]


def test_image_caption_dedup_hot_groups_stay_linear(spark):
    """A hot exact group (same caption AND same phash, n copies) must
    produce O(n) star edges and ONE row in the hamming block join — the
    collapse-before-blocking design. Checked by correctness at a size
    where all-pairs would already be 10^4 edges, plus the distinct-phash
    property on the near-join input."""
    import hashlib

    n = 200
    hot = [(f"h{i:05d}", "same caption", 77777) for i in range(n)]
    # well-separated hashes (md5-derived; consecutive ints like (i+1)<<20
    # would be hamming-2 neighbors of each other)
    def _h(i):
        v = int.from_bytes(hashlib.md5(b"img%d" % i).digest()[:8], "big")
        return v - (1 << 64) if v >= 1 << 63 else v

    singles = [(f"s{i:05d}", f"caption {i}", _h(i)) for i in range(20)]
    for i, (_, _, a) in enumerate(singles):
        for _, _, b in singles[i + 1:]:
            assert IMG.hamming64(a, b) > 2
        assert IMG.hamming64(a, 77777) > 2
    df = spark.createDataFrame(
        hot + singles, "image_id string, caption string, phash long"
    )
    out = image_caption_dedup(df, max_hamming=2)
    res = {r.image_id: (r.dup_group, r.keep) for r in out.collect()}
    for rid, _, _ in hot:
        assert res[rid] == ("h00000", rid == "h00000")
    for rid, _, _ in singles:
        assert res[rid][1] is True


def test_image_caption_dedup_no_python_in_plan(spark):
    """Everything before CC is codegen'd Column math — no Python eval."""
    df = spark.createDataFrame(
        [(f"i{k}", f"c{k % 3}", k * 9973) for k in range(30)],
        "image_id string, caption string, phash long",
    )
    out = image_caption_dedup(df, max_hamming=4)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_image_caption_dedup_caption_near_edges(spark):
    """caption_near_threshold links the re-encoded image whose caption was
    trivially edited AND whose phash drifted past the radius — the case
    both exact families miss (r6 verdict). Also: a caption FLOOD (many
    copies of one caption) reaches the near-edge through its exact star —
    the LSH only ever sees one representative per distinct caption."""
    import hashlib

    boiler = "a very nice stock photo of a happy dog playing in the park"
    near = boiler.replace("happy", "joyful")  # shingle-Jaccard 8/14 ≈ 0.57
    far_cap = "completely different words about an unrelated topic entirely"

    def _h(i):  # md5-derived, mutually well-separated (asserted below —
        # single-bit constants would be hamming-2 of EACH OTHER)
        v = int.from_bytes(hashlib.md5(b"cn%d" % i).digest()[:8], "big")
        return v - (1 << 64) if v >= 1 << 63 else v

    rows = (
        # id 0: original; id 1: near caption + far phash — links ONLY via
        # the caption-near family
        [(0, boiler, _h(0)), (1, near, _h(1))]
        # flood: 50 exact copies of the original caption, far phashes
        + [(10 + i, boiler, _h(10 + i)) for i in range(50)]
        # control singleton: far in caption and phash
        + [(500, far_cap, _h(500))]
    )
    phs = [p for _, _, p in rows]
    for i, a in enumerate(phs):
        for b in phs[i + 1:]:
            assert IMG.hamming64(a, b) > 6
    df = spark.createDataFrame(rows, "image_id long, caption string, phash long")

    out = {r.image_id: (r.dup_group, r.keep) for r in
           image_caption_dedup(df, max_hamming=6).collect()}
    assert out[1] == (1, True)  # without near edges: id 1 is a singleton

    out = {r.image_id: (r.dup_group, r.keep) for r in
           image_caption_dedup(df, max_hamming=6,
                               caption_near_threshold=0.5).collect()}
    assert out[0] == (0, True)
    assert out[1] == (0, False)  # joined through the caption-near edge
    for i in range(50):
        assert out[10 + i] == (0, False)  # flood rides its exact star
    assert out[500] == (500, True)
