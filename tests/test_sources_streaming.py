"""Tiles-file source, cache listing round-trip, queue streaming semantics."""

import os

import pytest
from pyspark.sql import functions as F

from tilecloud_chain_spark.checkpoint import CheckpointStore
from tilecloud_chain_spark.sources.tiles_file import (
    invalid_lines,
    list_cache,
    read_tiles_file,
    write_cache,
)
from tilecloud_chain_spark.streaming import queue_stream as QS


def test_read_tiles_file(spark, tmp_path):
    p = tmp_path / "tiles.txt"
    p.write_text(
        "0/5/6\n"
        "1/10/12:+8/+8 layer=line dimension_DATE=2012\n"
        "\n"
        "garbage line\n"
        "4/100/200 host=example.com\n"
    )
    df = read_tiles_file(spark, str(p))
    rows = {(r.z, r.x, r.y, r.n): dict(r.metadata) for r in df.collect()}
    assert rows[(0, 5, 6, 1)] == {}
    assert rows[(1, 10, 12, 8)] == {"layer": "line", "dimension_DATE": "2012"}
    assert rows[(4, 100, 200, 1)] == {"host": "example.com"}
    assert invalid_lines(spark, str(p)).count() == 1  # 'garbage line'


def test_cache_write_list_roundtrip(spark, tmp_path):
    root = str(tmp_path / "cache")
    df = spark.createDataFrame(
        [
            ("line", "default", "2012", 0, 5, 6, "png", bytearray(b"abc")),
            ("line", "default", "2012", 0, 7, 4, "png", bytearray(b"xyz")),
        ],
        "layer string, style string, dims string, z int, x int, y int, ext string, data binary",
    )
    write_cache(df, root, "swissgrid_5")
    # reference layout: 1.0.0/{layer}/{style}/{dims}/{matrixset}/{z}/{y}/{x}.{ext}
    assert os.path.exists(os.path.join(root, "1.0.0/line/default/2012/swissgrid_5/0/6/5.png"))
    back = list_cache(spark, root)
    rows = {(r.z, r.x, r.y): bytes(r.data) for r in back.collect()}
    assert rows == {(0, 5, 6): b"abc", (0, 7, 4): b"xyz"}
    r0 = back.collect()[0]
    assert (r0.layer, r0.style, r0.dims, r0.matrixset) == ("line", "default", "2012", "swissgrid_5")


def test_cache_roundtrip_resolution_matrix_identifier(spark, tmp_path):
    """Grids with matrix_identifier='resolution' store non-numeric TileMatrix
    path segments (e.g. '0_1'); write_cache must emit them and list_cache must
    map them back to the zoom index through the grid's identifier table."""
    from tilecloud_chain_spark.config import GRIDS

    grid = GRIDS["swissgrid_01"]
    idents = grid.matrix_identifiers()
    assert idents[-1] == "0_1" and "." not in "".join(idents)

    root = str(tmp_path / "cache01")
    zmax = len(grid.resolutions) - 1
    df = spark.createDataFrame(
        [("point", "default", "", zmax, 11, 22, "png", bytearray(b"p1")),
         ("point", "default", "", 0, 1, 2, "png", bytearray(b"p2"))],
        "layer string, style string, dims string, z int, x int, y int, ext string, data binary",
    )
    write_cache(df, root, grid)
    assert os.path.exists(
        os.path.join(root, "1.0.0/point/default/swissgrid_01/0_1/22/11.png")
    )
    back = list_cache(spark, root, grid=grid)
    rows = {(r.z, r.x, r.y): r.matrix for r in back.collect()}
    assert rows == {(zmax, 11, 22): "0_1", (0, 1, 2): idents[0]}


@pytest.fixture()
def store_job(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ck"))
    job_id = store.create_job("stream-test")
    q = spark.createDataFrame(
        [(z, 0, 0, 1, z) for z in range(3)], "z int, x int, y int, n int, cell long"
    )
    store.enqueue(job_id, q)
    return store, job_id


def test_drain_processes_all_then_stops(spark, store_job):
    store, job_id = store_job

    def build_for_zoom(z):
        return lambda: store.queue(job_id, z).select("z", "x", "y", "cell")

    res = QS.drain(store, job_id, "tiles", build_for_zoom)
    assert res["done"] == [0, 1, 2]
    assert QS.pending_stages(store, job_id, "tiles") == []
    # a second drain is a no-op
    res2 = QS.drain(store, job_id, "tiles", build_for_zoom)
    assert res2["done"] == []


def test_drain_retries_errors_bounded(spark, store_job):
    store, job_id = store_job
    fails = {"n": 0}

    def build_for_zoom(z):
        def build():
            if z == 1 and fails["n"] < 2:
                fails["n"] += 1
                raise RuntimeError("flaky")
            return store.queue(job_id, z).select("z", "x", "y", "cell")

        return build

    res = QS.drain(store, job_id, "tiles", build_for_zoom, max_retries=5)
    assert fails["n"] == 2  # failed twice, then succeeded
    assert set(res["done"]) == {0, 1, 2}


def test_circuit_breaker(spark, store_job):
    store, job_id = store_job

    def build_for_zoom(z):
        def build():
            raise RuntimeError("always broken")

        return build

    with pytest.raises(QS.TooManyErrorsError):
        QS.drain(store, job_id, "tiles", build_for_zoom,
                 max_retries=50, max_consecutive_errors=4)


def test_structured_streaming_drain(spark, store_job, tmp_path):
    """Genuine Structured Streaming over the queue dir: availableNow drains
    the existing files through foreachBatch, then stops."""
    store, job_id = store_job
    seen = []

    def handler(batch_df, batch_id):
        seen.append(batch_df.count())

    QS.stream_queue_files(
        spark,
        os.path.join(store.root, "queue", f"job={job_id}"),
        str(tmp_path / "stream-ckpt"),
        handler,
        schema="x int, y int, n int, cell long",  # z is a partition dir
    )
    assert sum(seen) == 3


def test_error_file_roundtrip(spark, tmp_path):
    """Error lines in the reference's log_tiles_error format re-import
    through the tiles-file source (the reference's retry-from-error-file
    workflow): coords + metadata survive, the '# [ts] message' tail is
    ignored by the parser."""
    from tilecloud_chain_spark.operators.postprocess import error_file_lines

    df = spark.createDataFrame(
        [(1, 10, 12, 8, {"layer": "line"}, "WMS error\ntimeout"),
         (4, 100, 200, 1, {"layer": "line", "dimension_DATE": "2012"}, None)],
        "z int, x int, y int, n int, metadata map<string,string>, error string",
    )
    lines = error_file_lines(df, "12-08-2026 10:00:00")
    vals = sorted(r.value for r in lines.collect())
    assert vals[0] == "1/10/12:+8/+8 layer=line # [12-08-2026 10:00:00] WMS error timeout"
    assert vals[1] == "4/100/200 dimension_DATE=2012 layer=line # [12-08-2026 10:00:00]"

    p = tmp_path / "errors.txt"
    p.write_text("# [12-08-2026 10:00:00] Start the layer 'line' generation\n"
                 + "\n".join(vals) + "\n")
    back = read_tiles_file(spark, str(p))
    rows = {(r.z, r.x, r.y, r.n): dict(r.metadata) for r in back.collect()}
    assert rows == {
        (1, 10, 12, 8): {"layer": "line"},
        (4, 100, 200, 1): {"dimension_DATE": "2012", "layer": "line"},
    }
    assert invalid_lines(spark, str(p)).count() == 1  # the '# Start' header


def test_streaming_render_pipeline_golden(spark, tmp_path):
    """ST1 capstone — the reference's daemon mode as Structured Streaming:
    queued metatiles arrive as files, each micro-batch runs the REAL image
    path (render -> hash-drop empty metatiles -> split -> drop empty
    children -> write WMTS cache), availableNow drains then stops, and the
    cache holds exactly the reference's golden stored set."""
    import hashlib

    from tilecloud_chain_spark import geometry as G
    from tilecloud_chain_spark.config import LAYERS, SWISSGRID_5
    from tilecloud_chain_spark.operators import filters as FL
    from tilecloud_chain_spark.operators import raster as R
    from tilecloud_chain_spark.sources.tiles_file import write_cache

    grid = SWISSGRID_5
    geom = G.parse_wkt(LAYERS["line"].geom_wkt)
    geoms = {0: geom}
    qdir = tmp_path / "queue"
    spark.createDataFrame([(0, 0, 0, 8, 0)],
                          "z int, x int, y int, n int, cell long") \
        .write.mode("append").parquet(str(qdir))
    cache = str(tmp_path / "cache")
    empty_hash = hashlib.sha256(R.empty_tile_bytes(256)).hexdigest()

    def handle(batch_df, batch_id):
        metas = batch_df.select("z", "x", "y", "n")
        rendered = R.render_metatiles(metas, grid, geoms, meta_buffer=128)
        children = R.split_metatile_images(
            rendered, tile_size=256, meta_buffer=128,
            clamp_matrix=grid.matrix_size(0),
        )
        stored = FL.hash_drop(children, empty_hash)
        tiles = stored.select(
            F.lit("line").alias("layer"), F.lit("default").alias("style"),
            F.lit("").alias("dims"), "z", "x", "y",
            F.lit("png").alias("ext"), "data",
        )
        write_cache(tiles, cache, grid)

    QS.stream_queue_files(
        spark, str(qdir), str(tmp_path / "ckpt"), handle,
        schema="z int, x int, y int, n int, cell long",
    )
    found = set()
    for root, _, files in os.walk(cache):
        for f in files:
            found.add(os.path.relpath(os.path.join(root, f), cache))
    assert found == {
        f"1.0.0/line/default/swissgrid_5/0/{y}/{x}.png"
        for x, y in [(6, 5), (7, 5), (5, 6), (6, 6), (4, 7), (5, 7)]
    }


def test_stream_ingest_corpus_cross_batch_dedup(spark, tmp_path):
    """Streaming corpus admission: batch 1 drops its internal duplicate and
    low-quality rows; a LATER drain (new stream, same state) re-admits
    nothing already seen and accepts only genuinely new docs."""
    from tilecloud_chain_spark.streaming.corpus_stream import drain_ingest

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    good = " ".join(f"alpha{i}" for i in range(70))   # long, all-distinct -> quality 1.0
    good2 = " ".join(f"beta{i}" for i in range(70))
    spark.createDataFrame(
        [(1, good), (2, good), (3, "tiny")],  # 2 dups of 1... and junk
        "doc_id long, text string",
    ).write.parquet(inp)
    drain_ingest(spark, inp, out, state, ckpt, min_quality=0.9)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1}  # dup dropped (first wins), low-quality dropped

    # batch 2 arrives: one replay of doc 1's text, one new doc
    spark.createDataFrame(
        [(10, good), (11, good2)], "doc_id long, text string"
    ).write.mode("append").parquet(inp)
    drain_ingest(spark, inp, out, state, ckpt, min_quality=0.9)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 11}  # 10 is a cross-batch exact dup of 1

    # re-draining with nothing new is a no-op (file-source checkpoint)
    drain_ingest(spark, inp, out, state, ckpt, min_quality=0.9)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 11}


def test_corpus_ingest_replay_is_idempotent(spark, tmp_path):
    """Crash-replay semantics: re-running the foreachBatch body with the
    SAME batch_id (state already written by the first attempt) must rewrite
    the identical partitions — not drop the batch's rows by anti-joining
    against its own hashes (the data-loss mode of a naive overwrite)."""
    from tilecloud_chain_spark.streaming.corpus_stream import make_processor

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    process = make_processor(out, state, min_quality=0.0)
    doc = " ".join(f"tok{i}" for i in range(60))
    batch = spark.createDataFrame([(1, doc), (2, doc)], "doc_id long, text string")
    process(batch, 7)
    first = sorted((r.doc_id,) for r in spark.read.parquet(out).collect())
    assert first == [(1,)]  # in-batch dup dropped
    # replay: same batch, same id — state now already holds the hash
    process(batch, 7)
    again = sorted((r.doc_id,) for r in spark.read.parquet(out).collect())
    assert again == first  # NOT empty, NOT duplicated
    # and a LATER batch still dedups against batch 7
    process(spark.createDataFrame([(9, doc)], "doc_id long, text string"), 8)
    final = sorted((r.doc_id,) for r in spark.read.parquet(out).collect())
    assert final == [(1,)]
