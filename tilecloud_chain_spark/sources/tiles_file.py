"""Tiles-file source (SURVEY.md §2.1 S3) and cache listing (S6).

S3: the reference parses text lines ``z/x/y`` or ``z/x/y:+n/+n`` with
optional trailing ``key=value`` metadata pairs into Tiles
(``TilesFileStore.list()`` /root/reference/tilecloud_chain/__init__.py:2842-2872;
coordinate syntax ``parse_tilecoord`` :2735-2754). Here: ``spark.read.text``
+ regexp column expressions — fully distributed, no Python parsing.

S6: the reference walks the WMTS filesystem layout back to tilecoords
(``FilesystemTileStore.list()``, store/filesystem.py:56-64). Here:
``spark.read.format("binaryFile")`` + path regex -> (layer, style, dims,
matrix, y, x). NOTE the reference's path order is z/y/x
(row before column, tilecloud_chain/__init__.py:1354-1363).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_COORD_RE = r"^(\d+)/(\d+)/(\d+)(?::\+(\d+)/\+(\d+))?"


def read_tiles_file(spark: SparkSession, path: str) -> DataFrame:
    """Parse a tiles file -> DataFrame[z, x, y, n, metadata map].

    Lines: ``z/x/y`` (n=1) or ``z/x/y:+n/+n`` (metatile), optionally followed
    by space-separated ``key=value`` pairs. Malformed lines are dropped
    (the reference raises per line; a distributed reader quarantines them —
    use ``invalid_lines`` to audit).
    """
    raw = spark.read.text(path).filter(F.trim("value") != "")
    z = F.regexp_extract("value", _COORD_RE, 1)
    x = F.regexp_extract("value", _COORD_RE, 2)
    y = F.regexp_extract("value", _COORD_RE, 3)
    n = F.regexp_extract("value", _COORD_RE, 4)
    parsed = raw.select(
        "value",
        z.alias("zs"), x.alias("xs"), y.alias("ys"), n.alias("ns"),
    ).filter(F.col("zs") != "")
    meta_part = F.regexp_replace("value", _COORD_RE, "")
    kv = F.filter(F.split(F.trim(meta_part), r"\s+"), lambda s: s.contains("="))
    return parsed.select(
        F.col("zs").cast("int").alias("z"),
        F.col("xs").cast("int").alias("x"),
        F.col("ys").cast("int").alias("y"),
        F.when(F.col("ns") == "", 1).otherwise(F.col("ns").cast("int")).alias("n"),
        F.map_from_arrays(
            F.transform(kv, lambda s: F.split(s, "=")[0]),
            F.transform(kv, lambda s: F.split(s, "=")[1]),
        ).alias("metadata"),
    )


def invalid_lines(spark: SparkSession, path: str) -> DataFrame:
    """Audit: lines that do not parse as tile coordinates."""
    raw = spark.read.text(path).filter(F.trim("value") != "")
    return raw.filter(F.regexp_extract("value", _COORD_RE, 1) == "")


_PATH_RE = r"1\.0\.0/([^/]+)/([^/]+)/(?:(.+)/)?([^/]+)/([^/]+)/(\d+)/(\d+)\.(\w+)$"


def list_cache(
    spark: SparkSession, root: str, with_data: bool = True, grid=None
) -> DataFrame:
    """Walk a WMTS filesystem cache back to tile rows
    [layer, style, dims, matrixset, matrix, z, y, x, ext(, data)].

    The TileMatrix path segment is NOT always numeric — grids with
    ``matrix_identifier='resolution'`` store e.g. ``.../0_1/123/456.png``
    (reference ``get_tile_matrix_identifier``), so the matrix group matches
    ``[^/]+`` and is mapped back to the zoom index through ``grid``'s
    identifier table when one is supplied (plain int cast otherwise)."""
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    df = reader.load(root)
    matrix = F.regexp_extract("path", _PATH_RE, 5)
    if grid is not None:
        idents = grid.matrix_identifiers()
        z = F.coalesce(
            *[F.when(matrix == ident, F.lit(z)) for z, ident in enumerate(idents)],
            F.lit(None).cast("int"),
        )
    else:
        z = F.when(matrix.rlike(r"^\d+$"), matrix.cast("int"))
    cols = [
        F.regexp_extract("path", _PATH_RE, 1).alias("layer"),
        F.regexp_extract("path", _PATH_RE, 2).alias("style"),
        F.regexp_extract("path", _PATH_RE, 3).alias("dims"),
        F.regexp_extract("path", _PATH_RE, 4).alias("matrixset"),
        matrix.alias("matrix"),
        z.alias("z"),
        F.regexp_extract("path", _PATH_RE, 6).cast("int").alias("y"),
        F.regexp_extract("path", _PATH_RE, 7).cast("int").alias("x"),
        F.regexp_extract("path", _PATH_RE, 8).alias("ext"),
    ]
    if with_data:
        cols.append(F.col("content").alias("data"))
    return df.filter(F.regexp_extract("path", _PATH_RE, 6) != "").select(*cols)


def write_cache(df: DataFrame, root: str, grid) -> int:
    """Filesystem sink for parity tests: write tile rows [layer, style,
    dims, z, x, y, ext, data] into the WMTS layout. Distributed via
    foreachPartition (each task writes its own files — the reference's
    ``put`` per tile, amortized per partition).

    ``grid`` is a Grid (the TileMatrix path segment comes from its
    ``matrix_identifiers()`` so resolution-named matrices round-trip with
    :func:`list_cache` and ``gridmath.wmts_path``); a plain string is
    accepted for backward compatibility and implies zoom-named matrices.

    Returns the number of tiles written (accumulator-counted in the same
    pass — callers must not pay a second full pipeline execution just to
    count; exact absent task retries, which can only overcount the
    display figure, never the files)."""
    import os

    if isinstance(grid, str):
        grid_name, idents = grid, None
    else:
        grid_name, idents = grid.name, grid.matrix_identifiers()
    written = df.sparkSession.sparkContext.accumulator(0)

    def write_part(rows):
        import sys

        for r in rows:
            if r.z is None:
                # a row whose matrix identifier did not resolve through this
                # grid (e.g. a foreign matrixset in the same cache) — skip
                # loudly instead of crashing the task on idents[None]
                print(
                    f"write_cache: skipping tile with unresolved zoom "
                    f"(layer={r.layer}, matrixset mismatch?)", file=sys.stderr,
                )
                continue
            ident = str(r.z) if idents is None else idents[r.z]
            path = os.path.join(
                root, "1.0.0", r.layer, r.style,
                *([r.dims] if r.dims else []),
                grid_name, ident, str(r.y), f"{r.x}.{r.ext}",
            )
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.write(bytes(r.data))
            written.add(1)

    df.foreachPartition(write_part)
    return written.value
