"""Post-processing transforms (SURVEY.md §2.2 F3, §2.10 SC5/SC11/SC12,
§2.10 SC6).

The reference pipes tile bytes through allow-listed external commands
(``Process``, /root/reference/tilecloud_chain/__init__.py:2757-2833; allowed
commands from settings :96, e.g. optipng). Shelling out per tile is the
antithesis of a vectorized engine, so the analog is a registry of NAMED
in-process transforms applied inside one Arrow-batched ``mapInPandas`` —
the allow-list semantics survive (only registered names run), the subprocess
does not.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tilecloud_chain_spark.functions import image as IMG


def _png_optimize(data: bytes) -> bytes:
    """optipng analog: re-encode at max deflate level (lossless)."""
    return IMG.png_encode(IMG.png_decode(data), compress_level=9)


def _png_quantize(data: bytes) -> bytes:
    """pngquant analog: 6-bit quantization (lossy, PSNR ~46dB)."""
    return IMG.qpng_encode(IMG.png_decode(data))


POST_PROCESSES: dict[str, Callable[[bytes], bytes]] = {
    "png_optimize": _png_optimize,
    "png_quantize": _png_quantize,
}


def post_process(df: DataFrame, name: str, data_col: str = "data") -> DataFrame:
    """F3 — apply an allow-listed named transform to the payload column.
    Unknown names raise (the reference rejects non-allow-listed commands,
    tilecloud_chain/__init__.py:2771-2782)."""
    if name not in POST_PROCESSES:
        raise ValueError(f"post-process {name!r} not in allow-list {sorted(POST_PROCESSES)}")
    fn = POST_PROCESSES[name]

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[data_col] = [fn(bytes(b)) if b is not None else None for b in pdf[data_col]]
            yield pdf

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(run, schema)


def uniform_alpha_check(data: bytes) -> tuple[bool, tuple[int, int, int, int] | None]:
    """SC5 — HashLogger's decoded-pixel uniformity check
    (tilecloud_chain/__init__.py:2580-2601): is the image one flat RGBA
    color (alpha-normalized: fully transparent pixels compare as
    (0,0,0,0))? Returns (is_uniform, color)."""
    img = IMG.png_decode(data)
    if img.shape[2] == 3:
        img = np.concatenate([img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=2)
    norm = img.copy()
    norm[norm[:, :, 3] == 0] = 0
    first = norm[0, 0]
    uniform = bool((norm == first).all())
    return uniform, tuple(int(v) for v in first) if uniform else None


# --- queue-message / framing codecs (SC11, SC12 — parity only) -------------


def queue_message_json(z: F.Column, x: F.Column, y: F.Column, n: F.Column,
                       metadata: F.Column) -> F.Column:
    """SC11 — serialize a metatile work message exactly like the reference's
    Postgres queue (store/postgresql.py:94-117): JSON {z,x,y,n,metadata}."""
    return F.to_json(F.struct(z.alias("z"), x.alias("x"), y.alias("y"),
                              n.alias("n"), metadata.alias("metadata")))


QUEUE_MESSAGE_SCHEMA = "struct<z: int, x: int, y: int, n: int, metadata: map<string,string>>"


def parse_queue_message(col: F.Column) -> F.Column:
    return F.from_json(col, QUEUE_MESSAGE_SCHEMA)


def redis_frame_encode(data: bytes, trailer: dict) -> bytes:
    """SC12 — the reference's Redis tile binary framing:
    struct.pack('q', len) + data + JSON trailer (internal_mapcache.py:37-50).
    Kept as a codec for parity tests only (columnar storage replaces it)."""
    return struct.pack("q", len(data)) + data + json.dumps(trailer).encode()


def redis_frame_decode(frame: bytes) -> tuple[bytes, dict]:
    (n,) = struct.unpack("q", frame[:8])
    return frame[8 : 8 + n], json.loads(frame[8 + n :].decode())


# --- report formatting (SC6, format.py:6-28) --------------------------------


def size_format(n: float) -> str:
    for unit in ("o", "Kio", "Mio", "Gio", "Tio"):
        if n < 1024 or unit == "Tio":
            return f"{n:.1f} {unit}" if unit != "o" else f"{int(n)} o"
        n /= 1024.0
    raise AssertionError  # pragma: no cover


def duration_format(ms: float) -> str:
    s = int(ms // 1000)
    d, s = divmod(s, 86400)
    h, s = divmod(s, 3600)
    m, s = divmod(s, 60)
    core = f"{h}:{m:02d}:{s:02d}"
    return f"{d} {core}" if d else core


def error_file_lines(
    tiles: DataFrame, timestamp: str, message_col: str = "error"
) -> DataFrame:
    """Reference tiles-in-error log lines (``log_tiles_error``,
    tilecloud_chain/__init__.py:1634-1654):
    ``{z}/{x}/{y}[:+n/+n] {metadata k=v …} # [{ts}] {message}``.

    ``timestamp`` is passed in (the reference stamps now(); a deterministic
    value keeps tests and retries reproducible). The produced lines parse
    BACK through ``sources.tiles_file.read_tiles_file`` — the reference
    feeds its error file to a later ``--tiles`` rerun, and so can we (the
    ``# …`` tail carries no ``=`` so the metadata parser ignores it)."""
    coord = F.concat_ws("/", F.col("z"), F.col("x"), F.col("y"))
    if "n" in tiles.columns:
        coord = F.concat(
            coord,
            F.when(F.col("n") > 1,
                   F.concat(F.lit(":+"), F.col("n"), F.lit("/+"), F.col("n"))
                   ).otherwise(F.lit("")),
        )
    pieces = [coord]
    if "metadata" in tiles.columns:
        kv = F.array_sort(F.transform(
            F.map_entries(F.col("metadata")),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ))
        pieces.append(F.concat_ws(" ", kv))
    msg = F.regexp_replace(F.coalesce(F.col(message_col), F.lit("")), r"\n", " ")
    tail = F.when(msg == "", F.lit(f"# [{timestamp}]")).otherwise(
        F.concat(F.lit(f"# [{timestamp}] "), msg)
    )
    pieces.append(tail)
    return tiles.select(F.concat_ws(" ", *pieces).alias("value"))
