"""As-of join — for each left row, the most recent right row with
``right.ts <= left.ts`` per key (the time-series enrichment join Spark has
no built-in for; task-brief custom-operator mandate).

Scale shape: the naive formulation is a range join (left x right per key,
filter ts, window max) — quadratic per key. This implementation is the
union + last-non-null-window form: tag both sides, union, ONE window pass
per key ordered by (ts, side) carrying the right columns forward. Cost is a
single shuffle on the key + one sort — linear in rows, the plan you want at
100 TB. DuckDB's native ``ASOF LEFT JOIN`` is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: left columns + the latest ``value_cols`` from the
    right row with the greatest ``ts`` <= left's ``ts`` (NULLs when none).
    Rows of ``right`` sharing (key, ts) must be pre-deduplicated by the
    caller (as with any as-of semantics, ties are ambiguous).

    The right row is carried as ONE struct column with a single
    ``last(ignorenulls)`` pass — carrying each value column independently
    would stitch fields from DIFFERENT right rows whenever a right row
    legitimately holds NULL in one value column (a torn row; true ASOF
    semantics, like DuckDB's, return the matched row's NULL)."""
    lcols = [c for c in left.columns]
    r_struct_type = T.StructType([
        T.StructField(c, right.schema[c].dataType) for c in value_cols
    ])
    l_tagged = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in (key, ts)],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tagged = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols if c not in (key, ts)],
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so a right
    # row at exactly left.ts matches (<= semantics, like DuckDB ASOF)
    win = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionAll(r_tagged).select(
        "*", F.last("_r", ignorenulls=True).over(win).alias("_v")
    )
    out = carried.filter(F.col("_side") == 1).select(
        F.col(key), F.col(ts),
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in (key, ts)],
        *[F.col("_v").getField(c).alias(f"asof_{c}") for c in value_cols],
    )
    return out
