"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exactness baseline — dot products as
  ``F.zip_with`` + ``F.aggregate`` Column expressions (JVM-side; no Python),
  broadcast queries, window rank.
- LSH-bucketed ANN (scale path): deterministic random-hyperplane signatures
  computed in one Arrow-batched pandas UDF (numpy matmul per batch),
  multi-probe bucket join, exact re-rank inside candidate buckets.
  Recall is property-tested against brute force.
- Embedding-cosine near-duplicates: self-join variant over LSH buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast, pandas_udf
from pyspark.sql.window import Window


def _cosine(a, b) -> F.Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, v: s + v * v))
    return dot / (na * nb)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    qid_col: str = "qid",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Queries broadcast; cosine evaluated
    as Column expressions (double math, deterministic in-array order).
    Output: qid, vec_id, cos (6dp), rank."""
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    q = queries.select(F.col(qid_col), F.col(vec_col).cast("array<double>").alias("qv"))
    j = e.crossJoin(broadcast(q))
    cos = F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cos")
    win = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        j.select(qid_col, id_col, cos)
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )


def _plane_matrix(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, bits)).astype(np.float64)


def hyperplane_signatures(
    df: DataFrame, dim: int, bits: int = 16, seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add an int signature column: sign bits of X @ P for deterministic
    seeded hyperplanes P. One numpy matmul per Arrow batch."""
    planes = _plane_matrix(dim, bits, seed)

    @pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        bits_m = (m @ planes) > 0
        weights = (1 << np.arange(bits_m.shape[1])).astype(np.int64)
        return pd.Series(bits_m @ weights)

    return df.withColumn("sig", sig(F.col(vec_col)))


def ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int,
    bits: int = 12,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    qid_col: str = "qid",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH ANN: candidates = points whose signature is within
    ``probe_hamming`` bits of the query's signature (multi-probe by
    expanding the query to all masks of popcount <= probe_hamming), exact
    cosine re-rank inside candidates."""
    import itertools

    e = hyperplane_signatures(embeddings, dim, bits, vec_col=vec_col).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"), "sig"
    )
    q = hyperplane_signatures(queries, dim, bits, vec_col=vec_col).select(
        F.col(qid_col), F.col(vec_col).cast("array<double>").alias("qv"), "sig"
    )
    masks = [0]
    for r in range(1, probe_hamming + 1):
        for combo in itertools.combinations(range(bits), r):
            masks.append(sum(1 << c for c in combo))
    probes = q.withColumn("m", F.explode(F.array(*[F.lit(m) for m in masks])))
    probes = probes.withColumn("sig", F.col("sig").bitwiseXOR(F.col("m"))).drop("m")
    j = e.join(broadcast(probes), "sig")
    cos = F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cos")
    win = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        j.select(qid_col, id_col, cos)
        .dropDuplicates([qid_col, id_col])
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    bits: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join: only pairs
    sharing a signature bucket pay the exact cosine check."""
    e = hyperplane_signatures(embeddings, dim, bits, vec_col=vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"), "sig"
    )
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "sig")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "sig")
    pairs = a.join(b, "sig").filter(F.col("id_a") < F.col("id_b"))
    cos = F.round(_cosine(F.col("va"), F.col("vb")), 6).alias("cos")
    return (
        pairs.select("id_a", "id_b", cos)
        .filter(F.col("cos") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
