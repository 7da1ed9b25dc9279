"""Similarity search over an embedding column (``array<float>``).

* brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the full corpus; the dot product is a JVM-side
  ``F.aggregate(F.zip_with(...))`` fold inside whole-stage codegen.
* IVF (inverted-file) top-k — the scale path: deterministic hyperplane
  LSH buckets (signs of dot products against md5-seeded pseudo-random
  hyperplanes) prune the corpus to matching/nearby buckets before the
  exact re-rank. At 10^9+ vectors the bucket join replaces the full scan;
  recall is tunable by n_planes / probe radius.

Scores are computed in float64 and rounded to 6 decimals so results are
stable across engines and partitionings.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: ``(query_id, neighbor_id, score)``; self-matches
    excluded; ties broken by neighbor_id (deterministic).

    ``queries`` is broadcast — it must be small (the caller controls k and
    the query batch; the corpus side streams)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (md5-seeded PCG64)."""
    h = int.from_bytes(hashlib.md5(f"ivf-{seed}".encode()).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(h))
    planes = rng.standard_normal((n_planes, dim))
    planes /= np.linalg.norm(planes, axis=1, keepdims=True)
    return planes.tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id (long) for a vector under the hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec, plane) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via LSH bucket pruning + exact re-rank within the
    query's bucket. Same output schema as cosine_topk; recall < 1 by
    construction (probe radius 0 — same-bucket only)."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ``(id_a, id_b, score)`` with
    cosine >= threshold, id_a < id_b.

    Scale path (default): sign-LSH bucket join prunes candidates before the
    exact cosine filter — near-identical vectors land in the same bucket
    with high probability; recall < 1 by construction (tunable via
    n_planes). ``exact=True`` compares all pairs (quadratic; small data /
    recall baseline only).
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    if exact:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        planes = _hyperplanes(dim, n_planes, seed)
        ab = a.withColumn("bucket", lsh_bucket(F.col("va"), planes))
        bb = b.withColumn("bucket", lsh_bucket(F.col("vb"), planes))
        pairs = ab.join(bb, "bucket").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("score"),
        )
        .where(F.col("score") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
