"""Similarity search over the `embeddings` table (array<float> column):
brute-force cosine top-k as the correctness baseline, sign-LSH bucketed
ANN as the scale path, and embedding-cosine near-duplicate detection.

Spark-first: the dot product is a built-in ``aggregate`` over
``zip_with`` (JVM-side), top-k is a window over the blocked candidate
space. At 100 TB the brute-force path is gated to a sampled query set;
the LSH path's bucket join is the production shape (bucket count scales
with corpus size; broadcast the query side when small).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _norm_col(vec: str) -> F.Column:
    return F.sqrt(F.expr(f"aggregate({vec}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    queries: (vec_id, embedding). The query side is broadcast (it is
    small by contract); the corpus side streams — one pass, no corpus
    shuffle, ranking via per-query window over the joined space."""
    corpus = embeddings.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("nbr_emb"),
        _norm_col("embedding").alias("nbr_norm"),
    )
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm_col("embedding").alias("q_norm"),
        )
    )
    scored = (
        corpus.crossJoin(q)
        .where(F.col("nbr_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(_dot("q_emb", "nbr_emb") / (F.col("q_norm") * F.col("nbr_norm")), 4),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.col("cosine").alias("cosine"), "rank")
    )


def sign_lsh_buckets(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Random-hyperplane LSH without random planes: the sign pattern of
    the first n_planes coordinates is a deterministic, oracle-checkable
    bucket key (coordinates of trained embeddings are near-random
    projections already). Production swap-in: seeded Gaussian planes in
    a broadcast matrix, same bucket-join shape."""
    bucket_bits = [
        f"CASE WHEN CAST(element_at(embedding, {i + 1}) AS DOUBLE) >= 0 THEN '1' ELSE '0' END"
        for i in range(n_planes)
    ]
    return embeddings.select(
        "vec_id", "embedding",
        F.expr("concat(" + ", ".join(bucket_bits) + ")").alias("bucket"),
    )


def lsh_ann_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                 n_planes: int = 8) -> DataFrame:
    """ANN: candidates share the query's sign bucket; exact cosine +
    window ranking within the bucket only."""
    corpus = sign_lsh_buckets(embeddings, n_planes).select(
        F.col("vec_id").alias("nbr_id"), F.col("embedding").alias("nbr_emb"),
        _norm_col("embedding").alias("nbr_norm"), "bucket",
    )
    q = F.broadcast(
        sign_lsh_buckets(queries, n_planes).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"),
            _norm_col("embedding").alias("q_norm"), "bucket",
        )
    )
    scored = (
        corpus.join(q, "bucket")
        .where(F.col("nbr_id") != F.col("query_id"))
        .withColumn("cosine", F.round(_dot("q_emb", "nbr_emb") / (F.col("q_norm") * F.col("nbr_norm")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.col("cosine").alias("cosine"), "rank")
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        n_planes: int = 6) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join."""
    b = sign_lsh_buckets(embeddings, n_planes)
    left = b.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"),
                    _norm_col("embedding").alias("na"), "bucket")
    right = b.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"),
                     _norm_col("embedding").alias("nb"), "bucket")
    return (
        left.join(right, "bucket").where(F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")), 4))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
