"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k is the correctness baseline; the IVF variant is
the scale path (assign every vector to its nearest centroid, probe only
the query's bucket — turns the O(N·Q) cross join into a bucket-local
join). Dot products run as ``zip_with`` + ``aggregate`` higher-order
functions — JVM expressions, no Python in the hot path.

Scores are emitted as ``floor(10^6 · cosine)`` integers: summation-order
float noise (~1 ulp) cannot survive the quantization, so ranks and the
DuckDB oracle agree exactly; ties break on the neighbor id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

DEFAULT_K = 5
DEFAULT_QUERIES = 8
IVF_CENTROIDS = 16


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # float32 → float64 up-front: both engines then do identical
    # double-precision accumulation, so quantized scores agree exactly.
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_e6(a: Column, b: Column) -> Column:
    """floor(10^6 · cos(a, b)) as bigint (0 for zero-norm inputs)."""
    d = dot(a, b)
    n = norm(a) * norm(b)
    return F.when(n == 0, F.lit(0)).otherwise(
        F.floor(d / n * F.lit(1000000.0))
    ).cast("long")


def brute_force_knn(
    spark: SparkSession,
    sf_dir: str,
    k: int = DEFAULT_K,
    n_queries: int = DEFAULT_QUERIES,
) -> DataFrame:
    """Baseline ANN: broadcast the (small) query set against every
    vector, rank per query by quantized cosine desc with id tie-break.
    The window is a per-query top-k; at scale, replace the final
    row_number with a bounded heap via groupBy + slice(sort_array)."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = emb.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_e6(F.col("q_emb"), F.col("embedding")).alias("score_e6"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score_e6").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "score_e6")
        .orderBy("query_id", "rnk")
    )


def near_dup_pairs_cosine(
    spark: SparkSession, sf_dir: str, threshold_e6: int = 800000
) -> DataFrame:
    """Embedding-cosine near-dup pairs: all (a < b) with quantized cosine
    ≥ threshold. All-pairs at test scale; the LSH/IVF bucketing below is
    the 100 TB strategy."""
    emb = _emb(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", cosine_e6(F.col("ea"), F.col("eb")).alias("score_e6")
        )
        .filter(F.col("score_e6") >= threshold_e6)
        .orderBy("id_a", "id_b")
    )


# --- random-hyperplane LSH (SimHash for vectors): the bucketing that
# turns the all-pairs near-dup scan into a band-bucket join at scale ----

import random as _random

LSH_PLANES = 16
LSH_DIM = 64
LSH_BANDS = 4  # 4 bands x 4 bits


def _hyperplanes(n_planes: int = LSH_PLANES, dim: int = LSH_DIM, seed: int = 42):
    rng = _random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


_PLANES = _hyperplanes()


def _signature_bits(emb: Column):
    """16 sign bits of projections onto fixed seeded hyperplanes — pure
    JVM higher-order expressions over literal plane arrays."""
    bits = []
    for plane in _PLANES:
        lit_plane = F.array(*[F.lit(w) for w in plane])
        proj = F.aggregate(
            F.zip_with(emb, lit_plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append((proj >= 0).cast("int"))
    return bits


def cosine_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold_e6: int = 700000,
) -> DataFrame:
    """Embedding near-dup via random-hyperplane LSH: band the 16-bit
    sign signature into 4×4-bit keys, bucket-join candidates sharing a
    band, verify with exact quantized cosine ≥ threshold. At corpus
    scale this replaces the O(N²) cross join with bucket-local joins."""
    emb = _emb(spark, sf_dir)
    bits = _signature_bits(F.col("embedding"))
    band_cols = []
    per_band = LSH_PLANES // LSH_BANDS
    for b in range(LSH_BANDS):
        key = F.lit(0)
        for r in range(per_band):
            key = key * 2 + bits[b * per_band + r]
        band_cols.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    sig = emb.select(
        "vec_id", "embedding", F.explode(F.array(*band_cols)).alias("e")
    ).select(
        "vec_id", "embedding", F.col("e.band").alias("band"), F.col("e.key").alias("key")
    )
    a = sig.alias("a")
    b = sig.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.embedding").alias("ea"),
            F.col("b.embedding").alias("eb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.select(
            "id_a", "id_b", cosine_e6(F.col("ea"), F.col("eb")).alias("score_e6")
        )
        .filter(F.col("score_e6") >= threshold_e6)
        .orderBy("id_a", "id_b")
    )


def ivf_assignments(
    spark: SparkSession, sf_dir: str, n_centroids: int = IVF_CENTROIDS
) -> DataFrame:
    """IVF coarse quantizer with deterministic centroids (the first
    ``n_centroids`` vectors): every vector → argmax-cosine centroid
    (quantized score, min-id tie-break). One broadcast join + one
    window."""
    emb = _emb(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "centroid_id",
        cosine_e6(F.col("embedding"), F.col("c_emb")).alias("score_e6"),
    )
    w = W.partitionBy("vec_id").orderBy(
        F.col("score_e6").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("centroid_id").alias("bucket"))
    )


def ivf_knn(
    spark: SparkSession,
    sf_dir: str,
    k: int = DEFAULT_K,
    n_queries: int = DEFAULT_QUERIES,
    n_centroids: int = IVF_CENTROIDS,
) -> DataFrame:
    """IVF ANN: probe only the query's own bucket — the candidate join is
    bucket-co-located (equi-join on bucket), so work scales with bucket
    size, not corpus size."""
    assigned = ivf_assignments(spark, sf_dir, n_centroids=n_centroids)
    q = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = assigned.join(
        F.broadcast(q), F.col("bucket") == F.col("q_bucket")
    ).filter(F.col("vec_id") != F.col("query_id"))
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_e6(F.col("q_emb"), F.col("embedding")).alias("score_e6"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score_e6").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "score_e6")
        .orderBy("query_id", "rnk")
    )
