"""Similarity search over an embedding column (array<float>).

Two paths, per the training-data-pipeline requirements:
- :func:`knn_bruteforce` — exact cosine top-k for a (small) query set:
  broadcast the queries, score every vector with a JVM-side
  zip_with/aggregate dot product (no Python, no UDF), take top-k per
  query with the salted two-stage top-k (skew.salted_topk_per_key) —
  a query's full N-row candidate set never sorts on one task.
- :func:`knn_lsh` — the scale path: random-hyperplane LSH buckets
  (deterministic planes from the portable hash, seed-stable), top-k
  within the probe buckets only. Recall < 1.0 by construction; the
  bucket-bit Hamming radius (multi-probe) trades recall vs cost.

Scale notes: brute force is O(N·Q·d) flops but a single scan — on a
cluster it is embarrassingly parallel with the queries broadcast; the
LSH path turns it into an equi-join on bucket keys. Skew: dense regions
make hot buckets; multi-probe spreads them and AQE splits the join; the
top-k itself is salted so per-query row counts are bounded at every
stage after the first (stage 1 sees ≤ N/num_salts rows per
(query, salt); stage 2 sees ≤ num_salts·k rows per query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import portable_hash64_py
from .skew import salted_topk_per_key


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine over array<double>; zero-norm vectors score 0."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_expr(a, b) / denom)


def _plane(dim: int, plane_idx: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component i ∈ [-1, 1)
    derived from the portable hash — same plane family everywhere."""
    return [
        (portable_hash64_py(f"plane-{seed}-{plane_idx}-{i}") % 2000003) / 1000001.5 - 1.0
        for i in range(dim)
    ]


def hyperplane_sketch_col(vec: Column, num_planes: int, seed: int, dim: int = 64) -> Column:
    """Sign sketch: bit j = 1 iff dot(vec, plane_j) > 0, packed into a
    long. Pure column expression."""
    out = F.lit(0).cast("long")
    v = vec.cast("array<double>")
    for j in range(num_planes):
        plane = F.array(*[F.lit(c) for c in _plane(dim, j, seed)])
        out = out + F.when(dot_expr(v, plane) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0)
        )
    return out


def knn_bruteforce(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, rank 1..k, cosine). Exact. Ties break
    by neighbor id (deterministic). Self-matches excluded."""
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("nv"),
        )
        .join(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("nv")).alias("cosine"),
        )
    )
    return salted_topk_per_key(
        scored, "query_id", "cosine", k, tiebreak_col="neighbor_id", rank_col="rank"
    ).select("query_id", "neighbor_id", "rank", "cosine")


def knn_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    multiprobe_hamming: int = 1,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane sketch is
    within ``multiprobe_hamming`` bits of the query's sketch. Same output
    schema as brute force; recall measured in tests. ``dim`` defaults to
    the measured vector length (one tiny job)."""
    if dim is None:
        row = embeddings.select(F.size(vec_col).alias("d")).limit(1).collect()
        dim = row[0]["d"] if row else 0
    sk = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
        hyperplane_sketch_col(F.col(vec_col), num_planes, seed, dim).alias("bucket"),
    )
    # multi-probe: each query probes its bucket plus all buckets within
    # the Hamming radius (bucket count is tiny: 2^num_planes)
    probes = [0]
    if multiprobe_hamming >= 1:
        probes += [1 << j for j in range(num_planes)]
    if multiprobe_hamming >= 2:
        probes += [
            (1 << i) | (1 << j) for i in range(num_planes) for j in range(i + 1, num_planes)
        ]
    queries = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
            hyperplane_sketch_col(F.col(vec_col), num_planes, seed, dim).alias("qb"),
        )
        .select(
            "query_id",
            "qv",
            F.explode(
                F.array(*[F.col("qb").bitwiseXOR(F.lit(p)) for p in probes])
            ).alias("bucket"),
        )
    )
    scored = (
        sk.join(F.broadcast(queries), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("nv")).alias("cosine")
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return salted_topk_per_key(
        scored, "query_id", "cosine", k, tiebreak_col="neighbor_id", rank_col="rank"
    ).select("query_id", "neighbor_id", "rank", "cosine")
