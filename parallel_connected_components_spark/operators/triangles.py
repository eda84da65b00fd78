"""Join-based triangle counting.

Target-only capability (BASELINE.json north_rule). Built directly on the
reference's canonical-orientation trick — process each undirected edge
once as (u, v) with u < v (/root/reference/src/cc_sequential.c:418,
/root/reference/src/cc_opencilk.c:286) — which is also the standard
triangle-join orientation: with edges oriented low→high, each triangle
{a<b<c} is counted exactly once as the wedge (a,b),(b,c) closed by (a,c).

Plan: two shuffle joins over the oriented edge table. Skew note: hub
vertices create huge wedge fan-outs; orientation already assigns each
wedge to its *middle* vertex and AQE skew-join splits hot middle keys.
The classic further refinement for power-law graphs (orient by degree
instead of id so hubs get low out-degree) is exposed via
``orient_by_degree=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .graph import canonicalize, degrees, symmetrize


def _oriented(edges: DataFrame, orient_by_degree: bool) -> DataFrame:
    canon = canonicalize(edges)
    if not orient_by_degree:
        return canon
    # Orient from lower-(degree, id) to higher-(degree, id): every vertex's
    # out-degree is O(sqrt(E)) on any graph, killing hub wedge blowup.
    deg = degrees(symmetrize(edges))
    e = (
        canon.join(deg.withColumnsRenamed({"id": "src", "degree": "ds"}), "src")
        .join(deg.withColumnsRenamed({"id": "dst", "degree": "dd"}), "dst")
    )
    fwd = F.struct("ds", "src") < F.struct("dd", "dst")
    return e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def triangle_count(
    spark: SparkSession, edges: DataFrame, orient_by_degree: bool = False
) -> int:
    e = _oriented(edges, orient_by_degree)
    # shuffle_hash on the EDGE input only: per-partition edge slices are
    # bounded so they are safe hash-map build sides, and sort-merge's
    # per-join sorts are pure overhead (measured 2.4x at 18M edges —
    # operators/structure.py:_supports). The wedge stream must stay the
    # probe side: hinting it too lets Spark's (meaningless) self-join
    # size estimate pick a 100M-row build map → executor OOM.
    wedges = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(
            e.select(F.col("src").alias("b"), F.col("dst").alias("c")).hint("shuffle_hash"),
            "b",
        )
    )
    closed = wedges.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("c")).hint("shuffle_hash"),
        ["a", "c"],
        "left_semi",
    )
    return closed.count()


def triangles_per_vertex(
    spark: SparkSession, edges: DataFrame, orient_by_degree: bool = False
) -> DataFrame:
    """→ (vertex, triangles): per-vertex triangle participation counts."""
    e = _oriented(edges, orient_by_degree)
    # shuffle_hash on the edge input only — see triangle_count for why the
    # wedge stream must remain the probe side.
    tri = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(
            e.select(F.col("src").alias("b"), F.col("dst").alias("c")).hint("shuffle_hash"),
            "b",
        )
        .join(
            e.select(F.col("src").alias("a"), F.col("dst").alias("c")).hint("shuffle_hash"),
            ["a", "c"],
            "left_semi",
        )
    )
    per = (
        tri.select(F.col("a").alias("vertex"))
        .union(tri.select(F.col("b").alias("vertex")))
        .union(tri.select(F.col("c").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("triangles"))
    )
    return per
