"""Multi-source BFS hop distance / k-hop neighborhood extraction.

Target-only capability: the frontier expansion IS the reference's CC
frontier loop (/root/reference/src/cc_openmp.c:86-128's changed-only
resend) with min-label swapped for min-distance — and k-hop
neighborhoods around seed sets are a routine link-graph curation step
(expand a trusted/spam seed list a few hops before scoring, extract a
subgraph for inspection, bound a crawl frontier).

State is (vertex, dist, frontier). Per round, exactly the package's
carrier-row shape: frontier rows send dist+1 over the pinned directed
edges, settled rows ride the same shuffle as self-retention rows, and
ONE aggregation takes min(dist) — a settled vertex keeps its (smaller)
distance for free, a newly reached vertex settles at the round number,
and `frontier` for the next round is exactly `min == round`. Convergence
(empty frontier) rides the materialization job via Observation; the
optional ``max_hops`` cap bounds the walk for neighborhood extraction.

Direction: the edge table is used AS GIVEN (src → dst). Pass the
symmetrized table for undirected distance, the raw directed table for
forward reachability, or the reversed table for ancestor distance.

Scale: identical per-round plan to frontier CC (one shuffle join + one
agg over the pinned sorted edge cache), so the shuffle decays with the
frontier; rounds = the distance bound (max_hops) or the eccentricity of
the seed set. The DuckDB twin (entry._khop_sql) unrolls the same
integer recurrence; tests differential against a plain Python BFS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from ..plans.runner import FixpointRunner
from .graph import pin_dedup_edges


def bfs_hops(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int | None = None,
    max_iterations: int = 500,
) -> tuple[DataFrame, FixpointRunner]:
    """→ ((vertex long, dist long), runner) for every vertex REACHED from
    the seed set ``sources`` (a DataFrame with an ``id`` column; seeds
    themselves at dist 0) following edges src → dst. Unreached vertices
    are absent — join against a vertex universe downstream if a dense
    output is needed. ``max_hops`` caps the expansion (k-hop
    neighborhood); None runs to exhaustion."""
    e, n_part = pin_dedup_edges(
        spark, edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    )
    init = sources.select(
        F.col("id").cast("long").alias("vertex"),
        F.lit(0).cast("long").alias("dist"),
        F.lit(True).alias("frontier"),
    ).dropDuplicates(["vertex"])

    obs_holder: dict[int, Observation] = {}

    def step(state: DataFrame, it: int) -> DataFrame:
        # Join-back update (round 6, same rationale as cc_label_propagation):
        # with AQE off in the loop the checkpointed state keeps its
        # hash(vertex) partitioning, so the full-outer join-back against
        # the aggregated frontier needs no exchange on either side and
        # only the frontier's messages shuffle — the union-carrier form
        # re-shuffled every settled (vertex, dist) row each round. A
        # vertex is newly reached exactly when it has no state row
        # (settled distances never improve: messages carry it+1, every
        # settled dist is ≤ it).
        msgs = (
            e.join(
                state.filter("frontier")
                .select(F.col("vertex").alias("src"))
                .hint("shuffle_hash"),
                "src",
            )
            .select(F.col("dst").alias("vertex"), F.lit(it + 1).cast("long").alias("dist"))
        )
        arrivals = (
            msgs.repartition(n_part, "vertex")
            .groupBy("vertex")
            .agg(F.min("dist").alias("_m"))
            .hint("shuffle_hash")
        )
        obs = Observation()
        obs_holder[it] = obs
        return (
            state.select("vertex", F.col("dist").alias("_old"))
            .join(arrivals, "vertex", "full")
            .select(
                "vertex",
                F.coalesce("_old", "_m").alias("dist"),
                F.col("_old").isNull().alias("frontier"),
            )
            .observe(obs, F.sum(F.col("frontier").cast("long")).alias("reached"))
        )

    def converged(new_state: DataFrame, it: int):
        reached = obs_holder.pop(it).get["reached"] or 0
        if max_hops is not None and it + 1 >= max_hops:
            return 0, {"reached": reached, "capped": reached > 0}
        return reached, {"reached": reached}

    runner = FixpointRunner(spark, "bfs_hops", max_iterations=max_iterations)
    out = runner.run(init, step, converged)
    e.unpersist()
    return out.select("vertex", "dist"), runner


def bfs_python_oracle(edge_list, source_ids, max_hops=None) -> dict[int, int]:
    """Plain queue BFS — independent differential anchor. Test-scale."""
    from collections import deque

    adj: dict[int, list[int]] = {}
    for u, v in edge_list:
        u, v = int(u), int(v)
        if u != v:
            adj.setdefault(u, []).append(v)
    dist = {int(s): 0 for s in source_ids}
    q = deque(sorted(dist))
    while q:
        u = q.popleft()
        if max_hops is not None and dist[u] >= max_hops:
            continue
        for w in adj.get(u, ()):
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist
