"""Incremental-PageRank fold cost at the 18M-edge scale point (round-5
VERDICT item 6 'done' criterion): fold a 1% edge delta into warm state and
compare against a cold full recompute on the same accumulated graph.

Usage: python scripts/incr_pr_bench.py [pages_parquet_path]
Prints one JSON line; BENCH/BASELINE.md quotes it.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_connected_components_spark.session import default_parallelism, get_spark  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from parallel_connected_components_spark.operators import canonicalize, edges_from_pages, pagerank
    from parallel_connected_components_spark.streaming.graph import (
        pagerank_state_ranks,
        update_pagerank_state,
    )

    pages_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".data", "bench_pages_v2000000_c64_l8",
    )
    cores = default_parallelism()
    spark = get_spark("incr_pr_bench", cores=cores)
    # directed edges, (src,dst)-deduped — the fold's own invariant
    edges = (
        edges_from_pages(spark.read.parquet(pages_path))
        .where("src != dst")
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    spark.range(1024).mapInPandas(lambda it: (x for x in it), schema="id long").count()

    # deterministic 99/1 split
    base = edges.where(F.xxhash64("src", "dst") % 100 != 0).localCheckpoint(eager=True)
    delta = edges.where(F.xxhash64("src", "dst") % 100 == 0).localCheckpoint(eager=True)
    n_base, n_delta = base.count(), delta.count()

    state = tempfile.mkdtemp(prefix="incr_pr_bench_")
    try:
        t0 = time.perf_counter()
        it1 = update_pagerank_state(spark, base, state, tol=1e-6)
        t_fold1 = time.perf_counter() - t0

        # instrument the delta fold's phases: the edge pass (dedup + state
        # extension + CC fold + rescale) vs the power iterations — the
        # round-5 change makes the FORMER delta-proportional; the latter
        # is inherently O(|E_total|)/iteration for exact PageRank
        import importlib

        prmod = importlib.import_module(
            "parallel_connected_components_spark.operators.pagerank"
        )
        orig_pr = prmod.pagerank
        pr_time = {}

        def timed_pr(*a, **kw):
            t = time.perf_counter()
            out = orig_pr(*a, **kw)
            pr_time["sec"] = time.perf_counter() - t
            return out

        prmod.pagerank = timed_pr
        import parallel_connected_components_spark.streaming.graph as sg
        t0 = time.perf_counter()
        it2 = update_pagerank_state(spark, delta, state, tol=1e-6)
        t_fold2 = time.perf_counter() - t0
        prmod.pagerank = orig_pr
        fold2_pr_sec = pr_time.get("sec", 0.0)

        warm_ranks = pagerank_state_ranks(spark, state)

        # the round-4-style fold for the same delta: re-read the full
        # accumulated set, dropDuplicates, full cc_two_phase for the
        # rescale, unpinned pagerank — what the edge pass used to cost
        t0 = time.perf_counter()
        all_paths = [
            os.path.join(state, d, "edges") for d in sorted(os.listdir(state))
            if d.startswith("efold_v")
        ]
        old_all = spark.read.parquet(*all_paths).dropDuplicates(["src", "dst"])
        from parallel_connected_components_spark.operators.cc import cc_two_phase
        labels_old, _ = cc_two_phase(spark, old_all)
        prev_old = sg._rescale_by_component(
            spark, labels_old, warm_ranks
        )
        old_ranks, old_runner = pagerank(spark, old_all, tol=1e-6, init_ranks=prev_old)
        old_ranks.agg(F.sum("rank")).collect()
        t_fold2_old_style = time.perf_counter() - t0

        t0 = time.perf_counter()
        cold_ranks, cold_runner = pagerank(spark, edges, tol=1e-6)
        cold_ranks.agg(F.sum("rank")).collect()
        t_cold = time.perf_counter() - t0

        # exactness of the incremental result vs the cold recompute
        joined = warm_ranks.withColumnsRenamed({"rank": "wr"}).join(
            cold_ranks, "vertex"
        )
        max_diff = joined.agg(
            F.max(F.abs(F.col("wr") - F.col("rank")))
        ).collect()[0][0]

        out = {
            "n_edges": n_edges,
            "n_base": n_base,
            "n_delta": n_delta,
            "cores": cores,
            "fold1_sec": round(t_fold1, 2),
            "fold1_iters": it1,
            "fold2_sec": round(t_fold2, 2),
            "fold2_iters": it2,
            "fold2_pr_sec": round(fold2_pr_sec, 2),
            "fold2_edge_pass_sec": round(t_fold2 - fold2_pr_sec, 2),
            "fold2_old_style_sec": round(t_fold2_old_style, 2),
            "fold2_old_style_iters": old_runner.num_iterations,
            "cold_sec": round(t_cold, 2),
            "cold_iters": cold_runner.num_iterations,
            "fold2_over_cold": round(t_fold2 / t_cold, 3),
            "max_abs_rank_diff": max_diff,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(state, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
