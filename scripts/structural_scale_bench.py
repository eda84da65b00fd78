"""Two-parallelism-level scaling evidence for the round-5 structural
operators (coreness, k-hop BFS, SCC) — the same protocol as
scaling_bench.py: each level in a FRESH JVM subprocess (no cache
inheritance), best-of-N samples per level (this box carries external
load that only ever adds wall time, so the per-phase minimum is the
honest capability estimator — BENCH/BASELINE.md scaling preamble).

Input is a CACHED canonical edge parquet (src<dst, e.g.
.data/bench_edges_18M.parquet) so the measurement isolates the operator
loops from extraction. SCC needs directed cycles, which the canonical
orientation destroys by construction, so the child re-directs edges
deterministically: edge (u,v) keeps u→v when xxhash64(u,v) is even,
else flips — a 50/50 random orientation that leaves plenty of cycles on
the block-structured bench graph while staying reproducible.

Usage:
    python scripts/structural_scale_bench.py <edges_parquet> [low high reps [ops]]

``ops`` is a comma list from {coreness,khop,scc} (default all three) —
re-measuring one operator after a plan change shouldn't cost a full
sweep of the unchanged ones.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from parallel_connected_components_spark.session import get_spark
from parallel_connected_components_spark.operators import (
    bfs_hops, coreness, scc, symmetrize,
    clustering_coefficients, degree_assortativity, edge_support,
    link_prediction_topk, truss_decomposition)
spark = get_spark("structscale", cores={cores})
ops = set({ops!r}.split(","))
canon = spark.read.parquet({edges!r}).localCheckpoint(eager=True)
n_edges = canon.count()
out = {{"cores": {cores}, "n_edges": n_edges}}
if ops & {{"coreness", "khop"}}:
    sym = symmetrize(canon, dedup=False).localCheckpoint(eager=True)
    sym.count()

if "coreness" in ops:
    t0 = time.perf_counter()
    cores_df, runner = coreness(spark, sym)
    out["coreness_max"] = cores_df.agg(F.max("core")).collect()[0][0]
    out["coreness_sec"] = round(time.perf_counter() - t0, 3)
    out["coreness_rounds"] = runner.num_iterations

if "khop" in ops:
    seeds = canon.select(F.col("src").alias("id")).distinct().orderBy("id").limit(32)
    t0 = time.perf_counter()
    dists, _ = bfs_hops(spark, sym, seeds, max_hops=4)
    out["khop_reached"] = dists.count()
    out["khop_sec"] = round(time.perf_counter() - t0, 3)

if "scc" in ops:
    directed = canon.select(
        F.when(F.xxhash64("src", "dst") % 2 == 0, F.col("src")).otherwise(F.col("dst")).alias("s"),
        F.when(F.xxhash64("src", "dst") % 2 == 0, F.col("dst")).otherwise(F.col("src")).alias("d"),
    ).select(F.col("s").alias("src"), F.col("d").alias("dst")).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    labels, info = scc(spark, directed)
    out["scc_count"] = labels.select("label").distinct().count()
    out["scc_sec"] = round(time.perf_counter() - t0, 3)
    out["scc_rounds"] = info["rounds"]

if "support" in ops:
    t0 = time.perf_counter()
    sup = edge_support(spark, canon)
    out["support_sum"] = sup.agg(F.sum("support")).collect()[0][0]
    out["support_sec"] = round(time.perf_counter() - t0, 3)

if "lcc" in ops:
    t0 = time.perf_counter()
    lcc = clustering_coefficients(spark, canon)
    # force the triangle aggregate: a bare count() lets Catalyst eliminate
    # the unique-key left join and time only the degree scan
    row = lcc.agg(F.sum("triangles").alias("t"), F.sum("lcc").alias("l")).collect()[0]
    out["lcc_tri_sum"] = row["t"]
    out["lcc_sec"] = round(time.perf_counter() - t0, 3)

if "truss" in ops:
    t0 = time.perf_counter()
    tr, tinfo = truss_decomposition(spark, canon)
    out["truss_hist"] = sorted(
        (r["truss"], r["count"]) for r in tr.groupBy("truss").count().collect())
    out["truss_sec"] = round(time.perf_counter() - t0, 3)
    out["truss_rounds"] = tinfo["stage_rounds"]

if "linkpred" in ops:
    t0 = time.perf_counter()
    # exact_fold=False: the scale mode (associative RA sum) — the ordered
    # collect_list fold is the verification mode and its per-pair struct
    # lists are avoidable aggregation-state memory at this input size
    lp = link_prediction_topk(spark, canon, k=50, max_degree=64, exact_fold=False)
    out["linkpred_rows"] = lp.count()
    out["linkpred_sec"] = round(time.perf_counter() - t0, 3)

if "assort" in ops:
    t0 = time.perf_counter()
    row = degree_assortativity(spark, canon).collect()[0]
    out["assortativity"] = round(row["assortativity"], 6)
    out["assort_sec"] = round(time.perf_counter() - t0, 3)

print("SCALERESULT " + json.dumps(out))
spark.stop()
"""


def _once(edges: str, cores: int, ops: str) -> dict:
    code = CHILD.format(repo=REPO, cores=cores, edges=edges, ops=ops)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCALERESULT "):
            return json.loads(line[len("SCALERESULT "):])
    raise RuntimeError(
        f"no result at cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def _level(edges: str, cores: int, reps: int, ops: str) -> dict:
    runs, failed = [], 0
    for _ in range(max(1, reps)):
        try:
            runs.append(_once(edges, cores, ops))
        except (RuntimeError, subprocess.TimeoutExpired) as e:
            # a rep dying (external-load OOM, timeout) must not discard
            # the level's surviving samples — record and carry on
            failed += 1
            print(f"WARN rep failed at cores={cores}: {str(e)[:300]}", file=sys.stderr)
    if not runs:
        raise RuntimeError(f"all {reps} reps failed at cores={cores}")
    keys = [k for k in runs[0] if k.endswith("_sec")]
    best = dict(runs[0])
    for r in runs[1:]:
        for k in keys:
            best[k] = min(best[k], r[k])
    best["samples"] = {k: [r[k] for r in runs] for k in keys}
    best["failed_reps"] = failed
    best["loadavg_1m"] = round(os.getloadavg()[0], 2)
    return best


def run(edges: str, low: int = 2, high: int = 8, reps: int = 2,
        ops: str = "coreness,khop,scc") -> dict:
    r_low = _level(edges, low, reps, ops)
    r_high = _level(edges, high, reps, ops)
    ratio = high / low
    out = {"low": r_low, "high": r_high}
    for k in ops.split(","):
        sp = r_low[f"{k}_sec"] / r_high[f"{k}_sec"]
        out[f"{k}_speedup"] = round(sp, 3)
        out[f"{k}_efficiency"] = round(sp / ratio, 3)
    return out


if __name__ == "__main__":
    edges = sys.argv[1]
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    ops = sys.argv[5] if len(sys.argv) > 5 else "coreness,khop,scc"
    print(json.dumps(run(edges, low, high, reps, ops), indent=2))
