"""prune_every regime experiment (round-3 VERDICT item 7).

Hypothesis under test (BENCH/BASELINE.md "Honest read"): edge pruning can
only pay when large DENSE regions resolve in the first few rounds while a
slow high-diameter tail keeps the loop iterating — then every subsequent
round's frontier semi-join probes a pruned edge table instead of the full
one. On fast-converging graphs the rewrite job costs more than it saves
(measured, round 2); this script measures the hypothesized payoff regime
directly: hub blocks (resolve in ~3 rounds) + one long path (drives the
iteration count to ~path length).

Usage: python scripts/prune_regime_bench.py [n_hub_vertices] [path_len]
Prints one JSON line and a markdown row for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_connected_components_spark.session import get_spark  # noqa: E402
from parallel_connected_components_spark.operators import (  # noqa: E402
    cc_label_propagation,
    count_components,
    symmetrize,
)


def build_graph(spark, n_hub: int, path_len: int, blocks: int = 64):
    """blocks dense stars over n_hub vertices (each vertex also linked to
    block_start+1 for density) + ONE path of path_len fresh vertices."""
    bs = max(2, n_hub // blocks)
    ids = spark.range(n_hub)
    i = F.col("id")
    start = (i - i % bs)
    hub1 = ids.select(i.alias("src"), start.alias("dst"))
    hub2 = ids.filter(i % bs != 1).select(
        i.alias("src"), (start + 1).alias("dst")
    )
    p0 = 10 * n_hub  # disjoint id space
    path = (
        spark.range(path_len - 1)
        .select((i + p0).alias("src"), (i + p0 + 1).alias("dst"))
    )
    edges = hub1.unionAll(hub2).unionAll(path).filter(F.col("src") != F.col("dst"))
    n_comp = -(-n_hub // bs) + 1
    return symmetrize(edges).localCheckpoint(eager=True), n_comp


def main() -> None:
    n_hub = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    path_len = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    spark = get_spark("prune-regime")
    # warm python workers
    spark.range(1024).mapInPandas(lambda it: iter(it), schema="id long").count()
    edges, n_comp = build_graph(spark, n_hub, path_len)
    n_edges = edges.count()

    out = {"n_hub": n_hub, "path_len": path_len, "n_edges_sym": n_edges}
    for prune in (0, 2):
        t0 = time.perf_counter()
        labels, runner = cc_label_propagation(
            spark, edges, prune_every=prune, max_iterations=path_len + 20
        )
        got = count_components(labels)
        dt = time.perf_counter() - t0
        assert got == n_comp, f"prune={prune}: {got} != {n_comp}"
        key = f"prune_{prune}"
        out[key] = {
            "seconds": round(dt, 2),
            "iterations": runner.num_iterations,
            "sec_per_iter_last5": round(
                sum(m.seconds for m in runner.metrics[-5:]) / 5, 3
            ),
            "shuffle_write_mb_last5": round(
                sum(m.extra.get("shuffle_write_bytes", 0) for m in runner.metrics[-5:])
                / 5 / 1e6, 2,
            ),
        }
    print(json.dumps(out))
    a, b = out["prune_0"], out["prune_2"]
    print(
        f"| hub {n_hub/1e6:.1f}M + path {path_len} | {a['seconds']} s "
        f"({a['iterations']} it) | {b['seconds']} s ({b['iterations']} it) | "
        f"{a['seconds']/b['seconds']:.2f}x |"
    )
    spark.stop()


if __name__ == "__main__":
    main()
