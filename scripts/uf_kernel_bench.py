"""Contraction-phase shootout at 18M edges (round-5 VERDICT item 3):
times ONLY the local-contraction stage of cc_two_phase — repartition +
mapInPandas + count — with the round-4 per-edge dict UF vs the round-5
vectorized kernel, same session, same input, hash and range partitioning.

Usage: python scripts/uf_kernel_bench.py [pages_parquet_path]
Prints one JSON line; BENCH/BASELINE.md quotes it.
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_connected_components_spark.session import default_parallelism, get_spark  # noqa: E402


def dict_uf_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The round-4 kernel, verbatim (for the A/B)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = parent.setdefault(x, x)
        while parent[root] != root:
            parent[root] = parent[parent[root]]
            root = parent[root]
        parent[x] = root
        return root

    for pdf in batches:
        for u, v in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
            if u == v:
                continue
            ru, rv = find(u), find(v)
            if ru != rv:
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
    rows = [(x, find(x)) for x in parent]
    out = pd.DataFrame(rows, columns=["src", "dst"])
    yield out[out["src"] != out["dst"]]


def main() -> None:
    from parallel_connected_components_spark.operators import canonicalize, edges_from_pages
    from parallel_connected_components_spark.operators.cc import _local_uf_partition

    pages_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".data", "bench_pages_v2000000_c64_l8",
    )
    cores = default_parallelism()
    spark = get_spark("uf_kernel_bench", cores=cores)
    n = spark.sparkContext.defaultParallelism
    edges = canonicalize(edges_from_pages(spark.read.parquet(pages_path)))
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    # warm python workers
    spark.range(1024).mapInPandas(lambda it: (x for x in it), schema="id long").count()

    out: dict = {"n_edges": n_edges, "cores": cores}
    for part_by in ("hash", "range"):
        parted = (
            edges.repartitionByRange(n, "src")
            if part_by == "range"
            else edges.repartition(n, "src")
        )
        for name, fn in (("dict_uf", dict_uf_partition), ("numpy_kernel", _local_uf_partition)):
            reps = []
            rows = None
            for _ in range(3):
                t0 = time.perf_counter()
                rows = parted.mapInPandas(fn, schema="src long, dst long").count()
                reps.append(time.perf_counter() - t0)
            reps.sort()
            key = f"{part_by}_{name}"
            out[key + "_sec"] = round(reps[1], 3)
            out[key + "_spread"] = [round(reps[0], 3), round(reps[-1], 3)]
            out[key + "_edges_per_sec"] = round(n_edges / reps[1], 1)
            out[key + "_out_rows"] = rows
        out[f"{part_by}_speedup"] = round(
            out[f"{part_by}_dict_uf_sec"] / out[f"{part_by}_numpy_kernel_sec"], 2
        )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
