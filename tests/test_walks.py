"""Deterministic random walks vs the Python simulation (same portable
hash ⇒ identical corpus). The bit-exact DuckDB twin is entry._walks_sql."""

from __future__ import annotations

import random

import pytest

from parallel_connected_components_spark.operators import (
    random_walks,
    walks_python_oracle,
)


def corpus_dict(df):
    return {(r["walk_id"], r["step"]): r["vertex"] for r in df.collect()}


@pytest.mark.parametrize("seed", [11, 12])
def test_walks_differential_random(spark, seed):
    rng = random.Random(seed)
    edge_list = list({(rng.randrange(30), rng.randrange(30)) for _ in range(70)})
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    seed_ids = sorted({rng.randrange(30) for _ in range(6)})
    seeds = spark.createDataFrame([(s,) for s in seed_ids], "id long")
    got = random_walks(spark, edges, seeds, walk_len=5)
    assert corpus_dict(got) == walks_python_oracle(edge_list, seed_ids, walk_len=5)


def test_walks_determinism_across_runs(spark):
    """The whole point: re-generating a corpus shard yields the SAME
    samples (training-data lineage under retries)."""
    edge_list = [(i, (i * 7 + 3) % 20) for i in range(20)] + [
        (i, (i * 5 + 1) % 20) for i in range(20)
    ]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (7,), (13,)], "id long")
    a = corpus_dict(random_walks(spark, edges, seeds, walk_len=6))
    b = corpus_dict(random_walks(spark, edges, seeds, walk_len=6))
    assert a == b
    assert len({(w, s) for (w, s) in a}) == len(a)


def test_walks_sink_terminates_and_isolated_seed_emits_step0(spark):
    edge_list = [(0, 1), (1, 2)]  # 2 is a sink
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (9,)], "id long")
    got = corpus_dict(random_walks(spark, edges, seeds, walk_len=5))
    assert got == {(0, 0): 0, (0, 1): 1, (0, 2): 2, (9, 0): 9}


def test_walks_self_loops_do_not_trap(spark):
    edge_list = [(0, 0), (0, 1), (1, 1)]  # self-loops dropped; 1 is a sink
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = corpus_dict(random_walks(spark, edges, seeds, walk_len=4))
    assert got == {(0, 0): 0, (0, 1): 1}
    assert got == walks_python_oracle(edge_list, [0], walk_len=4)
