"""ANF sketch propagation vs the independent Python simulation (same
portable hash ⇒ exact integer match), plus structural properties the
derived sf graph doesn't pin. The bit-exact DuckDB twin lives in
entry._anf_sql."""

from __future__ import annotations

import random

import pytest

from parallel_connected_components_spark.operators import (
    anf,
    anf_python_oracle,
    neighborhood_estimate,
)


def sym(edge_list):
    return list({(u, v) for u, v in edge_list} | {(v, u) for u, v in edge_list})


def regs_dict(df):
    return {r["vertex"]: (r["r0"], r["r1"], r["r2"], r["r3"]) for r in df.collect()}


@pytest.mark.parametrize("seed", [1, 2])
def test_anf_differential_random(spark, seed):
    rng = random.Random(seed)
    edge_list = sym([(rng.randrange(40), rng.randrange(40)) for _ in range(90)])
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got, _ = anf(spark, edges, rounds=3)
    assert regs_dict(got) == anf_python_oracle(edge_list, rounds=3)


def test_anf_saturated_component_registers_agree(spark):
    """Once rounds >= diameter, every vertex's sketch is the OR over its
    whole component — all members must carry identical registers, and
    two components must differ (hash-random masks)."""
    edge_list = sym([(0, 1), (1, 2), (2, 3), (10, 11), (11, 12)])
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got, runner = anf(spark, edges, rounds=10)
    g = regs_dict(got)
    assert g[0] == g[1] == g[2] == g[3]
    assert g[10] == g[11] == g[12]
    assert g[0] != g[10]
    # early stop: the sketches stop growing at the diameter, not round 10
    assert runner.num_iterations < 10
    assert g == anf_python_oracle(edge_list, rounds=10)


def test_anf_isolated_vertex_and_universe(spark):
    edges = spark.createDataFrame(sym([(0, 1)]), "src long, dst long")
    verts = spark.createDataFrame([(0,), (1,), (7,)], "id long")
    got, _ = anf(spark, edges, rounds=2, vertices=verts)
    g = regs_dict(got)
    assert set(g) == {0, 1, 7}
    assert g[7] == anf_python_oracle([], rounds=2, vertex_ids=[7])[7]


def test_anf_neighborhood_function_monotone_and_effective_diameter(spark):
    """N(t) rides the Observation — recorded per round, monotone
    nondecreasing (sketch unions only grow); on a long path the 90%
    effective diameter lands well past 1 hop, on a clique at 1."""
    from parallel_connected_components_spark.operators import effective_diameter

    path = sym([(i, i + 1) for i in range(12)])
    edges = spark.createDataFrame(path, "src long, dst long")
    got, runner = anf(spark, edges, rounds=12)
    got.count()
    nfs = [
        m.extra["neighborhood_function"]
        for m in runner.metrics
        if "neighborhood_function" in m.extra
    ]
    assert len(nfs) == runner.num_iterations
    assert all(b >= a * (1 - 1e-12) for a, b in zip(nfs, nfs[1:]))
    ed_path = effective_diameter(runner, ratio=0.9)
    assert ed_path is not None and ed_path >= 3

    clique = sym([(i, j) for i in range(5) for j in range(i + 1, 5)])
    cedges = spark.createDataFrame(clique, "src long, dst long")
    got2, runner2 = anf(spark, cedges, rounds=6)
    got2.count()
    assert effective_diameter(runner2, ratio=0.9) == 1


@pytest.mark.parametrize("seed", [7, 8])
def test_harmonic_differential_random(spark, seed):
    from parallel_connected_components_spark.operators import (
        harmonic_centrality,
        harmonic_python_oracle,
    )

    rng = random.Random(seed)
    edge_list = sym([(rng.randrange(35), rng.randrange(35)) for _ in range(80)])
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got, _ = harmonic_centrality(spark, edges, rounds=3)
    g = {r["vertex"]: r["score"] for r in got.collect()}
    assert g == harmonic_python_oracle(edge_list, rounds=3)


def test_harmonic_early_stop_equals_full_unroll(spark):
    """Saturating before the round cap must give the same scores as
    running every round (the Δest telescoping adds 0 after saturation) —
    the property that lets the fixed-K SQL twin stay exact."""
    from parallel_connected_components_spark.operators import (
        harmonic_centrality,
        harmonic_python_oracle,
    )

    edge_list = sym([(0, 1), (1, 2), (10, 11)])
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got, runner = harmonic_centrality(spark, edges, rounds=8)
    g = {r["vertex"]: r["score"] for r in got.collect()}
    assert runner.num_iterations < 8  # early stop actually fired
    assert g == harmonic_python_oracle(edge_list, rounds=8)


def test_anf_estimate_grows_with_ball(spark):
    """The float estimate is monotone in the registers: a 9-vertex star
    center's 1-round ball (everything) must estimate larger than a leaf
    of a 2-vertex component."""
    star = sym([(0, i) for i in range(1, 9)])
    edge_list = star + sym([(100, 101)])
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got, _ = anf(spark, edges, rounds=1)
    est = {
        r["vertex"]: r["ball_estimate"]
        for r in neighborhood_estimate(got).collect()
    }
    assert est[0] > est[100]
