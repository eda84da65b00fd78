"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over parallel_connected_components_spark.entry — the engine's
query registry. Each ``queries()`` entry is an implemented operator from
SURVEY.md §2 (graph build, 5 CC algorithms — incl. the cc_auto
high-diameter hybrid — sharing one recursive-CTE oracle,
degree/component stats, triangles, PageRank, LPA) plus the
training-data ops (token/quality/lang/fingerprint, exact + MinHash +
SimHash + n-gram-Jaccard dedup incl. end-to-end dup_clusters,
brute-force kNN, real PPM/PNG/JPEG/WAV multimodal decode, events
windows, TPC-H-style star joins, MP3/MP4 container metadata) and the
r5 link-graph additions: personalized PageRank, HITS
hubs/authorities, SCC via trim+coloring, k-core decomposition
(iterated H-index), multi-source k-hop BFS, ANF neighborhood
sketches + harmonic centrality, deterministic random-walk corpus
sampling + skip-gram co-occurrence, the structural-statistics family
(clustering coefficients, transitivity, degree assortativity,
reciprocity, per-edge triangle support, staged k-truss decomposition)
and common-neighbor link prediction (Jaccard + resource-allocation,
bit-exact by construction) — each bit-exact against an unrolled or
recursive-closure DuckDB twin. 61 queries, 61 exact DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from parallel_connected_components_spark import entry as _entry  # noqa: E402
from parallel_connected_components_spark.session import _ship_package  # noqa: E402

_QUERIES, _ORACLES = _entry.build_queries()


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the driver builds its own session: ship our package to its
        # Python workers so pandas-UDF closures resolve (= --py-files)
        try:
            _ship_package(spark)
        except Exception:
            pass  # already shipped or local source tree importable
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    try:
        _ship_package(spark)
    except Exception:
        pass
    return _entry.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
