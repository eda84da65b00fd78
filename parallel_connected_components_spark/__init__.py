"""parallel_connected_components_spark — a from-scratch PySpark-native
link-graph analytics engine.

Capability parity target: ktsoupos/parallel_connected_components
(/root/reference, C + OpenMP/OpenCilk/pthreads/MPI), re-expressed
Spark-first per SURVEY.md: DataFrame/Catalyst plans, vectorized
pandas/Arrow UDFs for extraction, explicit partitioning/skew handling,
checkpointed + resumable iterative fixpoints.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, tuned shuffle).
- ``sources``    deterministic pages generator, MTX reader, table layer.
- ``functions``  pandas-UDF link/text extraction, portable hashing,
                 text-analysis functions.
- ``operators``  graph build, connected components (large-star/small-star,
                 two-phase union-find, label propagation), PageRank, LPA,
                 triangles, stats/skew, dedup, similarity, multimodal.
- ``plans``      iterative fixpoint runner with checkpoint/resume/metrics.
- ``streaming``  Structured Streaming counterparts for the events table.
"""

__version__ = "0.1.0"
