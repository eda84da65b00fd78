"""Matrix Market edge-list scan as a DataFrame plan.

Parity with the reference's reader (/root/reference/src/mtx_reader.c):
- ``%`` comment lines skipped (mtx_reader.c:13-38);
- header ``rows cols nnz`` line; non-square tolerated with
  ``V = max(rows, cols)`` (mtx_reader.c:119-125);
- ``symmetric`` detected from the banner (mtx_reader.c:44-76) — kept as a
  flag for the caller (the graph builder symmetrizes regardless, matching
  graph_add_edge inserting both directions, src/graph.c:75-104);
- 1-indexed ids converted to 0-indexed (mtx_reader.c:165-167);
- optional third value column parsed and discarded (mtx_reader.c:152-163).

Unlike the C reader (sequential fscanf loop) this is a distributed scan:
banner/dims are read driver-side from the first bytes; the edge body is a
parallel text scan + split/cast. The one imperative bit — "skip the single
header line" — is a per-partition rule (only the partition containing the
file start drops its first non-comment line), which is exactly the kind of
per-partition logic RDD glue is reserved for in SURVEY.md §2.10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StructField, StructType

_EDGE_SCHEMA = StructType(
    [StructField("src", LongType(), False), StructField("dst", LongType(), False)]
)


def read_mtx_header(path: str) -> dict:
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        banner = f.readline()
        symmetric = "symmetric" in banner.lower()
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        rows, cols, nnz = (int(x) for x in line.split()[:3])
    return {
        "symmetric": symmetric,
        "rows": rows,
        "cols": cols,
        "nnz": nnz,
        "num_vertices": max(rows, cols),
    }


def read_mtx(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """→ (edges(src long, dst long): raw directed 0-indexed pairs, header).

    Self-loops and duplicates are intentionally kept here — dropping
    self-loops is the graph builder's job (mirrors graph_add_edge's
    skip at src/graph.c:70-73 living in the build, not the scan).
    """
    header = read_mtx_header(path)

    # Number of physical lines up to and including the dims line, counted
    # driver-side (the header is tiny by format definition). Body lines
    # are then identified positionally via zipWithIndex — deterministic
    # for text inputs regardless of how blocks split across partitions.
    n_skip = 0
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            n_skip += 1
            if not line.startswith("%"):
                break

    def parse(pair):
        line, _ = pair
        parts = line.split()
        return (int(parts[0]) - 1, int(parts[1]) - 1)

    rdd = (
        spark.sparkContext.textFile(path)
        .zipWithIndex()
        .filter(lambda p: p[1] >= n_skip and p[0].strip() and not p[0].startswith("%"))
        .map(parse)
    )
    edges = spark.createDataFrame(rdd, _EDGE_SCHEMA)
    return edges, header


def write_mtx(edges_canonical: DataFrame, num_vertices: int, path: str) -> None:
    """Sink a canonical (src<dst, deduped) edge table as a symmetric MTX
    file — the reference generator's output format
    (/root/reference/tools/generate_graph.c:69-81). Driver-side collect:
    test/tool use only."""
    rows = edges_canonical.select("src", "dst").collect()
    with open(path, "w", encoding="utf-8") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
        f.write(f"{num_vertices} {num_vertices} {len(rows)}\n")
        for r in rows:
            f.write(f"{r['src'] + 1} {r['dst'] + 1}\n")
