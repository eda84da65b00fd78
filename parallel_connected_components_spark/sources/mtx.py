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
parallel ``spark.read.text`` scan with a JVM-side ``split``/``cast`` — no
per-row Python anywhere (whole-stage codegen end to end). The single
positional rule — "skip the dims line" — is expressed declaratively: the
dims line's whitespace-normalized token vector is excluded by value. For
``pattern`` matrices this is exact (body lines have 2 tokens, the dims
line has 3); for value-typed matrices a tiny second branch re-adds any
body line that coincidentally matches the dims tokens (normally 0 rows),
so the read is exact in all cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_WS = r"\s+"


def read_mtx_header(path: str) -> dict:
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        banner = f.readline()
        symmetric = "symmetric" in banner.lower()
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        dims_tokens = line.split()
        rows, cols, nnz = (int(x) for x in dims_tokens[:3])
        # Peek one body line to learn its arity: 2 tokens (pattern) vs 3+
        # (explicit values). Decides whether a dims-line collision is even
        # possible below. Empty body (nnz=0) → None.
        body_line = f.readline()
        while body_line.startswith("%") or (body_line and not body_line.strip()):
            body_line = f.readline()
        body_arity = len(body_line.split()) if body_line.strip() else None
    return {
        "symmetric": symmetric,
        "rows": rows,
        "cols": cols,
        "nnz": nnz,
        "num_vertices": max(rows, cols),
        "dims_tokens": dims_tokens,
        "body_arity": body_arity,
    }


def read_mtx(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """→ (edges(src long, dst long): raw directed 0-indexed pairs, header).

    Self-loops and duplicates are intentionally kept here — dropping
    self-loops is the graph builder's job (mirrors graph_add_edge's
    skip at src/graph.c:70-73 living in the build, not the scan).
    """
    header = read_mtx_header(path)
    dims = F.array(*(F.lit(t) for t in header["dims_tokens"]))

    # ANSI-mode gotcha: F.trim strips only 0x20, but MTX whitespace is any
    # of space/tab (mtx_reader.c uses fscanf %d which skips all C
    # whitespace). A tab-indented body line would otherwise tokenize with
    # an empty first token → NULL src. Regex-trim both ends instead.
    norm = F.regexp_replace(F.col("value"), r"^\s+|\s+$", "")
    body = (
        spark.read.text(path)
        .where(~F.col("value").startswith("%"))
        .select(norm.alias("norm"))
        .where(F.col("norm") != "")
        .select(F.split(F.col("norm"), _WS).alias("tok"))
    )
    parsed = body.select(
        (F.col("tok")[0].cast(LongType()) - 1).alias("src"),
        (F.col("tok")[1].cast(LongType()) - 1).alias("dst"),
        "tok",
    )
    edges = parsed.where(F.col("tok") != dims).drop("tok")

    if header["body_arity"] is not None and header["body_arity"] >= 3:
        # Value-typed matrix: a body line can be byte-equal to the dims
        # line ("rows cols nnz" vs "src dst val"). All matching lines are
        # identical, so keep all but one — the window touches only those
        # few rows (normally exactly the dims line itself).
        w = Window.partitionBy(F.lit(1)).orderBy(F.lit(1))
        extras = (
            parsed.where(F.col("tok") == dims)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") > 1)
            .select("src", "dst")
        )
        edges = edges.unionByName(extras)
    return edges, header


def write_mtx(edges_canonical: DataFrame, num_vertices: int, path: str) -> None:
    """Sink a canonical (src<dst, deduped) edge table as a symmetric MTX
    file — the reference generator's output format
    (/root/reference/tools/generate_graph.c:69-81).

    Distributed: each body line is formatted as a JVM column expression and
    written via ``spark.write.text`` (header prepended driver-side — two
    constant lines). The body stream never touches the driver, so an
    18M-edge export runs with flat driver memory; only the final
    part-file concatenation is local I/O. The single output file is a
    format constraint (MTX has a one-line header with the exact nnz), not
    a scale ambition — at scale you'd sink parquet via TableLayer."""
    import glob
    import os
    import shutil
    import tempfile

    nnz = edges_canonical.count()
    tmp_dir = tempfile.mkdtemp(prefix="mtx_body_", dir=os.path.dirname(path) or ".")
    body_dir = os.path.join(tmp_dir, "body")
    (
        edges_canonical.select(
            F.concat(
                (F.col("src") + 1).cast("string"),
                F.lit(" "),
                (F.col("dst") + 1).cast("string"),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(body_dir)
    )
    try:
        with open(path, "w", encoding="utf-8") as f:
            f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
            f.write(f"{num_vertices} {num_vertices} {nnz}\n")
            for part in sorted(glob.glob(os.path.join(body_dir, "part-*"))):
                with open(part, "r", encoding="utf-8") as p:
                    shutil.copyfileobj(p, f)
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
