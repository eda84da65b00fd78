"""Deterministic Common-Crawl-style pages generator.

Port of the reference's synthetic-graph generator property
(/root/reference/tools/generate_graph.c:43-66 — P components, spanning
tree per component + extra intra-component edges, so the component count
is known *by construction*), lifted from an MTX edge list to a pages
table ``(url, warc_ts, html, text, lang)`` per BASELINE.json input_hint.

Two deliberate differences from the reference:
- the reference seeds with ``time(NULL)`` (tools/generate_graph.c:25) and
  is therefore unreproducible; we derive every choice from
  ``xxhash64(id, k, seed)`` so the same arguments always give the same
  table, on any partitioning;
- generation is a Spark plan (``spark.range`` + built-in functions, fully
  JVM-side / whole-stage-codegen), not a driver loop, so it scales with
  the cluster.

Component structure: pages are split into ``num_components`` contiguous
blocks; page ``i`` (``i > block_start``) always links to ``i-1`` (the
spanning path), plus ``links_per_page`` extra links to pseudo-random
in-block targets. All links stay inside the block, so
``component(i) = block_start(i)`` exactly — used as the golden oracle.

``hub=True`` points every extra link at the block root, producing the
power-law hub skew the reference's Afforest path special-cases
(/root/reference/src/cc_openmp.c:596-613).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ("en", "de", "fr", "es")


def _block_size(num_pages: int, num_components: int) -> int:
    return max(1, -(-num_pages // num_components))  # ceil div


def expected_component_of(i: int, num_pages: int, num_components: int) -> int:
    """Golden oracle: min page-index of i's component (block start)."""
    bs = _block_size(num_pages, num_components)
    return (i // bs) * bs


def page_url(component_expr, id_expr):
    return F.concat(
        F.lit("https://w"), component_expr.cast("string"),
        F.lit(".example.org/p/"), id_expr.cast("string"),
    )


def gen_pages(
    spark: SparkSession,
    num_pages: int,
    num_components: int = 8,
    links_per_page: int = 3,
    seed: int = 42,
    hub: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Pages DataFrame with schema (url string, warc_ts timestamp,
    html binary, text string, lang string)."""
    bs = _block_size(num_pages, num_components)
    rng = spark.range(0, num_pages, 1, num_partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    block_start = (i - i % bs).alias("block_start")
    comp = (i / bs).cast("long")

    df = rng.select(
        i.alias("i"),
        block_start,
        comp.alias("comp"),
    )

    # Spanning-path link + extra pseudo-random in-block links.
    link_targets = [
        F.when(F.col("i") > F.col("block_start"), F.col("i") - 1).otherwise(F.lit(None))
    ]
    for k in range(links_per_page):
        if hub:
            t = F.col("block_start")
        else:
            h = F.xxhash64(F.col("i"), F.lit(k), F.lit(seed))
            span = F.least(
                F.lit(bs), F.lit(num_pages) - F.col("block_start")
            )  # last block may be short
            t = F.col("block_start") + F.pmod(h, span)
        link_targets.append(t)

    links = F.filter(F.array(*link_targets), lambda x: x.isNotNull())
    link_urls = F.transform(
        links,
        lambda t: page_url((t / F.lit(bs)).cast("long"), t),
    )

    text = F.concat(
        F.lit("Page "), F.col("i").cast("string"),
        F.lit(" of component "), F.col("comp").cast("string"),
        F.lit(". Token "),
        F.pmod(F.xxhash64(F.col("i"), F.lit("tok"), F.lit(seed)), F.lit(9973)).cast("string"),
        F.lit(" closes the paragraph."),
    )

    anchors = F.concat_ws(
        "",
        F.transform(
            link_urls,
            lambda u: F.concat(F.lit('<a href="'), u, F.lit('">link</a>')),
        ),
    )
    html = F.concat(
        F.lit("<html><head><title>p"), F.col("i").cast("string"),
        F.lit("</title></head><body><p>"), text,
        F.lit("</p>"), anchors, F.lit("</body></html>"),
    )

    return df.select(
        page_url(F.col("comp"), F.col("i")).alias("url"),
        F.timestamp_seconds(F.lit(1767225600) + F.col("i")).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(lang) for lang in LANGS]),
            (F.pmod(F.xxhash64(F.col("i"), F.lit("lang"), F.lit(seed)), F.lit(len(LANGS))) + 1).cast("int"),
        ).alias("lang"),
    )
