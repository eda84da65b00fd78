"""Pages generator + extraction invariants + end-to-end CC over pages.

The per-row invariant from BASELINE.json input_hint: extracted text must be
byte-identical per url between the vectorized pandas-UDF path and the
independent per-row reference extractor; and the generator's `text` column
is exactly what extraction recovers from `html`."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_connected_components_spark.functions.extract import (
    extract_links_udf,
    extract_text_udf,
    reference_extract_links,
    reference_extract_text,
)
from parallel_connected_components_spark.operators import (
    audit_id_collisions,
    cc_two_phase,
    count_components,
    edges_from_pages,
    vertices_from_pages,
)
from parallel_connected_components_spark.sources.pages import (
    expected_component_of,
    gen_pages,
)

V, P, L, SEED = 240, 6, 3, 42


def test_pages_schema_and_determinism(spark):
    p1 = gen_pages(spark, V, P, L, SEED)
    assert [f.simpleString() for f in p1.schema.fields] == [
        "url:string", "warc_ts:timestamp", "html:binary", "text:string", "lang:string",
    ]
    assert p1.count() == V
    # deterministic across independent builds and partitioning
    p2 = gen_pages(spark, V, P, L, SEED, num_partitions=3)
    assert (
        p1.select("url", "html", "text", "lang")
        .exceptAll(p2.select("url", "html", "text", "lang"))
        .count()
        == 0
    )


def test_extracted_text_byte_identical_per_url(spark):
    pages = gen_pages(spark, V, P, L, SEED)
    rows = pages.select(
        "url", "html", "text", extract_text_udf("html").alias("udf_text"),
        extract_links_udf("html").alias("udf_links"),
    ).collect()
    assert len(rows) == V
    for r in rows:
        ref_text = reference_extract_text(bytes(r["html"]))
        ref_links = reference_extract_links(bytes(r["html"]))
        # UDF vs independent per-row reference: byte-identical
        assert r["udf_text"].encode() == ref_text.encode(), r["url"]
        assert r["udf_links"] == ref_links, r["url"]
        # generator's text column round-trips through extraction
        assert r["udf_text"] == r["text"]
        assert 1 <= len(ref_links) <= L + 1


def test_no_id_collisions(spark):
    pages = gen_pages(spark, V, P, L, SEED)
    assert audit_id_collisions(pages) == 0


def test_cc_over_pages_matches_block_structure(spark):
    """Flagship end-to-end: pages → pandas-UDF link extraction → edge
    table → two-phase CC → exactly the generator's known component
    structure (component count = P; members grouped by block)."""
    pages = gen_pages(spark, V, P, L, SEED)
    edges = edges_from_pages(pages)
    verts = vertices_from_pages(pages)
    labels, runner = cc_two_phase(spark, edges, vertices=verts)
    assert count_components(labels) == P
    # map hashed vertex ids back to page indices via the url table
    got = (
        labels.join(verts.withColumnsRenamed({"id": "vertex"}), "vertex")
        .select("url", "label")
        .collect()
    )
    # all urls in one generator block must share a label; distinct blocks differ
    by_block: dict[int, set[int]] = {}
    for r in got:
        i = int(r["url"].rsplit("/", 1)[1])
        by_block.setdefault(expected_component_of(i, V, P), set()).add(r["label"])
    assert len(by_block) == P
    labels_seen = set()
    for block, labs in by_block.items():
        assert len(labs) == 1, f"block {block} split: {labs}"
        labels_seen |= labs
    assert len(labels_seen) == P
    assert runner.num_iterations >= 1


def test_hub_skew_variant(spark):
    pages = gen_pages(spark, 200, 4, 5, SEED, hub=True)
    edges = edges_from_pages(pages)
    labels, _ = cc_two_phase(spark, edges)
    assert count_components(labels) == 4


def test_lang_filter_column(spark):
    pages = gen_pages(spark, V, P, L, SEED)
    langs = {r["lang"] for r in pages.select("lang").distinct().collect()}
    assert langs <= {"en", "de", "fr", "es"} and len(langs) == 4
