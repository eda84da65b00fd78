"""S5 fetcher: the full fetch → extract → scan → CC pipeline driven
through a file:// tarball fixture (no network in this sandbox; the same
call takes the real SuiteSparse https URL on a connected machine)."""

from __future__ import annotations

import io
import os
import tarfile

import pytest

from parallel_connected_components_spark.operators.cc import (
    cc_two_phase,
    count_components,
    union_find_oracle,
)
from parallel_connected_components_spark.sources.suitesparse import (
    fetch_matrix,
    load_matrix,
    suitesparse_url,
)

MTX = b"""%%MatrixMarket matrix coordinate pattern symmetric
% tiny fixture in the collection's NAME/NAME.mtx layout
6 6 5
2 1
3 2
3 1
5 4
6 5
"""


def _make_tarball(tmp_path, name="tinygraph"):
    arc = tmp_path / f"{name}.tar.gz"
    with tarfile.open(arc, "w:gz") as tf:
        info = tarfile.TarInfo(f"{name}/{name}.mtx")
        info.size = len(MTX)
        tf.addfile(info, io.BytesIO(MTX))
    return arc


def test_url_shape_matches_reference():
    # download_graph.sh:25 — the canonical collection URL
    assert suitesparse_url("SNAP", "roadNet-CA") == (
        "https://suitesparse-collection-website.herokuapp.com/MM/SNAP/roadNet-CA.tar.gz"
    )


def test_fetch_extract_scan_cc(spark, tmp_path):
    arc = _make_tarball(tmp_path)
    dest = str(tmp_path / "data")
    path = fetch_matrix(dest, url=arc.as_uri())
    assert path.endswith(os.path.join("tinygraph", "tinygraph.mtx"))
    # idempotent re-fetch: cache hit, no second download needed — the
    # tarball is deleted, so only the on-disk cache can satisfy this
    os.unlink(arc)
    assert fetch_matrix(dest, url="file:///nonexistent/tinygraph.tar.gz") == path

    edges, header = load_matrix(spark, dest, url="file:///gone/tinygraph.tar.gz")
    assert header["symmetric"] and header["num_vertices"] == 6
    rows = [(r["src"], r["dst"]) for r in edges.collect()]
    assert sorted(rows) == [(1, 0), (2, 0), (2, 1), (4, 3), (5, 4)]
    labels, _ = cc_two_phase(spark, edges)
    assert count_components(labels) == 2
    uf = union_find_oracle(rows)
    got = {r["vertex"]: r["label"] for r in labels.collect()}
    assert got == {v: uf.get(v, v) for v in got}


def test_traversal_refused(tmp_path):
    arc = tmp_path / "evil.tar.gz"
    with tarfile.open(arc, "w:gz") as tf:
        info = tarfile.TarInfo("../escape.mtx")
        info.size = len(MTX)
        tf.addfile(info, io.BytesIO(MTX))
    with pytest.raises(ValueError, match="escapes dest"):
        fetch_matrix(str(tmp_path / "data"), url=arc.as_uri())
