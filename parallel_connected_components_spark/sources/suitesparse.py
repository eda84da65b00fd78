"""SuiteSparse Matrix Collection fetcher (SURVEY §2.1 S5).

Port of the reference's downloader semantics
(/root/reference/scripts/download_graph.sh): given GROUP/NAME, fetch
``https://suitesparse-collection-website.herokuapp.com/MM/GROUP/NAME.tar.gz``,
extract, and hand the contained ``.mtx`` to the scan layer
(:func:`..sources.mtx.read_mtx`).

The sandbox has no network, so the transport is ``urllib`` over ANY url
scheme — the test suite drives the complete fetch → extract → scan →
CC pipeline through a ``file://`` tarball fixture; on a connected
machine the same call takes the real https URL (or a ``url=`` override
for mirrors). Extraction refuses path traversal (members must resolve
inside the destination) and caches by archive name: re-fetch is a no-op
if the ``.mtx`` is already on disk — the same idempotence the shell
script gets from re-running wget into ``data/``.
"""

from __future__ import annotations

import os
import tarfile
import tempfile
import urllib.request

SUITESPARSE_URL = (
    "https://suitesparse-collection-website.herokuapp.com/MM/{group}/{name}.tar.gz"
)


def suitesparse_url(group: str, name: str) -> str:
    return SUITESPARSE_URL.format(group=group, name=name)


def fetch_matrix(
    dest_dir: str,
    group: str | None = None,
    name: str | None = None,
    url: str | None = None,
    timeout: int = 120,
) -> str:
    """Fetch + extract one matrix archive; → path of the extracted .mtx.

    Either ``group``+``name`` (builds the canonical SuiteSparse URL) or an
    explicit ``url`` (mirror, or ``file://`` for offline fixtures)."""
    if url is None:
        if not (group and name):
            raise ValueError("need group+name or an explicit url")
        url = suitesparse_url(group, name)
    base = os.path.basename(url.rstrip("/"))
    stem = base[: -len(".tar.gz")] if base.endswith(".tar.gz") else os.path.splitext(base)[0]
    os.makedirs(dest_dir, exist_ok=True)
    # cache hit: an .mtx for this archive already extracted
    existing = _find_mtx(dest_dir, stem)
    if existing:
        return existing

    with tempfile.NamedTemporaryFile(suffix=".tar.gz", delete=False) as tmp:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                tmp.write(chunk)
        archive = tmp.name
    try:
        with tarfile.open(archive, "r:gz") as tf:
            dest_real = os.path.realpath(dest_dir)
            for member in tf.getmembers():
                # plain-path pre-check (clear error message), PLUS the
                # stdlib 'data' filter below — realpath alone is TOCTOU-
                # defeatable by a symlink member followed by a write
                # through it (round-4 review); the data filter rejects
                # links, devices and absolute/parent paths at extract time
                target = os.path.realpath(os.path.join(dest_dir, member.name))
                if not (target == dest_real or target.startswith(dest_real + os.sep)):
                    raise ValueError(f"archive member escapes dest: {member.name}")
            if hasattr(tarfile, "data_filter"):
                try:
                    tf.extractall(dest_dir, filter="data")
                except tarfile.FilterError as exc:
                    raise ValueError(f"unsafe archive member: {exc}") from exc
            else:
                # Python < 3.10.12/3.11.4/3.12 has no extraction filters;
                # the realpath containment pre-check above already rejected
                # path traversal, so degrade rather than fail the fetch
                tf.extractall(dest_dir)  # noqa: S202 — members pre-validated
    finally:
        os.unlink(archive)
    found = _find_mtx(dest_dir, stem)
    if not found:
        raise FileNotFoundError(f"no .mtx inside {url}")
    return found


def _find_mtx(root: str, stem: str) -> str | None:
    """The collection packs NAME/NAME.mtx; prefer the stem-named file,
    fall back to any .mtx under the stem's directory."""
    preferred = os.path.join(root, stem, f"{stem}.mtx")
    if os.path.exists(preferred):
        return preferred
    cand_dir = os.path.join(root, stem)
    if os.path.isdir(cand_dir):
        for dirpath, _dirs, files in os.walk(cand_dir):
            for f in sorted(files):
                if f.endswith(".mtx"):
                    return os.path.join(dirpath, f)
    return None


def load_matrix(spark, dest_dir: str, **fetch_kwargs):
    """fetch + scan in one call → (edges DataFrame, header dict)."""
    from .mtx import read_mtx

    path = fetch_matrix(dest_dir, **fetch_kwargs)
    return read_mtx(spark, path)
