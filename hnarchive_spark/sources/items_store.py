"""The items store (K5) — the engine's system-of-record on plain parquet.

The reference's store is a SQLite file with six indexes (hnarchive.py:34-78).
Here it is a partitioned parquet directory with layout chosen per SURVEY
§1.4: partitioned by ``type`` (the composite-index column), sorted by ``id``
within files so min-max stats give point-lookup file skipping, and with the
``age_at_retrieval`` expression-index column materialized.

Writes are versioned directories + an atomic `_CURRENT` pointer swap — the
commit boundary (K1): readers always see a complete snapshot, a crashed
write leaves the previous version intact (the parquet stand-in for a Delta
transaction; on a real deployment this class would wrap a Delta/Iceberg
table and ``merge_batch`` would emit MERGE INTO).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnarchive_spark.operators.merge import merge_items
from hnarchive_spark.schema import ITEMS_SCHEMA


class ItemsStore:
    def __init__(self, spark: SparkSession, path: str, keep_versions: int = 2):
        self.spark = spark
        self.path = path
        # snapshots retained beyond the current one (cheap time travel /
        # safe rollback window — the parquet analog of Delta VACUUM policy)
        self.keep_versions = max(0, keep_versions)
        os.makedirs(path, exist_ok=True)

    # -- snapshot management -------------------------------------------------

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def _current_version(self) -> int | None:
        try:
            with open(self._pointer) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"v{v:06d}")

    def versions(self) -> list[int]:
        """Snapshot versions currently on disk (ascending)."""
        out = []
        for name in os.listdir(self.path):
            if name.startswith("v") and name[1:].isdigit():
                out.append(int(name[1:]))
        return sorted(out)

    def read(self, version: int | None = None) -> DataFrame:
        """Read the current snapshot, or a retained past one (time travel)."""
        v = self._current_version() if version is None else version
        if v is None:
            return self.spark.createDataFrame([], schema=ITEMS_SCHEMA)
        if version is not None and version not in self.versions():
            raise ValueError(
                f"version {version} not retained (have {self.versions()})"
            )
        return self.spark.read.parquet(self._version_dir(v))

    def _commit(self, df: DataFrame) -> None:
        """K1 commit: write a new version dir, fsync the pointer swap."""
        old = self._current_version()
        new = (old or 0) + 1
        out = self._version_dir(new)
        (
            df.repartition("type")
            .sortWithinPartitions("id")
            .write.mode("overwrite")
            .option("compression", "zstd")
            .partitionBy("type")
            .parquet(out)
        )
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(new))
        os.replace(tmp, self._pointer)
        # vacuum: drop snapshots older than the retention window
        for v in self.versions():
            if v < new - self.keep_versions:
                shutil.rmtree(self._version_dir(v), ignore_errors=True)

    # -- the reference's store API -------------------------------------------

    def merge_batch(self, updates: DataFrame, seq_col: str | None = None) -> None:
        """K2 insert_items: one merge per batch (the commit cadence of the
        reference's commit_period becomes the batch boundary)."""
        current = self.read().select(*[f.name for f in ITEMS_SCHEMA.fields])
        merged = merge_items(current, updates, seq_col=seq_col)
        self._commit(merged)

    def latest_id(self) -> int:
        """Q4 select_latest_id (offset recovery, hnarchive.py:285-290)."""
        row = self.read().agg(F.max("id").alias("m")).collect()[0]
        return int(row["m"]) if row["m"] is not None else 0

    def count(self) -> int:
        return self.read().count()
