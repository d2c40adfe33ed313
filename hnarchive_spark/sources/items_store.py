"""The items store (K5) — the engine's system-of-record on plain parquet.

The reference's store is a SQLite file with six indexes (hnarchive.py:34-78).
Here it is a partitioned parquet directory with layout chosen per SURVEY
§1.4: partitioned by ``id_bucket`` (id div bucket_size — the pruning unit for
merges and id-range scans) then ``type`` (the composite-index column), sorted
by ``id`` within files so min-max stats give point-lookup file skipping, and
with the ``age_at_retrieval`` expression-index column materialized.

Writes are versioned directories + an atomic `_CURRENT` pointer swap — the
commit boundary (K1): readers always see a complete snapshot, a crashed
write leaves the previous version intact (the parquet stand-in for a Delta
transaction; on a real deployment this class would wrap a Delta/Iceberg
table and ``merge_batch`` would emit MERGE INTO).

Merge cost (the reference's 200-id commit cadence, hnarchive.py:255-262):
``merge_batch`` joins and rewrites ONLY the id buckets the batch touches;
every other bucket is copied forward into the new snapshot as hardlinks —
byte-identical files, O(1) I/O per file, the filesystem analog of a Delta
manifest referencing unchanged data files.  A 200-id commit against a 25M-row
store therefore rewrites ~1 bucket, not the store.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import LongType, StructField, StructType

from hnarchive_spark.operators.merge import merge_items
from hnarchive_spark.schema import ITEMS_SCHEMA

_BUCKET_COL = "id_bucket"

# Snapshot schema as written by _write_snapshot: the items columns plus the
# id_bucket partition column (``type`` doubles as the second partition key
# but keeps its ITEMS_SCHEMA slot).  Used to skip footer schema inference
# on every bucketed read.
_RAW_SCHEMA = StructType(
    list(ITEMS_SCHEMA.fields) + [StructField(_BUCKET_COL, LongType())]
)


class ItemsStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keep_versions: int = 2,
        bucket_size: int = 100_000,
    ):
        self.spark = spark
        self.path = path
        # snapshots retained beyond the current one (cheap time travel /
        # safe rollback window — the parquet analog of Delta VACUUM policy)
        self.keep_versions = max(0, keep_versions)
        # merge/prune granularity: ids per bucket.  100k buckets a 25M-row
        # store into 250 partitions; a 200-id commit touches 1-2 of them.
        self.bucket_size = max(1, bucket_size)
        os.makedirs(path, exist_ok=True)
        # Layout metadata is PERSISTED and wins over the constructor arg:
        # the on-disk id_bucket dirs encode one specific granularity, and a
        # reopen with a different bucket_size would misprune merges (touched
        # buckets computed at the new size, copy-forward listed at the old).
        # The constructor arg only seeds a brand-new store (or a legacy one
        # from before metadata existed — adopted on its next pointer swap).
        persisted = self._read_meta()
        if persisted is not None:
            self.bucket_size = persisted

    # -- layout metadata -----------------------------------------------------

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "_META.json")

    def _read_meta(self) -> int | None:
        try:
            with open(self._meta_path) as fh:
                return int(json.load(fh)["bucket_size"])
        except (FileNotFoundError, KeyError, ValueError):
            return None

    def _write_meta(self) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"bucket_size": self.bucket_size}, fh)
        os.replace(tmp, self._meta_path)

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

    def _read_raw(self, version: int | None = None) -> DataFrame:
        """Snapshot INCLUDING the ``id_bucket`` partition column."""
        v = self._current_version() if version is None else version
        if v is None:
            return (
                self.spark.createDataFrame([], schema=ITEMS_SCHEMA)
                .withColumn(_BUCKET_COL, F.lit(0).cast("long"))
            )
        if version is not None and version not in self.versions():
            raise ValueError(
                f"version {version} not retained (have {self.versions()})"
            )
        d = self._version_dir(v)
        # Bucketed layouts (every snapshot this class writes) are read with
        # the schema PINNED: the store knows its own schema, so paying
        # parquet-footer inference on every commit is pure per-commit floor
        # (measured ~84 ms/commit at sf0.1 — tools/merge_floor_probe.py,
        # BENCH_NOTES r10).  Only a LEGACY un-bucketed dir (loose parquet
        # files, no id_bucket= partitions) keeps inference, so the
        # migration fallback in merge_batch still sees the true columns.
        # A zero-row snapshot (no partition dirs at all — a store whose
        # first commit was an empty batch) also takes the pinned path:
        # inference would fail on it, the pinned read correctly returns
        # an empty frame.
        if self._legacy_layout(os.listdir(d)):
            return self.spark.read.parquet(d)
        return self.spark.read.schema(_RAW_SCHEMA).parquet(d)

    @staticmethod
    def _legacy_layout(names: list[str]) -> bool:
        """A snapshot dir NOT written by :meth:`_write_snapshot`: loose
        parquet files with no ``id_bucket=`` partitions, or partition
        directories keyed by anything OTHER than ``id_bucket`` (ADVICE
        r18: a store partitioned by a foreign key would otherwise be
        misread with the pinned _RAW_SCHEMA).  Mirrors _read_raw's
        documented assumptions."""
        foreign = any(
            "=" in n and not n.startswith(f"{_BUCKET_COL}=") for n in names
        )
        loose = any(n.endswith(".parquet") for n in names) and not any(
            n.startswith(f"{_BUCKET_COL}=") for n in names
        )
        return foreign or loose

    def read(self, version: int | None = None) -> DataFrame:
        """Read the current snapshot, or a retained past one (time travel).

        The internal ``id_bucket`` partition column is dropped — the public
        schema is exactly the items schema (it is derivable as
        ``id div bucket_size``)."""
        return self._read_raw(version).drop(_BUCKET_COL)

    def _write_snapshot(self, df: DataFrame, out: str) -> None:
        (
            df.withColumn(_BUCKET_COL, F.expr(f"id div {self.bucket_size}"))
            .repartition(_BUCKET_COL, "type")
            .sortWithinPartitions("id")
            .write.mode("overwrite")
            .option("compression", "zstd")
            .partitionBy(_BUCKET_COL, "type")
            .parquet(out)
        )

    @staticmethod
    def _link_forward(src: str, dst: str) -> None:
        """Copy-forward a partition subtree as hardlinks (byte-identical,
        O(1) I/O per file); falls back to a real copy across devices."""
        for root, _dirs, files in os.walk(src):
            rel = os.path.relpath(root, src)
            target_dir = os.path.join(dst, rel) if rel != "." else dst
            os.makedirs(target_dir, exist_ok=True)
            for name in files:
                s, t = os.path.join(root, name), os.path.join(target_dir, name)
                try:
                    os.link(s, t)
                except OSError:
                    shutil.copy2(s, t)

    def _swap_pointer(self, new: int) -> None:
        self._write_meta()  # layout granularity travels with every snapshot
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(new))
        os.replace(tmp, self._pointer)
        # vacuum: drop snapshots older than the retention window (hardlinked
        # files shared with newer snapshots survive the unlink)
        for v in self.versions():
            if v < new - self.keep_versions:
                shutil.rmtree(self._version_dir(v), ignore_errors=True)

    def _commit(self, df: DataFrame) -> None:
        """K1 commit: write a full new version dir, fsync the pointer swap."""
        old = self._current_version()
        new = (old or 0) + 1
        self._write_snapshot(df, self._version_dir(new))
        self._swap_pointer(new)

    # -- the reference's store API -------------------------------------------

    def merge_batch(self, updates: DataFrame, seq_col: str | None = None) -> None:
        """K2 insert_items: one merge per batch (the commit cadence of the
        reference's commit_period becomes the batch boundary).

        Partition-pruned: the full-outer merge join and the rewrite are
        restricted to the id buckets present in the batch; untouched buckets
        are hardlinked forward unchanged (`test_store_layout.py` asserts
        byte-identity across a merge)."""
        item_cols = [f.name for f in ITEMS_SCHEMA.fields]
        old_v = self._current_version()
        if old_v is None:
            merged = merge_items(self.read().select(*item_cols), updates, seq_col=seq_col)
            self._commit(merged)
            return
        # legacy detection straight from the version dir's entries — the
        # pruned path below never builds a whole-store DataFrame, so the
        # per-commit driver file-listing is O(touched buckets), not
        # O(store) (guide §6: listing is driver-side, single-process work;
        # at production bucket counts the full-store InMemoryFileIndex
        # walk per 200-row commit IS the commit floor)
        d = self._version_dir(old_v)
        if self._legacy_layout(os.listdir(d)):
            # legacy layout (no id_bucket partitions): fall back to a full
            # merge once; the rewrite migrates the store to bucketed dirs
            raw = self.spark.read.parquet(d)
            merged = merge_items(raw.select(*item_cols), updates, seq_col=seq_col)
            self._commit(merged)
            return
        # materialize the batch once: it feeds two consumers (touched-bucket
        # listing + the merge) and may be an HTTP fetch pipeline that must
        # not re-run per action.  persist + the bucket-listing collect does
        # both in ONE job (the eager localCheckpoint used here before was a
        # separate whole-batch pass per commit purely to cut lineage).
        # Guarantee scope, stated honestly (ADVICE r18): in the
        # single-process local deployment a cached block cannot be lost, so
        # the batch is computed exactly once.  On a real cluster a lost
        # executor would silently RECOMPUTE lost partitions from lineage —
        # a nondeterministic source could then diverge between the listing
        # and the merge (localCheckpoint would fail-stop instead).  If
        # exactly-once fetch is contractual there, use a reliable
        # checkpoint / persisted staging table for the batch.
        from pyspark import StorageLevel

        updates = updates.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            self._merge_pruned(updates, item_cols, old_v, seq_col)
        finally:
            updates.unpersist()

    def _merge_pruned(self, updates, item_cols, old_v, seq_col) -> None:
        touched = sorted(
            r[0]
            for r in updates.select(
                F.expr(f"id div {self.bucket_size}").alias("b")
            ).distinct().collect()
        )
        if not touched:
            # Zero-row batch (an idle livestream tick committing on cadence):
            # the merge is the identity, so skip the merge plan and the
            # snapshot write JOB entirely — hardlink the whole previous
            # snapshot forward and swap. Drops the measured commit floor
            # from ~0.64 s to ~0.14 s (snapshot open, batch checkpoint and
            # bucket listing are still paid before this point; link+swap
            # itself is ~0.01 s — tools/merge_floor_probe.py, BENCH_NOTES
            # r10). Schema errors must still fail FAST on idle ticks — a
            # misconfigured stream would otherwise commit versions happily
            # until the first non-empty batch — so run the SAME analysis
            # the real merge performs: build (never execute) the merge plan
            # against a 0-row current.  Spark analyzes DataFrames eagerly,
            # so missing columns AND type mismatches the join/coalesce spec
            # would reject surface here, on the idle tick.
            if seq_col is not None and seq_col not in updates.columns:
                raise ValueError(f"seq_col {seq_col!r} not in batch columns")
            probe = merge_items(
                self.spark.createDataFrame([], schema=ITEMS_SCHEMA).select(*item_cols),
                updates,
                seq_col=seq_col,
            )
            # analysis alone lets Spark COERCE a mistyped column (a string
            # score coalesces to string) — exactly the drift a non-empty
            # merge would then write into the snapshot schema.  Reject any
            # batch whose merged plan doesn't come out at ITEMS_SCHEMA.
            expect = {f.name: f.dataType for f in ITEMS_SCHEMA.fields}
            got = {f.name: f.dataType for f in probe.schema.fields}
            if got != expect:
                bad = sorted(c for c in expect if got.get(c) != expect[c])
                raise ValueError(
                    f"idle-tick batch schema would drift the store: "
                    f"{[(c, str(got.get(c)), str(expect[c])) for c in bad]}"
                )
            new_v = old_v + 1
            out = self._version_dir(new_v)
            self._link_forward(self._version_dir(old_v), out)
            self._swap_pointer(new_v)
            return
        # read ONLY the touched bucket subtrees (basePath keeps the
        # partition columns): the driver lists O(touched) directories per
        # commit instead of walking the whole store's partition tree —
        # the same rows the old whole-store read + isin partition filter
        # produced, without the O(store) InMemoryFileIndex build.  A
        # touched bucket with no dir yet (a brand-new id range) simply
        # contributes no current rows, exactly as the filter did.
        old_dir = self._version_dir(old_v)
        bucket_dirs = [
            p
            for b in touched
            if os.path.isdir(p := os.path.join(old_dir, f"{_BUCKET_COL}={b}"))
        ]
        if bucket_dirs:
            current = (
                self.spark.read.schema(_RAW_SCHEMA)
                .option("basePath", old_dir)
                .parquet(*bucket_dirs)
                .select(*item_cols)
            )
        else:
            current = self.spark.createDataFrame([], schema=ITEMS_SCHEMA).select(
                *item_cols
            )
        merged = merge_items(current, updates, seq_col=seq_col)
        new_v = old_v + 1
        out = self._version_dir(new_v)
        self._write_snapshot(merged, out)
        # copy-forward every untouched bucket from the previous snapshot
        touched_set = set(touched)
        for name in os.listdir(old_dir):
            if not name.startswith(f"{_BUCKET_COL}="):
                continue
            if int(name.split("=", 1)[1]) in touched_set:
                continue
            self._link_forward(os.path.join(old_dir, name), os.path.join(out, name))
        self._swap_pointer(new_v)

    def delete_ids(self, ids: list[int]) -> int:
        """Targeted hard delete (the right-to-be-forgotten path a training
        store needs; no reference analog).  Same pruned shape as merge:
        only buckets containing requested ids are rewritten (anti-join),
        all others hardlink forward; returns the number of rows removed.
        """
        old_v = self._current_version()
        if old_v is None or not ids:
            return 0
        item_cols = [f.name for f in ITEMS_SCHEMA.fields]
        raw = self._read_raw()
        if _BUCKET_COL not in raw.columns:
            kept = raw.select(*item_cols).filter(~F.col("id").isin(ids))
            removed = raw.count() - kept.count()
            if removed:
                self._commit(kept)
            return removed
        touched = sorted({int(i) // self.bucket_size for i in ids})
        current = raw.filter(F.col(_BUCKET_COL).isin(touched)).select(*item_cols)
        kept = current.filter(~F.col("id").isin(ids)).localCheckpoint(eager=True)
        removed = current.count() - kept.count()
        if not removed:
            return 0
        new_v = old_v + 1
        out = self._version_dir(new_v)
        old_dir = self._version_dir(old_v)
        touched_set = set(touched)
        untouched = [
            n
            for n in os.listdir(old_dir)
            if n.startswith(f"{_BUCKET_COL}=") and int(n.split("=", 1)[1]) not in touched_set
        ]
        if kept.isEmpty() and not untouched:
            # store emptied: a partitioned write of zero rows leaves an
            # unreadable dir (no files, no schema) — write one schema-ful
            # empty file instead
            (
                kept.withColumn(_BUCKET_COL, F.expr(f"id div {self.bucket_size}"))
                .write.mode("overwrite")
                .parquet(out)
            )
        else:
            self._write_snapshot(kept, out)
            for name in untouched:
                self._link_forward(os.path.join(old_dir, name), os.path.join(out, name))
        self._swap_pointer(new_v)
        return removed

    def compact(self, bucket_size: int) -> None:
        """Re-bucket the store at a coarser (or finer) granularity — the
        small-file compaction step (the plain-parquet analog of Delta
        OPTIMIZE / Iceberg rewrite_data_files).

        Years of 200-row commits leave one (id_bucket, type) leaf dir per
        ~bucket_size ids; once the store is large and cold, a bigger bucket
        means fewer, larger files (better scan throughput, fewer file-open
        round trips at 100 TB) at the cost of a larger rewrite unit for
        future merges — the classic ingest-vs-scan trade, now tunable after
        the fact.  The rewrite is one full pass (expensive by design, run it
        rarely); it commits as a normal versioned snapshot, so readers never
        see a half-compacted store and time travel across the compaction
        keeps working.  The new granularity is persisted in _META.json with
        the same commit, keeping future merge pruning consistent."""
        if bucket_size < 1:
            raise ValueError("bucket_size must be >= 1")
        item_cols = [f.name for f in ITEMS_SCHEMA.fields]
        current = self.read().select(*item_cols).localCheckpoint(eager=True)
        self.bucket_size = bucket_size
        self._commit(current)

    def leaf_file_count(self, version: int | None = None) -> int:
        """Number of parquet data files in a snapshot (compaction metric)."""
        v = self._current_version() if version is None else version
        if v is None:
            return 0
        n = 0
        for _root, _dirs, files in os.walk(self._version_dir(v)):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    def latest_id(self) -> int:
        """Q4 select_latest_id (offset recovery, hnarchive.py:285-290)."""
        row = self.read().agg(F.max("id").alias("m")).collect()[0]
        return int(row["m"]) if row["m"] is not None else 0

    def count(self) -> int:
        return self.read().count()
