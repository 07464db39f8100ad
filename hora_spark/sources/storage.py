"""SnapshotStore — versioned table commits (the dump/load analog).

hora serializes the entire index to ONE bincode file and reloads it
all-or-nothing (/root/reference/src/index/hnsw_idx.rs:688-719 dump,
:647-686 load; trait at /root/reference/src/core/ann_index.rs:147-157).
The distributed upgrade required by the north_rule: every build commits a
SNAPSHOT — an immutable manifest listing the parquet files of each logical
table (segments, lineage, stats) — and a restarted build resumes from the
last committed snapshot by anti-joining completed work out of the plan.

Layout (works on any Hadoop-compatible FS; local dir in the sandbox):

    <root>/data/<table>/<uuid>/part-*.parquet     immutable data dirs
    <root>/snapshots/v00000001.json               manifest per commit
    <root>/snapshots/CURRENT                      pointer file

A manifest maps table name → list of data dirs. Commits are atomic via
write-temp + rename. `read(table, version)` gives time travel
(`VERSION AS OF` semantics).

Filesystem scope: DATA dirs are read/written through Spark, so they work
on any Hadoop-compatible FS — but MANIFEST I/O and `expire_snapshots` GC
use the local filesystem (os/json/shutil) and are local-FS-only in this
sandbox. On HDFS/S3 the remote-capable path is the Iceberg mapping below
(Iceberg's own metadata layer + `expire_snapshots` procedure replace this
class's manifests and GC wholesale), not a Hadoop-FS port of this file.

Iceberg mapping (not implemented here — the sandbox has no Iceberg runtime
jars; this store IS the same shape): each logical table becomes a real
Iceberg table (`write_table`/`commit` → `df.writeTo(t).append()` or
`.overwritePartitions()`, one engine commit per Iceberg snapshot),
`current_version`/`read(version=)` → Iceberg snapshot ids + `VERSION AS
OF`, `meta` → table properties, `drop` → `DROP TABLE`. The engine only
touches this class's six methods, so the swap is local to this file.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # ------------------------------------------------------------- reads --
    def current_version(self) -> int:
        cur = os.path.join(self.root, "snapshots", "CURRENT")
        if not os.path.exists(cur):
            return 0
        with open(cur) as f:
            return int(f.read().strip())

    def _manifest(self, version: int) -> dict:
        if version == 0:
            return {"tables": {}}
        p = os.path.join(self.root, "snapshots", f"v{version:08d}.json")
        with open(p) as f:
            return json.load(f)

    def tables(self, version: int | None = None) -> dict[str, list[str]]:
        v = self.current_version() if version is None else version
        return self._manifest(v)["tables"]

    def exists(self, table: str, version: int | None = None) -> bool:
        return bool(self.tables(version).get(table))

    def read(self, table: str, version: int | None = None) -> DataFrame:
        dirs = self.tables(version).get(table)
        if not dirs:
            raise FileNotFoundError(f"table {table!r} not in snapshot")
        if len(dirs) == 1:
            return self.spark.read.parquet(dirs[0])
        # appended commits = multiple immutable dirs, each its own
        # hive-partitioned root → per-dir scan + unionByName (keeps each
        # dir's partition pruning intact)
        df = self.spark.read.parquet(dirs[0])
        for d in dirs[1:]:
            df = df.unionByName(self.spark.read.parquet(d))
        return df

    # ------------------------------------------------------------ writes --
    def stage_dir(self, table: str) -> str:
        """A fresh immutable data dir for a pending commit. Writers (tasks)
        may write directly into it; it becomes visible only on commit."""
        d = os.path.join(self.root, "data", table, uuid.uuid4().hex)
        os.makedirs(d, exist_ok=True)
        return d

    def write_table(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> str:
        d = self.stage_dir(table)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(d)
        return d

    def commit(self, updates: dict[str, list[str]], replace: bool = True,
               meta: dict | None = None, drop: list[str] | None = None) -> int:
        """Atomically publish a new snapshot. updates: table → data dirs.
        replace=True swaps the table's dirs; False appends to them.
        drop: tables removed from the new manifest (e.g. the deletes
        tombstone table after compaction physically removed the rows)."""
        v = self.current_version()
        manifest = self._manifest(v)
        tables = manifest["tables"]
        for t in drop or []:
            tables.pop(t, None)
        for t, dirs in updates.items():
            if replace or t not in tables:
                tables[t] = list(dirs)
            else:
                tables[t] = tables[t] + list(dirs)
        nv = v + 1
        merged_meta = dict(manifest.get("meta", {}))
        merged_meta.update(meta or {})
        out = {"version": nv, "parent": v, "tables": tables, "meta": merged_meta}
        snap_dir = os.path.join(self.root, "snapshots")
        tmp = os.path.join(snap_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(snap_dir, f"v{nv:08d}.json"))
        tmp2 = os.path.join(snap_dir, f".cur-{uuid.uuid4().hex}")
        with open(tmp2, "w") as f:
            f.write(str(nv))
        os.replace(tmp2, os.path.join(snap_dir, "CURRENT"))
        return nv

    def meta(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        return self._manifest(v).get("meta", {})

    def deleted_ids(self, version: int | None = None):
        """Sorted int64 array of tombstoned doc ids at `version`, or None.
        Shared by the query path and compaction/rebuild."""
        import numpy as np

        if not self.exists("deletes", version):
            return None
        rows = self.read("deletes", version).select("doc_id").collect()
        if not rows:
            return None
        return np.unique(np.array([r["doc_id"] for r in rows], np.int64))

    def drop(self) -> None:
        """clear() analog (/root/reference/src/core/ann_index.rs:110)."""
        shutil.rmtree(self.root, ignore_errors=True)
        os.makedirs(os.path.join(self.root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(self.root, "data"), exist_ok=True)

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Iceberg `expire_snapshots` analog: keep only the newest
        `keep_last` manifests and delete every data dir no kept snapshot
        references. Time travel to expired versions stops working (like
        Iceberg); the CURRENT snapshot is never touched. Returns counts.

        Maintenance op: like Iceberg's orphan-file cleanup, run it while no
        writer is mid-commit — a dir staged but not yet committed is not
        referenced by any manifest and would be collected."""
        cur = self.current_version()
        snap_dir_p = os.path.join(self.root, "snapshots")
        keep_versions = [
            v for v in range(max(1, cur - keep_last + 1), cur + 1)
            # a previous expire may already have removed manifests inside
            # the window — keep only the ones still on disk
            if os.path.exists(os.path.join(snap_dir_p, f"v{v:08d}.json"))
        ]
        referenced: set[str] = set()
        for v in keep_versions:
            for dirs in self._manifest(v)["tables"].values():
                referenced.update(dirs)
        removed_dirs = 0
        data_root = os.path.join(self.root, "data")
        for table in os.listdir(data_root):
            tdir = os.path.join(data_root, table)
            for d in os.listdir(tdir):
                full = os.path.join(tdir, d)
                if full not in referenced:
                    shutil.rmtree(full, ignore_errors=True)
                    removed_dirs += 1
        removed_manifests = 0
        snap_dir = os.path.join(self.root, "snapshots")
        for f in os.listdir(snap_dir):
            if f.startswith("v") and f.endswith(".json"):
                v = int(f[1:-5])
                if v not in keep_versions:
                    os.remove(os.path.join(snap_dir, f))
                    removed_manifests += 1
        return {"kept_versions": keep_versions,
                "removed_dirs": removed_dirs,
                "removed_manifests": removed_manifests}
