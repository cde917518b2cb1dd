"""Per-id metadata + tombstones (reference
``common/.../RocksDBMetadataManager.java`` KV store → ``vector_meta``
table, FIXTURES.md §5 schema) and the encrypted-point store layout.

The reference's per-id RocksDB rows + per-id ``.point`` files become two
Parquet tables:

- ``vector_meta(id, version, shard_id, dim, deleted, deleted_at)``
- ``encrypted_points(id, key_version, dim, iv, ciphertext)``
  partitioned by ``key_version`` (mirrors the on-disk ``v_k/id.point``
  layout and makes version census / selective re-encryption partition-
  local).

Updates use snapshot-versioned directories with an atomic pointer file —
the Parquet stand-in for the reference's tmp-file + ATOMIC_MOVE protocol
(``RocksDBMetadataManager.java:342-375``); on a Delta/Iceberg deployment
these become MERGE commits and the pointer disappears.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    """Atomically-replaceable Parquet table: writes go to
    ``root/snapshot=<n>/``, then the ``_latest`` pointer flips."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_latest")

    def current_snapshot(self) -> int | None:
        try:
            with open(self._pointer) as f:
                return json.load(f)["snapshot"]
        except (OSError, ValueError):
            return None

    def read(self) -> DataFrame | None:
        s = self.current_snapshot()
        if s is None:
            return None
        return self.spark.read.parquet(os.path.join(self.root, f"snapshot={s}"))

    def write(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        nxt = (self.current_snapshot() or 0) + 1
        path = os.path.join(self.root, f"snapshot={nxt}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        tmp = self._pointer + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"snapshot": nxt, "ts": time.time()}, f)
        os.replace(tmp, self._pointer)
        return nxt

    def vacuum(self, keep: int = 2) -> list[int]:
        """Drop superseded snapshots (the reference's deferred secure wipe
        of stale version files, ``cleanupOldVersionFilesDeferred:464-498``)."""
        import shutil
        cur = self.current_snapshot() or 0
        dropped = []
        for name in os.listdir(self.root):
            if name.startswith("snapshot="):
                s = int(name.split("=")[1])
                if s <= cur - keep:
                    shutil.rmtree(os.path.join(self.root, name))
                    dropped.append(s)
        return dropped


META_SCHEMA = ("id LONG, version INT, shard_id INT, dim INT, "
               "deleted BOOLEAN, deleted_at TIMESTAMP")


def initial_meta(points: DataFrame, version: int, dim: int,
                 n_shards: int = 8, id_col: str = "id") -> DataFrame:
    return points.select(
        F.col(id_col).alias("id"),
        F.lit(version).alias("version"),
        (F.crc32(F.col(id_col).cast("string")) % n_shards).cast("int").alias("shard_id"),
        F.lit(dim).alias("dim"),
        F.lit(False).alias("deleted"),
        F.lit(None).cast("timestamp").alias("deleted_at"))


def mark_deleted(meta: DataFrame, ids: DataFrame, id_col: str = "id") -> DataFrame:
    """Tombstone upsert (reference ``markDeleted``/``isDeleted:203-224``):
    flips ``deleted`` for the given ids, stamps ``deleted_at``."""
    hit = ids.select(F.col(id_col).alias("id")).dropDuplicates(["id"]) \
             .withColumn("_del", F.lit(True))
    return (meta.join(hit, on="id", how="left")
            .withColumn("deleted", F.coalesce(F.col("_del"), F.col("deleted")))
            .withColumn("deleted_at",
                        F.when(F.col("_del").isNotNull() & ~F.col("deleted_at").isNotNull(),
                               F.current_timestamp()).otherwise(F.col("deleted_at")))
            .drop("_del"))


def active_filter(df: DataFrame, meta: DataFrame, id_col: str = "id") -> DataFrame:
    """F3: drop rows whose metadata says deleted (anti-join against the
    tombstone set — reference ``collectPartitionOrdered:726-753``)."""
    dead = meta.filter(F.col("deleted")).select(F.col("id").alias(id_col))
    return df.join(dead, on=id_col, how="left_anti")


def drift_audit(meta: DataFrame, points: DataFrame, id_col: str = "id") -> DataFrame:
    """A11: ids present on one side only (reference ``auditDrift:649-672``)."""
    m = meta.select(F.col("id").alias("_m"))
    p = points.select(F.col(id_col).alias("_p"))
    j = m.join(p, m._m == p._p, "full_outer")
    return j.agg(
        F.count(F.when(F.col("_p").isNull(), 1)).alias("meta_only"),
        F.count(F.when(F.col("_m").isNull(), 1)).alias("points_only"),
        F.count("*").alias("n_total"))


def storage_stats(spark: SparkSession, path: str) -> dict:
    """A9 storage sizing: bytes + files under a table root."""
    total, files = 0, 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if not n.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, n))
                files += 1
    return {"bytes": total, "files": files}
