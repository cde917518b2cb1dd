"""Key rotation + selective re-encryption (reference
``keymanagement/.../KeyRotationServiceImpl.java`` and
``crypto/.../SelectiveReencCoordinator.java``, ``ReencryptionTracker.java``).

Forward security loop:
1. queries record the ids they decrypted ("touched", U2);
2. rotation mints a new key version;
3. touched points get re-encrypted under the newest key (J4), skipping
   rows already current (F5 ``key_version >= target``);
4. once the census (A8) shows no point bound to an old version, that key
   is safe to delete (F6) — deleting it makes previously-captured
   ciphertext snapshots undecryptable (the forward-security game).

All set state lives in DataFrames; the reference's in-memory
``ReencryptionTracker`` becomes an accumulated union + dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aes import decrypt_vectors, encrypt_vectors


class TouchedTracker:
    """U2: distinct union of candidate ids decrypted across query batches
    (reference ``ReencryptionTracker.record/drainTouchedIds:23-41``)."""

    def __init__(self):
        self._acc: DataFrame | None = None

    def record(self, ids_df: DataFrame, id_col: str = "id") -> None:
        part = ids_df.select(F.col(id_col).alias("id"))
        self._acc = part if self._acc is None else self._acc.unionByName(part)

    def drain(self) -> DataFrame | None:
        out, self._acc = self._acc, None
        return out.dropDuplicates(["id"]) if out is not None else None


def version_census(encrypted: DataFrame) -> DataFrame:
    """A8: (key_version, n_points) — migration safety check
    (reference ``RocksDBMetadataManager.countWithVersion:695-703``)."""
    return encrypted.groupBy("key_version").agg(F.count("*").alias("n_points"))


def migration_remaining(encrypted: DataFrame, target_version: int) -> int:
    """Points still bound to pre-target keys
    (reference ``KeyRotationServiceImpl.migrationRemaining:433-446``)."""
    return encrypted.filter(F.col("key_version") < target_version).count()


def reencrypt_touched(encrypted: DataFrame, touched: DataFrame,
                      keys_bc, target_version: int,
                      id_col: str = "id") -> DataFrame:
    """J4: new encrypted table with touched, stale rows re-encrypted under
    ``target_version`` (fresh IVs); untouched/current rows pass through.

    Plan: semi-join selects the migration set (F5 filters already-current
    rows), decrypt → encrypt kernels run only on that set, anti-join keeps
    the rest — no full-table crypto pass (the reference's "selective"
    property, ``KeyRotationServiceImpl.reencryptTouched:215-289``)."""
    stale = (encrypted
             .join(touched.select(F.col(id_col).alias(id_col)).dropDuplicates([id_col]),
                   on=id_col, how="left_semi")
             .filter(F.col("key_version") < F.lit(target_version)))
    migrated = encrypt_vectors(
        decrypt_vectors(stale, keys_bc, mode="strict", id_col=id_col),
        keys_bc, target_version, id_col=id_col)
    untouched = encrypted.join(
        stale.select(id_col), on=id_col, how="left_anti")
    return untouched.select(migrated.columns).unionByName(migrated)


def reencrypt_all(encrypted: DataFrame, keys_bc, target_version: int,
                  id_col: str = "id") -> DataFrame:
    """Full rotation (reference ``reEncryptAll:108-113``): every stale row
    migrates to the target key."""
    stale = encrypted.filter(F.col("key_version") < F.lit(target_version))
    current = encrypted.filter(F.col("key_version") >= F.lit(target_version))
    migrated = encrypt_vectors(
        decrypt_vectors(stale, keys_bc, mode="strict", id_col=id_col),
        keys_bc, target_version, id_col=id_col)
    return current.select(migrated.columns).unionByName(migrated)
