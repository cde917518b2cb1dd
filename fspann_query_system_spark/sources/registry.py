"""Format dispatch (reference ``loader/.../DefaultDataLoader.java:23-67``):
extension → loader, with the reference's dimension filter applied
post-load (F1).  Parquet is the preferred at-rest format; the binary
formats exist for parity with the reference's inputs."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .vecfiles import read_fvecs, read_bvecs, read_ivecs
from .csv_loader import read_csv_vectors, read_csv_groundtruth


def load_vectors(spark: SparkSession, path: str,
                 expected_dim: int | None = None) -> DataFrame:
    """(id, vector) from fvecs/bvecs/csv/parquet by extension."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".fvecs":
        df = read_fvecs(spark, path, expected_dim)
    elif ext == ".bvecs":
        df = read_bvecs(spark, path, expected_dim)
    elif ext in (".csv", ".txt"):
        df = read_csv_vectors(spark, path, expected_dim)
    elif ext in (".parquet", ""):
        df = spark.read.parquet(path)
    else:
        raise ValueError(f"unsupported vector format: {ext}")
    if expected_dim is not None:
        df = df.filter(F.size("vector") == expected_dim)   # F1
    return df


def load_groundtruth(spark: SparkSession, path: str) -> DataFrame:
    """(q_id, neighbor_ids) from ivecs/csv/parquet."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ivecs":
        return read_ivecs(spark, path)
    if ext in (".csv", ".txt"):
        return read_csv_groundtruth(spark, path)
    if ext in (".parquet", ""):
        return spark.read.parquet(path)
    raise ValueError(f"unsupported groundtruth format: {ext}")


def validate_groundtruth(gt: DataFrame, dataset_size: int,
                         base: DataFrame | None = None,
                         queries: DataFrame | None = None,
                         sample: int = 5) -> dict:
    """F7 sanity predicates (reference
    ``GroundtruthManager.isConsistentWithDatasetSize:222-246`` and
    ``GroundtruthValidator``): ids in [0, N); optionally re-rank a sample
    of queries and check GT top-1 agreement."""
    mx = gt.select(F.max(F.array_max("neighbor_ids")).alias("mx"),
                   F.min(F.array_min("neighbor_ids")).alias("mn")).collect()[0]
    out = {"max_id": mx.mx, "min_id": mx.mn,
           "ids_in_range": mx.mn is not None and mx.mn >= 0 and mx.mx < dataset_size}
    if base is not None and queries is not None:
        from ..query.exact import knn_exact
        qs = queries.limit(sample)
        top1 = knn_exact(base, qs, k=1).select("q_id", F.col("id").alias("top1"))
        joined = (gt.select("q_id", F.element_at("neighbor_ids", 1).alias("gt1"))
                  .join(top1, "q_id"))
        agree = joined.filter(F.col("gt1") == F.col("top1")).count()
        out["sampled_top1_agree"] = agree
        out["sampled_top1_total"] = joined.count()
    return out
