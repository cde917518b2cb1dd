"""Vector file formats (reference ``loader/`` module):

- fvecs: records of [int32 dim LE][dim × float32 LE]   (S1, FvecsLoader)
- bvecs: records of [int32 dim LE][dim × uint8]        (S2, BvecsLoader,
  values widened to double 0..255)
- ivecs: records of [int32 k][k × int32 LE]            (S3, IvecsLoader)

Row ids are file ordinals (reference ``ForwardSecureANNSystem.java:515``:
``pointId = Long.toString(ord)``) — global ordinal across the file, in
record order.

Read strategy: these formats are fixed-record once the dimension is known
(the reference streams them through a per-file iterator; we peek the
first 4 bytes driver-side, then read with ``sc.binaryRecords`` — each
HDFS/posix split parses independently, so a 100TB fvecs directory scans
embarrassingly parallel).  Ids come from zipWithIndex (one extra count
job; record order = file order, matching the reference's ordinals).

The parse of each record batch is numpy (``frombuffer``), not per-value
Python.  For repeated analytics, convert once to Parquet
(``fvecs_to_parquet``) and let every later scan enjoy column pruning +
predicate pushdown.
"""

from __future__ import annotations

import struct

import numpy as np

from pyspark.sql import DataFrame, SparkSession


def _peek_dim(spark: SparkSession, path: str) -> int:
    """Read the first int32 of the (first) file to learn the dimension."""
    sc = spark.sparkContext
    # local paths: read directly; otherwise pull 4 bytes via binaryFiles
    p = path[7:] if path.startswith("file://") else path
    try:
        with open(p, "rb") as f:
            return struct.unpack("<i", f.read(4))[0]
    except (OSError, IsADirectoryError):
        first = sc.binaryFiles(path).first()
        return struct.unpack("<i", bytes(first[1][:4]))[0]


def _records_df(spark: SparkSession, path: str, record_len: int,
                parse, schema: str) -> DataFrame:
    rdd = spark.sparkContext.binaryRecords(path, record_len)
    rows = rdd.zipWithIndex().map(lambda t: parse(t[1], t[0]))
    return spark.createDataFrame(rows, schema)


def read_fvecs(spark: SparkSession, path: str, dim: int | None = None) -> DataFrame:
    """fvecs → (id LONG, vector ARRAY<FLOAT>)."""
    dim = dim if dim is not None else _peek_dim(spark, path)

    def parse(ord_, buf):
        d = struct.unpack_from("<i", buf, 0)[0]
        if d != dim:
            raise ValueError(f"fvecs record dim {d} != {dim}")
        v = np.frombuffer(buf, dtype="<f4", count=dim, offset=4)
        return (ord_, [float(x) for x in v])

    return _records_df(spark, path, 4 + 4 * dim, parse,
                       "id LONG, vector ARRAY<FLOAT>")


def read_bvecs(spark: SparkSession, path: str, dim: int | None = None) -> DataFrame:
    """bvecs → (id LONG, vector ARRAY<DOUBLE>), uint8 widened to 0..255
    (reference ``BvecsLoader.java:22-56``)."""
    dim = dim if dim is not None else _peek_dim(spark, path)

    def parse(ord_, buf):
        d = struct.unpack_from("<i", buf, 0)[0]
        if d != dim:
            raise ValueError(f"bvecs record dim {d} != {dim}")
        v = np.frombuffer(buf, dtype=np.uint8, count=dim, offset=4)
        return (ord_, [float(x) for x in v])

    return _records_df(spark, path, 4 + dim, parse,
                       "id LONG, vector ARRAY<DOUBLE>")


def read_ivecs(spark: SparkSession, path: str, k: int | None = None) -> DataFrame:
    """ivecs → (q_id LONG, neighbor_ids ARRAY<INT>) — groundtruth layout."""
    k = k if k is not None else _peek_dim(spark, path)

    def parse(ord_, buf):
        kk = struct.unpack_from("<i", buf, 0)[0]
        if kk != k:
            raise ValueError(f"ivecs record k {kk} != {k}")
        v = np.frombuffer(buf, dtype="<i4", count=k, offset=4)
        return (ord_, [int(x) for x in v])

    return _records_df(spark, path, 4 + 4 * k, parse,
                       "q_id LONG, neighbor_ids ARRAY<INT>")


# --- writers (driver-side; used for format parity + test fixtures) ---------

def write_fvecs(path: str, matrix: np.ndarray) -> None:
    m = np.asarray(matrix, dtype="<f4")
    with open(path, "wb") as f:
        for row in m:
            f.write(struct.pack("<i", len(row)))
            f.write(row.tobytes())


def write_bvecs(path: str, matrix: np.ndarray) -> None:
    m = np.asarray(matrix, dtype=np.uint8)
    with open(path, "wb") as f:
        for row in m:
            f.write(struct.pack("<i", len(row)))
            f.write(row.tobytes())


def write_ivecs(path: str, rows: list[list[int]]) -> None:
    """S14 GT writer (reference ``GroundtruthPrecompute.writeIvecs``)."""
    with open(path, "wb") as f:
        for row in rows:
            f.write(struct.pack("<i", len(row)))
            f.write(np.asarray(row, dtype="<i4").tobytes())


def groundtruth_to_ivecs(gt: DataFrame, path: str) -> None:
    """(q_id, neighbor_ids) DataFrame → ivecs file, ordered by q_id."""
    rows = gt.orderBy("q_id").collect()
    write_ivecs(path, [list(r.neighbor_ids) for r in rows])


def fvecs_to_parquet(spark: SparkSession, src: str, dst: str,
                     dim: int | None = None) -> None:
    """One-time conversion: every later scan gets columnar pruning."""
    read_fvecs(spark, src, dim).write.mode("overwrite").parquet(dst)
