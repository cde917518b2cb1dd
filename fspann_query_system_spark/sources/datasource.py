"""Spark 4 Python DataSource for fvecs/bvecs/ivecs (SURVEY §2 S1-S3 as a
first-class ``spark.read.format("vecfile")`` source).

Unlike the binaryFile+mapInPandas readers in ``vecfiles.py`` (one task per
file), this source *splits a single vector file into record-aligned range
partitions* — the property that matters at scale, where a SIFT-style
dataset is one multi-GB file: N parallel tasks each seek to
``start·record_len`` and stream their slice.

Formats (reference ``loader/.../FvecsLoader.java:15-57``,
``BvecsLoader.java:22-67``, ``IvecsLoader.java:14-55``):
  fvecs: [int32 dim][dim x float32]   → (id BIGINT, vector ARRAY<FLOAT>)
  bvecs: [int32 dim][dim x uint8]     → (id BIGINT, vector ARRAY<FLOAT>) 0..255
  ivecs: [int32 k][k x int32]         → (q_id BIGINT, neighbor_ids ARRAY<INT>)

Uniform record length (constant dim per file) is the on-disk contract of
these formats; mixed-dim files are rejected exactly like the reference's
dim filter (F1).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


@dataclass
class _Range(InputPartition):
    start: int   # first record ordinal
    end: int     # one past last


def _probe(path: str, fmt: str) -> tuple[int, int, int]:
    """(dim, record_len_bytes, n_records) from the first header int."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(4)
    if len(head) < 4:
        return 0, 0, 0
    dim = struct.unpack("<i", head)[0]
    if dim <= 0:
        raise ValueError(f"bad {fmt} header dim={dim} in {path}")
    unit = 1 if fmt == "bvecs" else 4
    record_len = 4 + dim * unit
    if size % record_len != 0:
        raise ValueError(
            f"{path} size {size} not a multiple of record_len {record_len} "
            f"(mixed dims are not valid {fmt})")
    return dim, record_len, size // record_len


class VecFileDataSource(DataSource):
    """``spark.read.format("vecfile").option("format", "fvecs").load(path)``;
    format defaults from the file extension."""

    @classmethod
    def name(cls) -> str:
        return "vecfile"

    def _fmt(self) -> str:
        fmt = self.options.get("format")
        if not fmt:
            ext = os.path.splitext(self.options["path"])[1].lower().lstrip(".")
            fmt = ext
        if fmt not in ("fvecs", "bvecs", "ivecs"):
            raise ValueError(f"unsupported vecfile format {fmt!r}")
        return fmt

    def schema(self) -> str:
        if self._fmt() == "ivecs":
            return "q_id BIGINT, neighbor_ids ARRAY<INT>"
        return "id BIGINT, vector ARRAY<FLOAT>"

    def reader(self, schema) -> "VecFileReader":
        return VecFileReader(self.options["path"], self._fmt(),
                             int(self.options.get("numpartitions", 8)))


class VecFileReader(DataSourceReader):
    def __init__(self, path: str, fmt: str, n_parts: int):
        self.path = path
        self.fmt = fmt
        self.dim, self.record_len, self.n_records = _probe(path, fmt)
        self.n_parts = max(1, min(n_parts, self.n_records or 1))

    def partitions(self):
        if self.n_records == 0:
            return [_Range(0, 0)]                 # empty file → empty scan
        per = -(-self.n_records // self.n_parts)  # ceil
        return [_Range(lo, min(lo + per, self.n_records))
                for lo in range(0, self.n_records, per)]

    def read(self, part: _Range):
        import numpy as np
        n = part.end - part.start
        if n <= 0:
            return
        with open(self.path, "rb") as f:
            f.seek(part.start * self.record_len)
            buf = f.read(n * self.record_len)
        raw = np.frombuffer(buf, dtype=np.uint8).reshape(n, self.record_len)
        dims = raw[:, :4].copy().view("<i4").ravel()
        if (dims != self.dim).any():
            raise ValueError(f"mixed dims in {self.path} (F1 reject)")
        body = raw[:, 4:]
        if self.fmt == "fvecs":
            vals = body.copy().view("<f4").reshape(n, self.dim)
        elif self.fmt == "bvecs":
            vals = body.astype("f4")
        else:
            vals = body.copy().view("<i4").reshape(n, self.dim)
        for i in range(n):
            yield (part.start + i, vals[i].tolist())


def register(spark) -> None:
    """Idempotent registration: ``spark.read.format('vecfile')`` works after."""
    spark.dataSource.register(VecFileDataSource)
