"""Tolerant CSV vector loader (reference ``loader/.../CsvLoader.java:19-120``):
skips blank lines, ``#`` comments, non-numeric header rows, and malformed
lines; strips BOM; accepts comma/semicolon/whitespace separators.

Implemented as a text scan + per-partition numpy parse — the tolerant
semantics (drop, don't fail) cannot be expressed with
``spark.read.csv(mode=DROPMALFORMED)`` alone because the separator is
sniffed per line and headers are detected by content, not position."""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEP = re.compile(r"[,;\s]+")


def _parse_line(line: str) -> list[float] | None:
    s = line.lstrip("﻿").strip()
    if not s or s.startswith("#"):
        return None
    parts = [p for p in _SEP.split(s) if p]
    try:
        return [float(p) for p in parts]
    except ValueError:
        return None  # header or malformed → skipped


def read_csv_vectors(spark: SparkSession, path: str,
                     expected_dim: int | None = None) -> DataFrame:
    """→ (id LONG, vector ARRAY<DOUBLE>); ids are surviving-line ordinals
    (reference assigns ordinals after filtering)."""
    lines = spark.read.text(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for line in pdf["value"]:
                v = _parse_line(line)
                if v is None:
                    continue
                if expected_dim is not None and len(v) != expected_dim:
                    continue
                vecs.append(v)
            yield pd.DataFrame({"vector": vecs})

    parsed = lines.mapInPandas(run, schema="vector ARRAY<DOUBLE>")
    # ordinal ids via zipWithIndex (deterministic: text source preserves order)
    rdd = parsed.rdd.zipWithIndex().map(lambda t: (t[1], t[0]["vector"]))
    return spark.createDataFrame(rdd, "id LONG, vector ARRAY<DOUBLE>")


def read_csv_groundtruth(spark: SparkSession, path: str) -> DataFrame:
    """CSV GT rows (ints) → (q_id LONG, neighbor_ids ARRAY<INT>)."""
    vec = read_csv_vectors(spark, path)
    return vec.select(F.col("id").alias("q_id"),
                      F.col("vector").cast("array<int>").alias("neighbor_ids"))
