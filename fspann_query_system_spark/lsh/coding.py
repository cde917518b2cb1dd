"""Bit-interleaved LSH coding (reference "MSANNP" coding, Algorithm 1).

Semantics (reference spec — ``index/.../Coding.java:250-301``):
- H_j(v)   = floor((alpha_j . v + r_j) / omega_j), truncated to int32.
- C(v)     = bit-plane-major, MSB-first interleave: for plane
             i = lam-1 .. 0, for j = 0 .. m-1, emit bit i of
             (H_j ^ 0x80000000).  Bit position 0 is the most significant.
- key      = first min(63, bits) code bits packed into a non-negative
             int64 with code bit p at long bit (62 - p)
             (reference ``GreedyPartitioner.computeKey:87-96``).
- full code = ceil(m*lam / 64) uint64 words, code bit p at word p//64,
             word bit (63 - p%64); hamming = popcount of xor of words.

All kernels are vectorized numpy over Arrow batches (the reference codes
one vector at a time in scalar Java — the batch matmul is the Spark-side
win).  NaN/Inf vectors and wrong-dimension vectors are dropped (filters
F1/F2, reference ``Coding.requireVector:355-361``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .params import LshParams

_SIGN = np.int64(1) << 31
_U32 = np.int64((1 << 32) - 1)


def _popcount(a: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 lacks bitwise_count)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(a)
    b = np.ascontiguousarray(a).astype(np.uint64, copy=False)
    u8 = b.reshape(b.shape + (1,)).view(np.uint8)          # (..., 8) bytes
    return np.unpackbits(u8, axis=-1).sum(axis=-1)         # (...,) counts


def code_family(V: np.ndarray, alpha: np.ndarray, r: np.ndarray,
                omega: np.ndarray, lam: int):
    """Code a batch (n, d) against one family → (keys (n,) int64, words (n, W) int64).

    Pure-numpy spec kernel; also reused by the DuckDB-oracle generator and
    golden tests.
    """
    H = np.floor((V @ alpha.T + r) / omega).astype(np.int64)   # (n, m)
    u = (H ^ _SIGN) & _U32                                     # sign-shift, wrap to u32
    m = alpha.shape[0]
    nbits = m * lam
    bits = np.empty((V.shape[0], nbits), dtype=np.uint8)
    for p in range(lam):                                       # plane 0 = MSB plane
        shift = lam - 1 - p
        bits[:, p * m:(p + 1) * m] = ((u >> shift) & 1).astype(np.uint8)

    kb = min(63, nbits)
    kw = (np.int64(1) << (62 - np.arange(kb, dtype=np.int64)))
    keys = bits[:, :kb].astype(np.int64) @ kw                  # (n,)

    W = (nbits + 63) // 64
    words = np.zeros((V.shape[0], W), dtype=np.uint64)
    for w in range(W):
        seg = bits[:, w * 64:(w + 1) * 64]
        ww = (np.uint64(1) << np.uint64(63 - np.arange(seg.shape[1])))
        words[:, w] = seg.astype(np.uint64) @ ww
    return keys, words.view(np.int64)


def hamming_words(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hamming distance between packed code words (n, W) vs (n, W) or (W,)."""
    x = (np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)).view(np.uint64)
    return _popcount(x).sum(axis=-1) if x.ndim > 1 else int(_popcount(x).sum())


def code_single(vec, params: LshParams) -> dict:
    """Driver-side coding of one vector → {(t, d): (key, words ndarray)}.

    Used by the query-token factory (reference ``QueryTokenFactory.create``).
    """
    V = np.asarray(vec, dtype=np.float64).reshape(1, -1)
    out = {}
    for t, d, alpha, r, omega in params.packed():
        keys, words = code_family(V, alpha, r, omega, params.cfg.lam)
        out[(t, d)] = (int(keys[0]), words[0])
    return out


def code_vectors(df: DataFrame, params: LshParams,
                 id_col: str = "id", vector_col: str = "vector") -> DataFrame:
    """(id, vector) → (id, table, division, code_key, code_bits).

    One ``mapInPandas`` pass computes all L*D families per Arrow batch
    (reference codes per-vector per-family in ``PartitionedIndexService
    .insert:314-347``).  Emits L*D rows per input row.
    """
    cfg = params.cfg
    packed = params.packed()
    lam = cfg.lam
    dim = cfg.dim
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (f"{id_col} {id_type}, table INT, division INT, "
              f"code_key BIGINT, code_bits ARRAY<BIGINT>")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = pdf[vector_col].to_numpy()
            lens = np.fromiter((len(v) for v in vecs), dtype=np.int64, count=len(vecs))
            ok = lens == dim
            if ok.any():
                V = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs[ok]])
                finite = np.isfinite(V).all(axis=1)
                V = V[finite]
                ids = pdf[id_col].to_numpy()[ok][finite]
            else:
                V = np.empty((0, dim)); ids = pdf[id_col].to_numpy()[:0]
            n = V.shape[0]
            if n == 0:
                continue
            frames = []
            for t, d, alpha, r, omega in packed:
                keys, words = code_family(V, alpha, r, omega, lam)
                frames.append(pd.DataFrame({
                    id_col: ids,
                    "table": np.full(n, t, dtype=np.int32),
                    "division": np.full(n, d, dtype=np.int32),
                    "code_key": keys,
                    "code_bits": list(words),
                }))
            yield pd.concat(frames, ignore_index=True)

    return df.select(id_col, vector_col).mapInPandas(run, schema=schema)


def with_hamming(df: DataFrame, a_col: str, b_col: str, out_col: str = "hamming") -> DataFrame:
    """Native-expression hamming over ARRAY<BIGINT> packed codes (C2):
    sum(bit_count(xor)) per word pair — whole-stage-codegen friendly, no UDF."""
    expr = F.aggregate(
        F.zip_with(F.col(a_col), F.col(b_col), lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"), lambda acc, v: acc + v.cast("long"))
    return df.withColumn(out_col, expr)
