"""Batched ANN query pipeline (reference read path
``query/.../QueryServiceImpl.search:101-352`` +
``index/.../PartitionedIndexService.lookupCandidatesWithScores:592-715``).

The reference answers queries one at a time; this engine executes the
whole query *set* as one DataFrame plan (SURVEY §3.2 — the single biggest
idiomatic win).  Physical shape (SURVEY §4):

  queries → [code UDF] → q_codes (q_id, table, division, key, bits)
          → routing against broadcast partition bounds (binary search +
            hamming-ranked multi-probe, O2/O3)                 map-side
          → join codes table on (table, division, part_idx)    shuffle 1
          → groupBy (q_id, id) min(partition hamming)  (J2/A1)
          → per-query ranked-hamming prefilter, LIMIT refinement (F4/O5)
          → join point payloads on id (J1), decrypt if encrypted (C5)
          → exact L2 (C1) → per-query window rank ≤ K (A2)     shuffle 2
          → results (q_id, id, distance, rank)

The decrypt/score stage runs strictly after the refinement limit — the
plan is shaped so Catalyst cannot float the expensive UDF above the
cheap hamming cut (SURVEY §4 "predicate ordering").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..lsh.coding import code_vectors, code_family, _popcount
from ..lsh.params import LshParams, LshConfig, fit_params_from_df
from ..lsh.partitioner import build_partitions
from ..functions.distance import l2_expr


@dataclass
class AnnIndex:
    """Immutable routing state + payload table handle.

    Routing state (codes/bounds) never changes under key rotation —
    the reference's routing–ciphertext orthogonality invariant
    (``ARCHITECTURE.md:7-25``).
    """
    params: LshParams
    codes: DataFrame      # (id, table, division, code_key, code_bits, part_idx)
    bounds: DataFrame     # (table, division, part_idx, min/max/center_key, rep_bits, n_ids)
    points: DataFrame     # plaintext (id, vector) OR encrypted store
    encrypted: bool = False
    decrypt_fn: object = None   # callable df -> df adding "vector" (crypto layer)
    _routing_bc: object = None

    @classmethod
    def build(cls, vectors: DataFrame, cfg: LshConfig,
              params: LshParams | None = None,
              id_col: str = "id", vector_col: str = "vector") -> "AnnIndex":
        """Fit params from a sample (P5-P7), code all vectors (P8), build
        greedy partitions (O1), cache the hot tables."""
        if params is None:
            params = fit_params_from_df(vectors, cfg, vector_col=vector_col)
        codes = code_vectors(vectors, params, id_col=id_col, vector_col=vector_col)
        # count() is a cheap metadata scan on columnar sources and picks
        # the ranking strategy: one window for small builds, two-pass
        # distributed ranking past DISTRIBUTED_RANK_THRESHOLD codes
        n_codes = vectors.count() * cfg.tables * cfg.divisions
        codes_p, bounds = build_partitions(codes, cfg.block_size, id_col=id_col,
                                           n_codes=n_codes)
        codes_p = codes_p.persist()
        bounds = bounds.persist()
        points = vectors.select(F.col(id_col).alias("id"),
                                F.col(vector_col).alias("vector"))
        return cls(params=params, codes=codes_p, bounds=bounds, points=points)

    def with_encrypted_points(self, encrypted: DataFrame, keys_bc,
                              mode: str = "skip") -> "AnnIndex":
        """Swap the payload table for an encrypted_points table (FIXTURES
        §4 schema).  Routing state is untouched — the reference's
        routing–ciphertext orthogonality invariant: key rotation never
        changes codes or partition bounds."""
        from ..crypto.aes import decrypt_vectors
        from dataclasses import replace
        return replace(
            self, points=encrypted, encrypted=True,
            decrypt_fn=lambda df: decrypt_vectors(df, keys_bc, mode=mode))

    def save(self, path: str) -> None:
        """Persist routing state (restart path, SURVEY §3.4 — strictly
        better than the reference, whose codes live only in RAM and must
        be re-derived by decrypt+recode).  Codes are laid out
        range-sorted by (table, division, code_key): parquet min/max
        stats then prune probe scans exactly like the in-memory binary
        search.  Payload tables are saved separately — they evolve under
        key rotation; routing state never does (orthogonality
        invariant)."""
        from ..lsh.params import save_params
        (self.codes
         .repartitionByRange("table", "division", "code_key")
         .sortWithinPartitions("table", "division", "code_key")
         .write.mode("overwrite").parquet(f"{path}/codes"))
        self.bounds.write.mode("overwrite").parquet(f"{path}/bounds")
        save_params(self.bounds.sparkSession, self.params, f"{path}/params")

    @classmethod
    def load(cls, spark, path: str, points: DataFrame) -> "AnnIndex":
        """Reopen a saved index against a payload table (plaintext or
        encrypted via ``with_encrypted_points`` after load)."""
        from ..lsh.params import load_params
        params = load_params(spark, f"{path}/params")
        codes = spark.read.parquet(f"{path}/codes").persist()
        bounds = spark.read.parquet(f"{path}/bounds").persist()
        return cls(params=params, codes=codes, bounds=bounds, points=points)

    def routing(self):
        """Collect + broadcast per-(t,d) partition bounds for driver-free
        binary-search routing in executors.  Bounds are N/block rows —
        tiny relative to data (SURVEY §2 O2)."""
        if self._routing_bc is None:
            rows = self.bounds.select(
                "table", "division", "part_idx", "min_key", "max_key", "rep_bits"
            ).collect()
            info: dict = {}
            for r in rows:
                info.setdefault((r.table, r.division), []).append(
                    (r.part_idx, r.min_key, r.max_key, r.rep_bits))
            packed = {}
            for td, lst in info.items():
                lst.sort()
                packed[td] = (
                    np.array([x[1] for x in lst], dtype=np.int64),   # min_keys
                    np.array([x[2] for x in lst], dtype=np.int64),   # max_keys
                    np.array([x[3] for x in lst], dtype=np.int64),   # rep words (P, W)
                )
            spark = self.bounds.sparkSession
            self._routing_bc = spark.sparkContext.broadcast(packed)
        return self._routing_bc


def _route_probes(q_codes: DataFrame, routing_bc, probes: int) -> DataFrame:
    """(q_id, table, division, code_key, code_bits) →
    (q_id, table, division, part_idx, part_ham).

    Binary-search the sorted bounds for the partition containing (or
    nearest to) the query key (reference ``GreedyPartitioner
    .findNearestPartition:101-124``), then take the ``probes``
    best-by-hamming partitions inside the ±probes contiguous window —
    the reachable set of the reference's best-first queue
    (``PartitionedIndexService.lookupCandidateIds:506-553``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        packed = routing_bc.value
        for pdf in batches:
            out_q, out_t, out_d, out_p, out_h = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                td = (row.table, row.division)
                if td not in packed:
                    continue
                min_keys, max_keys, reps = packed[td]
                npart = len(min_keys)
                qk = row.code_key
                # binary search on min_keys; check containment vs nearest
                pos = int(np.searchsorted(min_keys, qk, side="right")) - 1
                if pos >= 0 and qk <= max_keys[pos]:
                    routed = pos
                else:
                    left = pos if pos >= 0 else 0
                    right = min(pos + 1, npart - 1)
                    dl = max(min_keys[left] - qk, qk - max_keys[left], 0)
                    dr = max(min_keys[right] - qk, qk - max_keys[right], 0)
                    routed = left if dl <= dr else right
                lo = max(0, routed - probes)
                hi = min(npart, routed + probes + 1)
                window = np.arange(lo, hi)
                qbits = np.array(row.code_bits, dtype=np.int64)
                x = (reps[window] ^ qbits).view(np.uint64)
                ham = _popcount(x).sum(axis=1).astype(np.int64)
                order = np.lexsort((window, np.abs(window - routed), ham))[:probes]
                sel = window[order]
                out_q.append(np.full(len(sel), row.q_id))
                out_t.append(np.full(len(sel), row.table, dtype=np.int32))
                out_d.append(np.full(len(sel), row.division, dtype=np.int32))
                out_p.append(sel.astype(np.int32))
                out_h.append(ham[order])
            if out_q:
                yield pd.DataFrame({
                    "q_id": np.concatenate(out_q),
                    "table": np.concatenate(out_t),
                    "division": np.concatenate(out_d),
                    "part_idx": np.concatenate(out_p),
                    "part_ham": np.concatenate(out_h),
                })

    return q_codes.mapInPandas(
        run, schema="q_id BIGINT, table INT, division INT, part_idx INT, part_ham BIGINT")


def search_batch(index: AnnIndex, queries: DataFrame, k: int = 10,
                 probes: int | None = None,
                 refinement_limit: int | None = None,
                 hamming_threshold: int | None = None,
                 q_id_col: str = "q_id", q_vector_col: str = "vector") -> DataFrame:
    """Top-k ANN for a whole query set → (q_id, id, distance, rank)."""
    cfg = index.params.cfg
    probes = probes or cfg.probes
    refinement_limit = refinement_limit or cfg.refinement_limit
    T = cfg.hamming_threshold if hamming_threshold is None else hamming_threshold

    q = queries.select(F.col(q_id_col).alias("q_id"),
                       F.col(q_vector_col).alias("vector"))
    q_codes = code_vectors(q, index.params, id_col="q_id", vector_col="vector")

    probes_df = _route_probes(q_codes, index.routing(), probes)

    # shuffle 1: probe partitions → member ids; min-merge across tables/divisions
    cand = (probes_df.join(index.codes.select("table", "division", "part_idx", "id"),
                           on=["table", "division", "part_idx"])
            .groupBy("q_id", "id").agg(F.min("part_ham").alias("ham")))

    # F4 ranked-hamming prefilter + O5 bounded refinement, one sort:
    # ORDER BY (ham > T), ham, id LIMIT refinement_limit per query.
    w = Window.partitionBy("q_id").orderBy(
        (F.col("ham") > F.lit(T)).cast("int") if T > 0 else F.lit(0),
        F.col("ham").asc(), F.col("id").asc())
    kept = (cand.withColumn("_cr", F.row_number().over(w))
            .filter(F.col("_cr") <= refinement_limit).drop("_cr"))

    # J1: candidates ⋈ payloads; decrypt only survivors (C5 after O5).
    if index.encrypted:
        scored_src = index.decrypt_fn(kept.join(index.points, on="id"))
    else:
        scored_src = kept.join(index.points, on="id")

    qv = q.withColumnRenamed("vector", "_qvec")
    scored = (scored_src.join(F.broadcast(qv), on="q_id")
              .withColumn("distance", l2_expr("_qvec", "vector")))

    # shuffle 2: per-query exact rank (A2), ties by id (A3 semantics)
    wr = Window.partitionBy("q_id").orderBy(F.col("distance").asc(), F.col("id").asc())
    return (scored.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= k)
            .select("q_id", "id", "distance", "rank"))


def search_batch_adaptive(index: AnnIndex, queries: DataFrame, k: int = 10,
                          **kw) -> DataFrame:
    """O6 adaptive retry: one extra pass with the wider probe budget for
    queries that returned fewer than k rows (reference
    ``QueryServiceImpl.needRetry:444-447``)."""
    first = search_batch(index, queries, k=k, **kw).persist()
    counts = first.groupBy("q_id").count()
    under = counts.filter(F.col("count") < k).select("q_id")
    missing = queries.join(under.withColumnRenamed("q_id", "_u"),
                           queries["q_id"] == F.col("_u"), "left_semi")
    if missing.limit(1).count() == 0:
        return first
    retry = search_batch(index, missing, k=k,
                         probes=index.params.cfg.probe_override, **kw)
    kept = first.join(under, on="q_id", how="left_anti")
    return kept.unionByName(retry)
