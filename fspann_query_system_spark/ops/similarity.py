"""Similarity search over embedding columns (beyond-reference mandate):
brute-force cosine top-k baseline + LSH-bucketed scale path, and
embedding-cosine near-duplicate detection.

The LSH machinery is the engine's own (lsh/ + query/ann) — similarity
search is the same physical plan with cosine instead of L2 on normalized
vectors (cos(a,b) = 1 - ||â-b̂||²/2, so the L2 index over normalized
vectors IS a cosine index)."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import cosine_expr
from ..functions.plan import rows_cached
from .pq import _q9


def cosine_topk(base: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "id", vector_col: str = "vector",
                q_id_col: str = "q_id", q_vector_col: str = "vector") -> DataFrame:
    """Blocked brute-force cosine top-k → (q_id, id, cosine, rank).
    Same partial-top-k shape as query.exact.knn_exact: the shuffle
    carries O(Q*k*n_batches) rows; scan is embarrassingly parallel."""
    spark = base.sparkSession
    q_rows = rows_cached(queries, q_id_col, q_vector_col)
    if not q_rows:
        return spark.createDataFrame([], "q_id BIGINT, id BIGINT, cosine DOUBLE, rank INT")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    bc = spark.sparkContext.broadcast((q_ids, Qn, k))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_, Qn_, k_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf[vector_col].to_numpy()])
            Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-30)
            ids = pdf[id_col].to_numpy()
            sims = Bn @ Qn_.T                      # (n, q)
            n = len(ids)
            kk = min(k_, n)
            frames = []
            for qi in range(len(q_ids_)):
                s = sims[:, qi]
                if kk < n:
                    # tie-inclusive cut (see query/exact.py): boundary
                    # ties must all survive or the result depends on
                    # batch partitioning
                    kth = -np.partition(-s, kk - 1)[kk - 1]
                    part = np.flatnonzero(s >= kth)
                else:
                    part = np.arange(n)
                frames.append(pd.DataFrame({
                    "q_id": np.full(len(part), q_ids_[qi], dtype=np.int64),
                    "id": ids[part], "cosine": s[part]}))
            yield pd.concat(frames, ignore_index=True)

    id_type = base.schema[id_col].dataType.simpleString()
    partial = base.select(id_col, vector_col).mapInPandas(
        run, schema=f"q_id BIGINT, id {id_type}, cosine DOUBLE")
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("id").asc())
    return (partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def cosine_topk_sql_shape(base: DataFrame, queries: DataFrame, k: int = 10,
                          id_col: str = "id", vector_col: str = "vector",
                          q_id_col: str = "q_id", q_vector_col: str = "vector") -> DataFrame:
    """Declarative crossJoin+window variant (native exprs; the oracle's
    plan shape, and exact to the last ulp for correctness checks)."""
    q = queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vector_col).alias("_qv"))
    b = base.select(F.col(id_col).alias("id"), F.col(vector_col).alias("_bv"))
    joined = b.crossJoin(F.broadcast(q)).withColumn(
        "cosine", cosine_expr("_qv", "_bv"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("id").asc())
    return (joined.select("q_id", "id", "cosine")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _nearest_cells(df: DataFrame, centroids: DataFrame, n_cells: int,
                   id_col: str, vector_col: str,
                   c_id_col: str, c_vector_col: str,
                   keep_vector: bool, quantize: bool = False,
                   sq8: tuple | None = None,
                   mass: tuple | None = None,
                   cell_mod: tuple | None = None,
                   packed: bool = False) -> DataFrame:
    """Shared coarse-quantizer kernel: for each row, the ``n_cells``
    nearest centroids by L2, ties broken by lowest centroid id →
    (id[, vector], cell[, cell_rank]).

    Arrow-batched numpy against the broadcast centroid matrix — strictly
    map-side: no crossJoin, no shuffle, no window.  Per batch it is |C|
    vectorized row-sweeps (``(B - C_j)² @ 1``), so memory is O(batch×|C|)
    distances, never a batch×|C|×dim cube.

    ``quantize=True`` sums ELEMENT-QUANTIZED (``_q9``) squared diffs in
    the exact sweep — for assigns that chain into a cross-engine oracle
    comparison (semantic_dedup / cluster_sample's final kmeans assign),
    where a float near-tie could resolve differently under DuckDB's
    parallel aggregation.  Ignored by the tiled-GEMM branches (they
    serve SemDeDup-scale |C|, past any oracle fixture — see
    :func:`_argmin_cells`).

    ``sq8=(mins, maxs)`` (requires ``keep_vector=True``) replaces the
    emitted vector column with ``qcodes BINARY`` — the row's SQ8 codes
    packed one byte per dimension (``floor((x-mn)/rg*255 + 0.5)``,
    HALF_UP like ``sq8_quantize``; rg=0 dims → 0).  This is the
    knn_join_sq8 probe payload: dim BYTES per probe row instead of
    8·dim, an 8× probe-shuffle reduction over float64.

    ``mass=(counts, budget)`` switches to per-row ADAPTIVE probing
    (the map-side twin of :func:`_adaptive_probe_cells`, verdict r08
    Next #5): ``counts`` is the {cell: member_count} census (one
    |C|-bounded collect), and each row probes cells in ascending
    ELEMENT-QUANTIZED (``_q9``) L2 order — ties by lowest cid — while
    the cumulative member count of the cells BEFORE it is < ``budget``.
    Per-row scanned candidate mass is thus hard-bounded regardless of
    cell-size skew, which fixed ``n_cells`` cannot offer (a prober
    whose nearest cell holds 10× the average pays 10× under fixed
    nprobe).  ``n_cells`` is ignored and no ``cell_rank`` is emitted
    (the probe count varies per row).  The selection uses the exact
    quantized per-centroid sweep regardless of |C| so a SQL oracle's
    cumulative-sum window over the same (dd, cid) ordering picks
    IDENTICAL cells — at SemDeDup-scale |C| (≥ 10⁴) prefer fixed
    probing or a coarser census.

    ``cell_mod=(g, gi)`` emits ONLY probe rows whose cell ≡ gi
    (mod g): probe SELECTION runs unchanged (the mass rule still sees
    every cell's cumulative count), and the union over gi ∈ [0, g)
    equals the unfiltered output EXACTLY.  Measured honestly at
    10M×p16/g4 (SCALE.md §9j): re-running the fixed-nc selection per
    group costs MORE than the persist cycle it avoids — kept for the
    union-equality contract and small-g mass probing, but the staged
    :func:`knn_join_sq8` uses ``packed`` instead.

    ``packed=True`` (requires ``keep_vector=True``; the verdict r09
    Next #4 fix) emits ONE ROW PER INPUT ROW — (id, payload,
    cells ARRAY<BIGINT> in probe order) — instead of one row per
    (row, cell).  This removes the n·nprobe payload REDUNDANCY from
    the probe table (a 64-byte qcodes payload duplicated nprobe
    times was the real bulk of the r9-profiled materialization
    sub-wall: ~16 GB at 10M×p16 vs ~2.6 GB packed), so the staged
    path persists the packed table once and each group explodes only
    its cell ≡ gi slice JVM-side."""
    spark = df.sparkSession
    c_rows = rows_cached(centroids, c_id_col, c_vector_col)
    cid = np.array([r[0] for r in c_rows], dtype=np.int64)
    C = np.array([list(r[1]) for r in c_rows], dtype=np.float64)
    order = np.argsort(cid, kind="stable")      # argmin ties -> lowest cid
    sq8_arrs = None
    if sq8 is not None:
        mn8 = np.asarray(sq8[0], dtype=np.float64)
        rg8 = np.asarray(sq8[1], dtype=np.float64) - mn8
        sq8_arrs = (mn8, rg8)
    mass_arrs = None
    if mass is not None:
        counts, budget = mass
        if budget < 1:
            raise ValueError(f"probe mass budget must be >= 1, "
                             f"got {budget}")
        cnt = np.array([int(counts.get(int(c), 0)) for c in cid[order]],
                       dtype=np.int64)
        mass_arrs = (cnt, int(budget))
    if packed and not keep_vector:
        raise ValueError("packed=True requires keep_vector=True "
                         "(the payload is the point of packing)")
    if packed and cell_mod is not None:
        raise ValueError("packed and cell_mod are mutually exclusive "
                         "(slice the packed cells array downstream)")
    bc = spark.sparkContext.broadcast((cid[order], C[order], n_cells,
                                       sq8_arrs, mass_arrs, cell_mod,
                                       packed))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _nc_batches(bc.value, id_col, vector_col, keep_vector,
                               quantize, batches)

    id_type = df.schema[id_col].dataType.simpleString()
    vec_type = df.schema[vector_col].dataType.simpleString()
    schema = f"{id_col} {id_type}"
    if keep_vector:
        if sq8 is not None:
            schema += ", qcodes BINARY"
        else:
            schema += f", {vector_col} {vec_type}"
    if packed:
        schema += ", cells ARRAY<BIGINT>"
    else:
        schema += ", cell BIGINT"
        if n_cells > 1 and mass is None:
            schema += ", cell_rank INT"
    return df.select(id_col, vector_col).mapInPandas(run, schema=schema)


def _nc_batches(state, id_col: str, vector_col: str, keep_vector: bool,
                quantize: bool, batches: "Iterator[pd.DataFrame]"
                ) -> "Iterator[pd.DataFrame]":
    """The per-batch body of :func:`_nearest_cells`'s Arrow kernel,
    hoisted to module level so the DRIVER-SIDE probe path
    (:func:`_probe_cells_local`) runs the IDENTICAL code on a collected
    query batch — the probe sets cannot drift between the two spellings
    because they are the same function."""
    cid_, C_, nc_req, sq8_, mass_, cmod_, packed_ = state
    nc = min(nc_req, len(cid_))


    def payload(V: np.ndarray) -> list:
        # sq8 packing: HALF_UP rounding (floor(x+0.5) on the
        # non-negative normalized value — mirrors sq8_quantize's
        # F.round and the oracle's round())
        mn8, rg8 = sq8_
        x = np.zeros_like(V)
        nz = rg8 > 0
        x[:, nz] = (V[:, nz] - mn8[nz]) / rg8[nz] * 255.0
        codes = np.clip(np.floor(x + 0.5), 0, 255).astype(np.uint8)
        return [c.tobytes() for c in codes]

    for pdf in batches:
        if len(pdf) == 0:
            continue
        B = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in pdf[vector_col].to_numpy()])
        if mass_ is not None:
            # adaptive mass-budget probing: order cells by
            # element-quantized (dd, cid); keep cell i while the
            # cumulative member count of cells BEFORE it is <
            # budget.  Row chunks bound the working set.
            #
            # Small codebook (<= 256, the oracle fixtures): exact
            # quantized sweep over ALL cells + stable argsort on
            # int64 dd over cid-ascending columns == (dd, cid)
            # order, engine-reproducible at any tie density.
            #
            # Large codebook (the scale path): the full sweep is
            # |C| python-loop passes + a (rows × |C|) sort per
            # chunk — measured as kernel-dominating at |C| = 10⁴.
            # Instead: T = the worst-case cell count that covers
            # the budget (smallest prefix of ASCENDING cell counts
            # ≥ budget — no prober can need more cells than the
            # all-smallest-cells adversary), tiled-GEMM float
            # prefilter to the T+8 nearest (same +8 margin and
            # tie caveat as the nc>1 branch), quantized recompute
            # of only those, then the same (dd, cid) cumulative
            # rule within the shortlist.
            cnt_, budget_ = mass_
            ids_all = pdf[id_col].to_numpy()
            vec_all = pdf[vector_col].to_numpy()
            T = len(cid_)
            if len(cid_) > 256:
                asc = np.cumsum(np.sort(cnt_))
                T = min(len(cid_),
                        int(np.searchsorted(asc, budget_)) + 1 + 8)
            cn = np.square(C_).sum(axis=1)
            # bound the (rows × |C|) GEMM buffer at ~32 MB/task and
            # PREALLOCATE it: a fresh allocation per chunk is the
            # page-zeroing storm the nc==1 branch documents
            # (measured: it dominated the 10M probe kernel)
            RB = max(256, min(2048, (4 << 20) // max(1, len(cid_))))
            gbuf = (np.empty((min(RB, len(B)), len(cid_)))
                    if T < len(cid_) else None)
            for r0 in range(0, len(B), RB):
                Br = B[r0:r0 + RB]
                if T < len(cid_):
                    # float GEMM prefilter (|q|² is row-constant,
                    # cannot move the per-row order)
                    d2g = gbuf[:len(Br)]
                    np.matmul(Br, C_.T, out=d2g)
                    d2g *= -2.0
                    d2g += cn
                    part = np.argpartition(d2g, T - 1,
                                           axis=1)[:, :T]
                    # column index == cid rank: pre-sort so the
                    # later stable argsort ties break by cid
                    part = np.sort(part, axis=1)
                    # quantized recompute of the shortlist, tiled
                    # over rows: RB is sized only by |C|, so just
                    # past the 256-centroid crossover a large
                    # budget (T → |C|) would otherwise blow the
                    # (RB × T × dim) cube to hundreds of MB/task
                    # (r09 ADVICE) — cap the cube at ~32 MB
                    sub = max(1, (32 << 20)
                              // max(1, T * Br.shape[1] * 8))
                    dd = np.empty((len(Br), T), dtype=np.int64)
                    for s0 in range(0, len(Br), sub):
                        diff = (Br[s0:s0 + sub, None, :]
                                - C_[part[s0:s0 + sub]])
                        dd[s0:s0 + sub] = _q9(
                            np.square(diff)).sum(axis=2)
                    ordT = np.argsort(dd, axis=1, kind="stable")
                    perm = np.take_along_axis(part, ordT, 1)
                else:
                    d2 = np.empty((len(Br), len(cid_)),
                                  dtype=np.int64)
                    for j in range(len(cid_)):
                        d2[:, j] = _q9(
                            np.square(Br - C_[j])).sum(axis=1)
                    perm = np.argsort(d2, axis=1, kind="stable")
                run_cnt = np.cumsum(cnt_[perm], axis=1)
                keep = np.empty(perm.shape, dtype=bool)
                keep[:, 0] = True           # prior mass 0 < budget
                keep[:, 1:] = run_cnt[:, :-1] < budget_
                if cmod_ is not None:
                    # group slice AFTER the budget rule: selection
                    # is global, emission per-group (union == all)
                    keep &= (cid_[perm] % cmod_[0]) == cmod_[1]
                nk = keep.sum(axis=1)
                # perm[keep] flattens row-major: per-row cells in
                # (dd, cid) order, rows in input order
                flat_cells = cid_[perm[keep]]
                if packed_:
                    out = {id_col: ids_all[r0:r0 + RB]}
                    if sq8_ is not None:
                        out["qcodes"] = payload(Br)
                    else:
                        out[vector_col] = vec_all[r0:r0 + RB]
                    out["cells"] = np.split(flat_cells,
                                            np.cumsum(nk)[:-1])
                    yield pd.DataFrame(out)
                    continue
                out = {id_col: np.repeat(ids_all[r0:r0 + RB], nk)}
                if keep_vector:
                    if sq8_ is not None:
                        out["qcodes"] = list(np.repeat(
                            np.array(payload(Br), dtype=object), nk))
                    else:
                        out[vector_col] = np.repeat(
                            vec_all[r0:r0 + RB], nk)
                out["cell"] = flat_cells
                yield pd.DataFrame(out)
            continue
        if nc_req == 1 and len(cid_) > 256:
            # large codebook (SemDeDup-scale k ~ n/64): GEMM form
            # -2 b·c + |c|^2 (the |b|^2 term is row-constant, so it
            # cannot move the argmin), computed in (row, centroid)
            # TILES with preallocated buffers and a running argmin.
            # Materializing the full batch×k distance matrix (and
            # the GEMM expression's temporaries) at k=15625 means
            # several ~1.25 GB allocations per 10k-row batch ×32
            # concurrent workers — measured as a kernel-time
            # page-zeroing storm that was SLOWER than the python
            # loop.  Tiles bound the working set at ~64 MB/task.
            # fp summation order differs from the exact sweep only
            # within ~1 ulp; oracle-gated small-k entries keep the
            # exact per-centroid sweep below.
            cn = np.square(C_).sum(axis=1)
            RB, CB = 2048, 4096
            buf = np.empty((RB, CB), dtype=np.float64)
            best_d = np.empty(len(B), dtype=np.float64)
            best_j = np.empty(len(B), dtype=np.int64)
            for r0 in range(0, len(B), RB):
                Br = B[r0:r0 + RB]
                bd = np.full(len(Br), np.inf)
                bj = np.zeros(len(Br), dtype=np.int64)
                for c0 in range(0, len(cid_), CB):
                    Ct = C_[c0:c0 + CB]
                    t = buf[:len(Br), :len(Ct)]
                    np.matmul(Br, Ct.T, out=t)
                    t *= -2.0
                    t += cn[c0:c0 + CB]
                    j = t.argmin(axis=1)
                    d = t[np.arange(len(Br)), j]
                    upd = d < bd      # strict: ties keep lower cid
                    bd[upd] = d[upd]
                    bj[upd] = j[upd] + c0
                best_d[r0:r0 + RB] = bd
                best_j[r0:r0 + RB] = bj
            cells1 = cid_[best_j]
            if packed_:
                out = {id_col: pdf[id_col].to_numpy()}
                if sq8_ is not None:
                    out["qcodes"] = payload(B)
                else:
                    out[vector_col] = pdf[vector_col].to_numpy()
                out["cells"] = list(cells1[:, None])
                yield pd.DataFrame(out)
                continue
            rows = (slice(None) if cmod_ is None else
                    (cells1 % cmod_[0]) == cmod_[1])
            out = {id_col: pdf[id_col].to_numpy()[rows]}
            if keep_vector:
                if sq8_ is not None:
                    out["qcodes"] = (payload(B) if cmod_ is None else
                                     payload(B[rows]))
                else:
                    out[vector_col] = \
                        pdf[vector_col].to_numpy()[rows]
            out["cell"] = cells1[rows]
            yield pd.DataFrame(out)
            continue
        if nc_req > 1 and len(cid_) > 256:
            # large codebook, top-nc probes (the IVF query path at
            # SemDeDup-scale |C|): same tiled GEMM as the nc==1
            # branch, with a per-tile top-(nc+8) candidate cut and
            # one final per-row (d, cid) merge — O(|C|) GEMM work
            # per row instead of |C| python sweeps per batch
            # (measured: |C|=10k probes at 10M went from hours to
            # minutes).  The +8 margin absorbs within-tile float
            # ties at the cut; a >8-deep cohort of bit-identical
            # GEMM distances straddling the boundary (duplicate
            # centroids) could still resolve differently than the
            # exact path's lowest-cid order — small-|C| oracle
            # fixtures keep the exact sweep below.
            cn = np.square(C_).sum(axis=1)
            RB, CB = 2048, 4096
            kk = min(nc + 8, len(cid_))
            near = np.empty((len(B), nc), dtype=np.int64)
            for r0 in range(0, len(B), RB):
                Br = B[r0:r0 + RB]
                cd, cj = [], []
                for c0 in range(0, len(cid_), CB):
                    Ct = C_[c0:c0 + CB]
                    t = Br @ Ct.T
                    t *= -2.0
                    t += cn[c0:c0 + CB]
                    w = min(kk, t.shape[1])
                    part = np.argpartition(t, w - 1, axis=1)[:, :w]
                    cd.append(np.take_along_axis(t, part, 1))
                    cj.append(part + c0)
                md = np.concatenate(cd, axis=1)
                mj = np.concatenate(cj, axis=1)
                for r in range(len(Br)):
                    order = np.lexsort((mj[r], md[r]))[:nc]
                    near[r0 + r] = mj[r][order]
        elif quantize:
            d2 = np.empty((len(B), len(cid_)), dtype=np.int64)
            for j in range(len(cid_)):
                d2[:, j] = _q9(np.square(B - C_[j])).sum(axis=1)
            near = None
        else:
            d2 = np.empty((len(B), len(cid_)), dtype=np.float64)
            for j in range(len(cid_)):
                d2[:, j] = np.square(B - C_[j]).sum(axis=1)
            near = None
        if nc_req == 1:
            # argmin returns the first (= lowest-cid) minimum
            cells_m = cid_[np.argmin(d2, axis=1)][:, None]
        else:
            if near is None:
                near = np.argsort(d2, axis=1, kind="stable")[:, :nc]
            cells_m = cid_[near]
        if packed_:
            out = {id_col: pdf[id_col].to_numpy()}
            if sq8_ is not None:
                out["qcodes"] = payload(B)
            else:
                out[vector_col] = pdf[vector_col].to_numpy()
            out["cells"] = list(cells_m)
            yield pd.DataFrame(out)
            continue
        if cmod_ is None:             # unfiltered fast path
            out = {id_col: np.repeat(pdf[id_col].to_numpy(), nc)}
            if keep_vector:
                if sq8_ is not None:
                    out["qcodes"] = list(np.repeat(
                        np.array(payload(B), dtype=object), nc))
                else:
                    out[vector_col] = np.repeat(
                        pdf[vector_col].to_numpy(), nc)
            out["cell"] = cells_m.ravel()
            if nc_req > 1:
                out["cell_rank"] = np.tile(np.arange(1, nc + 1),
                                           len(B))
            yield pd.DataFrame(out)
            continue
        kmask = (cells_m % cmod_[0]) == cmod_[1]
        nk = kmask.sum(axis=1)
        out = {id_col: np.repeat(pdf[id_col].to_numpy(), nk)}
        if keep_vector:
            if sq8_ is not None:
                out["qcodes"] = list(np.repeat(
                    np.array(payload(B), dtype=object), nk))
            else:
                out[vector_col] = np.repeat(
                    pdf[vector_col].to_numpy(), nk)
        out["cell"] = cells_m[kmask]
        if nc_req > 1:
            ranks_m = np.tile(np.arange(1, nc + 1),
                              (len(B), 1))
            out["cell_rank"] = ranks_m[kmask]
        yield pd.DataFrame(out)


def _probe_cells_local(q_rows, c_rows, n_cells: int,
                       mass: tuple | None = None) -> dict:
    """Driver-side fixed/adaptive probe sets for an ALREADY-COLLECTED
    query batch: {q_id: sorted int64 cell array}.

    Runs :func:`_nc_batches` — the exact `_nearest_cells` kernel body —
    on the collected rows, so the probe sets are bit-identical to the
    distributed spelling by construction.  The point (guide §1/§4): the
    online ANN families (`ivfpq_topk`, `_ivf_bq_partial`) already
    collect both the query batch and the centroid table; deriving the
    Q·nprobe probe pairs locally removes one whole Spark job (scan +
    Arrow kernel + collect) from every call without touching results.
    ``mass=(counts, budget)`` mirrors `_nearest_cells(mass=)` —
    validation included."""
    cid = np.array([r[0] for r in c_rows], dtype=np.int64)
    C = np.array([list(r[1]) for r in c_rows], dtype=np.float64)
    order = np.argsort(cid, kind="stable")
    mass_arrs = None
    if mass is not None:
        counts, budget = mass
        if budget < 1:
            raise ValueError(f"probe mass budget must be >= 1, "
                             f"got {budget}")
        cnt = np.array([int(counts.get(int(c), 0)) for c in cid[order]],
                       dtype=np.int64)
        mass_arrs = (cnt, int(budget))
    state = (cid[order], C[order], n_cells, None, mass_arrs, None, False)
    pdf = pd.DataFrame({"q_id": [r[0] for r in q_rows],
                        "vector": [list(r[1]) for r in q_rows]})
    probed: dict[int, set] = {}
    for out in _nc_batches(state, "q_id", "vector", False, False,
                           iter([pdf])):
        for q, c in zip(out["q_id"].to_numpy(), out["cell"].to_numpy()):
            probed.setdefault(int(q), set()).add(int(c))
    return {q: np.array(sorted(s), dtype=np.int64)
            for q, s in probed.items()}


def _assign_cells_float(B: np.ndarray, cid_sorted: np.ndarray,
                        C_sorted: np.ndarray) -> np.ndarray:
    """Per-row nearest-centroid CELL ID, float sweep — EXACTLY the
    ``_nearest_cells`` nc==1 / quantize=False semantics (the
    `ivf_assign` contract): centroids pre-sorted by cid so argmin's
    first-minimum rule is the lowest-cid tie-break; tiled GEMM with
    strict-improvement updates past 256 centroids, the per-centroid
    ``(B-C_j)²`` sweep below.  Used by the fused encode+assign kernels
    (`bq_encode_assign` / `pq_encode(assign_centroids=)`) so the fused
    cell column is bit-identical to a separate `ivf_assign` pass."""
    if len(cid_sorted) > 256:
        cn = np.square(C_sorted).sum(axis=1)
        RB, CB = 2048, 4096
        buf = np.empty((RB, CB), dtype=np.float64)
        best_j = np.empty(len(B), dtype=np.int64)
        for r0 in range(0, len(B), RB):
            Br = B[r0:r0 + RB]
            bd = np.full(len(Br), np.inf)
            bj = np.zeros(len(Br), dtype=np.int64)
            for c0 in range(0, len(cid_sorted), CB):
                Ct = C_sorted[c0:c0 + CB]
                t = buf[:len(Br), :len(Ct)]
                np.matmul(Br, Ct.T, out=t)
                t *= -2.0
                t += cn[c0:c0 + CB]
                j = t.argmin(axis=1)
                d = t[np.arange(len(Br)), j]
                upd = d < bd      # strict: ties keep lower cid
                bd[upd] = d[upd]
                bj[upd] = j[upd] + c0
            best_j[r0:r0 + RB] = bj
        return cid_sorted[best_j]
    d2 = np.empty((len(B), len(cid_sorted)), dtype=np.float64)
    for j in range(len(cid_sorted)):
        d2[:, j] = np.square(B - C_sorted[j]).sum(axis=1)
    return cid_sorted[np.argmin(d2, axis=1)]


def _argmin_cells(B: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Row-wise nearest-centroid INDEX (ties → lowest index): the exact
    per-centroid sweep for small codebooks, the tiled-GEMM form past
    256 centroids (same crossover and tie semantics as
    :func:`_nearest_cells`'s nc==1 branch).

    The exact sweep sums ELEMENT-QUANTIZED (``_q9``) squared diffs —
    order-free int64, mirrored by ``_sql_kmeans_parts``'s ``d{i}``
    CTEs, so a kmeans assign near-tie cannot flip between Spark's
    batch summation and DuckDB's parallel aggregation (the SCALE.md
    pathology-#3 class).  The GEMM branch stays float: it serves only
    SemDeDup-scale codebooks (|C| ~ n/64), far past any oracle-gated
    fixture, where a -2b·c+|c|² form has no per-element squared diff
    to quantize."""
    if len(C) > 256:
        cn = np.square(C).sum(axis=1)
        RB, CB = 2048, 4096
        best_d = np.empty(len(B), dtype=np.float64)
        best_j = np.empty(len(B), dtype=np.int64)
        for r0 in range(0, len(B), RB):
            Br = B[r0:r0 + RB]
            bd = np.full(len(Br), np.inf)
            bj = np.zeros(len(Br), dtype=np.int64)
            for c0 in range(0, len(C), CB):
                Ct = C[c0:c0 + CB]
                t = Br @ Ct.T
                t *= -2.0
                t += cn[c0:c0 + CB]
                j = t.argmin(axis=1)
                d = t[np.arange(len(Br)), j]
                upd = d < bd          # strict: ties keep lower index
                bd[upd] = d[upd]
                bj[upd] = j[upd] + c0
            best_d[r0:r0 + RB] = bd
            best_j[r0:r0 + RB] = bj
        return best_j
    d2 = np.empty((len(B), len(C)), dtype=np.int64)
    for j in range(len(C)):
        d2[:, j] = _q9(np.square(B - C[j])).sum(axis=1)
    return np.argmin(d2, axis=1)


def ivf_assign(base: DataFrame, centroids: DataFrame,
               id_col: str = "id", vector_col: str = "vector",
               c_id_col: str = "id", c_vector_col: str = "vector") -> DataFrame:
    """Ingest-time IVF cell assignment: (id, vector, cell), one row per
    input row, strictly map-side.  Computed ONCE when the index is built;
    persist it (or ``ivf_save`` it) and reuse across queries — query time
    never re-derives assignments (reference layout idea:
    ``GreedyPartitioner.java:37-76`` id→partition materialization)."""
    return _nearest_cells(base, centroids, 1, id_col, vector_col,
                          c_id_col, c_vector_col, keep_vector=True)


def kmeans_fit(df: DataFrame, k: int = 16, iters: int = 2,
               id_col: str = "id", vector_col: str = "vector",
               fit_fraction: float = 1.0) -> DataFrame:
    """Distributed Lloyd k-means for the IVF coarse quantizer →
    (cell, vector) centroids after ``iters`` rounds.

    ``fit_fraction`` < 1 fits Lloyd on a DETERMINISTIC hash sample of
    the table (xxhash64(id) mod 2^20 below the fraction threshold —
    reproducible, no rand()) and is standard coarse-quantizer practice
    (faiss trains IVF quantizers on ~30–256 points/centroid, not the
    corpus): centroid quality depends on cluster geometry, which a
    uniform sample preserves, while the fit cost drops linearly — the
    full corpus is still assigned map-side downstream (``ivf_assign``).
    Default 1.0 keeps the oracle-gated chains bit-identical (the
    sampling branch is never entered); scale harnesses opt in.  The
    sample is persisted across the ``iters`` passes so the full table
    is scanned ZERO times during the fit.

    Per round, the 100TB shape: ONE fused Arrow kernel argmins each
    batch against the broadcast centroid matrix (tiled GEMM past 256
    cells, no crossJoin) and emits element-quantized int64 partial
    sums per (cell, pos) — the only shuffle carries
    O(n_batches·k·dim) partial rows, never data rows, and no vector
    ever crosses back to the JVM.

    Determinism across engines: init = the k lowest-id vectors; the
    centroid mean is an ELEMENT-QUANTIZED integer sum (components
    quantized to 1e-9, summed as int64 — order-independent under any
    parallel merge in any engine, mirrored exactly in the SQL oracle)
    rounded to 6 decimals at each round boundary, so float-summation-
    order drift cannot butterfly into different assignments next
    round; argmin ties break toward the lowest cell id on both sides.
    Cells left empty by a round keep their previous centroid (mirrored
    in SQL via left join + coalesce)."""
    if fit_fraction < 1.0:
        den = 1 << 20
        thresh = max(1, int(fit_fraction * den))
        fit_df = (df.select(id_col, vector_col)
                  .filter(F.pmod(F.xxhash64(F.col(id_col)),
                                 F.lit(den)) < thresh)
                  .persist())
    else:
        fit_df = df
    # orderBy+limit is a distributed partial top-k (no global window);
    # cell i = i-th lowest id.  The centroid state lives DRIVER-SIDE
    # as a (k, dim) matrix across rounds (the pq_fit shape, applied
    # here in the r12 optimization round): each round is then ONE
    # Spark job (kernel pass + codebook-sized agg + collect) instead
    # of three (collect of the previous round's joined table, update
    # pass, persist+count materialization) — the matrix is exactly
    # what the next round's broadcast needs anyway, and the per-round
    # persist/unpersist churn is gone.  Values are unchanged: the same
    # aggregate computes round(sum/1e9/count, 6), empty cells keep
    # their previous centroid by row absence.
    head = (fit_df.select(id_col, vector_col)
            .orderBy(id_col).limit(k).collect())
    if len(head) < k:
        raise ValueError(f"need >= {k} rows to init {k} cells")
    C_state = np.array([list(r[vector_col]) for r in head],
                       dtype=np.float64)
    for _ in range(iters):
        # Fused assign+partial-sum kernel (round 7, the pq_fit shape):
        # one Arrow pass argmins each batch against the broadcast
        # centroid matrix and emits ELEMENT-QUANTIZED int64 partial
        # sums per (cell, pos) — k·dim rows per batch, so the update
        # shuffle carries O(n_batches·k·dim) tiny rows and the n·dim
        # posexplode + Arrow round-trip of the assigned table are gone
        # entirely.  Quantized-int sums are associative AND
        # commutative, so the mean is bit-identical under ANY merge
        # order in ANY engine — the round-6 sorted-partial merge
        # protected only Spark, while the DUCKDB oracle's parallel
        # avg() measurably flipped between two states under load (17/3
        # in 20 runs of the same SQL — SCALE.md pathology #3 addendum).
        # 1e-9 quanta keep the mean within 5e-10 of true (vs the 1e-6
        # output rounding); int64 holds ~3e8 rows/cell at |x| <= 30.
        bcC = df.sparkSession.sparkContext.broadcast(C_state.copy())

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C_ = bcC.value
            dim_ = C_.shape[1]
            pos = np.arange(dim_, dtype=np.int32)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                B = np.vstack([np.asarray(v, dtype=np.float64)
                               for v in pdf[vector_col].to_numpy()])
                a = _argmin_cells(B, C_)
                cell_l, pos_l, s_l, c_l = [], [], [], []
                for j in np.unique(a):
                    mask = a == j
                    q = B[mask] * 1e9
                    ssum = (np.sign(q) * np.floor(np.abs(q) + 0.5)
                            ).astype(np.int64).sum(axis=0)
                    cell_l.append(np.full(dim_, j, dtype=np.int64))
                    pos_l.append(pos)
                    s_l.append(ssum)
                    c_l.append(np.full(dim_, int(mask.sum()),
                                       dtype=np.int64))
                if not cell_l:
                    continue
                yield pd.DataFrame({
                    "cell": np.concatenate(cell_l),
                    "pos": np.concatenate(pos_l),
                    "_s": np.concatenate(s_l),
                    "_c": np.concatenate(c_l)})

        upd_rows = (fit_df.select(vector_col)
                    .mapInPandas(run, schema="cell LONG, pos INT, _s LONG, "
                                             "_c LONG")
                    .groupBy("cell", "pos")
                    .agg(F.round(F.sum("_s") / F.lit(1e9) / F.sum("_c"), 6)
                         .alias("v"))
                    .collect())
        # the kernel has run: free this round's centroid broadcast
        # blocks on the executors — leaked per-iteration broadcasts
        # accumulate at SemDeDup-scale |C| (mirrors pq_fit)
        bcC.unpersist()
        # empty cells keep the previous centroid (rows simply absent)
        for r in upd_rows:
            C_state[r["cell"], r["pos"]] = r["v"]
    if fit_df is not df:
        fit_df.unpersist()
    return df.sparkSession.createDataFrame(
        [(int(c), [float(x) for x in C_state[c]]) for c in range(k)],
        "cell LONG, vector ARRAY<DOUBLE>")


def ivf_save(assigned: DataFrame, path: str) -> None:
    """Persist the assigned base set hive-partitioned by cell: a probe of
    nprobe cells then reads nprobe/|C| of the files — partition pruning
    does the scan elimination at 100TB (PartitionFilters in the scan
    node; asserted by tests/test_plan_quality.py)."""
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)


def ivf_topk(base: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 10, nprobe: int = 2,
             id_col: str = "id", vector_col: str = "vector",
             q_id_col: str = "q_id", q_vector_col: str = "vector",
             assigned: DataFrame | None = None,
             probe_mass: int | None = None) -> DataFrame:
    """IVF (inverted-file) approximate top-k: probe the ``nprobe``
    nearest cells per query, exact-rank only candidates in probed cells.

    Query-time plan (no crossJoin anywhere):
      probes  = map-side numpy top-nprobe cells per query  (tiny: Q×nprobe)
      cands   = broadcast(probes) ⋈ assigned on cell — the assigned table
                never shuffles; with an ``ivf_save`` layout the probe
                values prune partitions at file level
      rank    = exact L2 window top-k over candidates (the only shuffle)

    Pass ``assigned`` (from :func:`ivf_assign`, persisted or reloaded
    from an ``ivf_save`` layout) to reuse the ingest-time assignment;
    when omitted it is derived on the fly (still map-side).

    ``probe_mass`` switches to per-query ADAPTIVE mass-budget probing
    (``nprobe`` ignored): the same rule as :func:`knn_join` /
    ``ivf_bq_sq8_topk(probe_mass=)`` — cells in element-quantized
    distance order while the cumulative member count of closer cells
    is below the budget — run MAP-SIDE over the (possibly distributed)
    query table via :func:`_nearest_cells`, so unlike the
    collected-batch ``_adaptive_probe_cells`` path it never needs the
    queries on the driver.  Per-query scanned rows are hard-bounded
    under cell-size skew; the broadcast probes table simply carries a
    variable probe count per query.  NOTE (mirrors :func:`knn_join`):
    with ``probe_mass`` the cell census is collected from ``assigned``,
    so an on-the-fly (omitted) assignment runs the assign kernel over
    the full base table TWICE (census collect + candidate join) — pass
    a persisted ``assigned`` at scale (r09 ADVICE)."""
    from ..functions.distance import l2_expr
    assigned_on_the_fly = assigned is None
    if assigned is None:
        assigned = ivf_assign(base, centroids, id_col, vector_col,
                              id_col, vector_col)
    mass = None
    if probe_mass is not None:
        census_src = assigned
        if assigned_on_the_fly:
            # census-only pass: the SAME assign kernel but WITHOUT
            # carrying vectors through Arrow — the census needs only
            # `cell`, so the on-the-fly pass ships ~16 bytes/row
            # across the Python boundary instead of the full vector
            # (guide §4.2; r12 optimization round).  The candidate
            # side below keeps its own lazy vector-carrying assign.
            census_src = _nearest_cells(base, centroids, 1, id_col,
                                        vector_col, id_col, vector_col,
                                        keep_vector=False)
        counts = {r["cell"]: r["count"] for r in
                  census_src.groupBy("cell").count().collect()}
        mass = (counts, probe_mass)
    probes = _nearest_cells(
        queries, centroids, nprobe, q_id_col, q_vector_col,
        id_col, vector_col, keep_vector=True, mass=mass)
    if "cell_rank" in probes.columns:
        probes = probes.drop("cell_rank")
    qp = (probes.withColumnRenamed(q_vector_col, "_qv")
          if q_vector_col in probes.columns else probes)
    cand = (assigned.withColumnRenamed(vector_col, "_bv")
            .join(F.broadcast(qp), on="cell"))
    w_rank = Window.partitionBy(q_id_col).orderBy("dist", id_col)
    return (cand.withColumn("dist", l2_expr("_qv", "_bv"))
            .withColumn("rank", F.row_number().over(w_rank))
            .filter(F.col("rank") <= k)
            .select(q_id_col, id_col, "dist", "rank"))


def knn_join(df: DataFrame, centroids: DataFrame, k: int = 10,
             nprobe: int = 2,
             id_col: str = "id", vector_col: str = "vector",
             c_id_col: str = "id", c_vector_col: str = "vector",
             assigned: DataFrame | None = None,
             exclude_self: bool = True, method: str = "gemm",
             shuffle_dtype: str = "double",
             probe_mass: int | None = None,
             queries: DataFrame | None = None) -> DataFrame:
    """Distributed kNN self-join (the kNN-graph builder behind
    SemDeDup-style curation, graph-based dedup, and label propagation):
    for EVERY row, its k nearest neighbours among rows sharing one of
    its ``nprobe`` probed coarse cells → (q_id, id, dist, rank ≤ k).

    The difference from :func:`ivf_topk` is the query side: here it is
    the WHOLE table, so nothing is collected to the driver or
    broadcast.  Probes (row → nprobe cells, map-side kernel) and the
    cell assignment co-shuffle on ``cell``; candidate scoring is the
    JVM-codegen ``l2_expr`` inside the join; one (dist, id) window
    takes top-k per row.  Shuffle volume is n·nprobe + n rows; the
    scored pair expansion is Σ_cell |probers|·|members| ≈ n²·nprobe/|C|
    in the balanced case — never n².  At 100 TB, |C| scales with n
    (cells of ~10³–10⁴ rows) so the per-cell work stays bounded, and an
    ``ivf_save`` layout lets the member side arrive pre-partitioned.

    Each base row is assigned to exactly ONE cell and a row's probed
    cells are distinct, so a (q, neighbour) pair is scored at most once
    — no distinct needed.  ``exclude_self`` drops the trivial
    self-edge (rank semantics then match "k nearest OTHER rows").

    ``method`` picks the in-cell scoring kernel:

    * ``"gemm"`` (default, the scale path): per-cell Arrow cogroup —
      one BLAS d2 matrix per (probers × members) cell, shortlist by
      GEMM distance with a +8 safety margin, EXACT recompute of the
      shortlist (``sqrt(Σ(a-b)²)``, the ``l2_udf`` formulation), emit
      only per-(prober, cell) top-k.  The final window then ranks
      ≤ k·nprobe rows per prober instead of cell_size·nprobe.
      Measured ~40× over the expr path at 1M (SCALE.md §9g).  Ties:
      a cohort of >8 candidates at BIT-IDENTICAL distance straddling
      the k-th rank may resolve differently than the strict (dist,
      id) order — impossible for continuous embeddings, use
      ``"expr"`` for tie-dense integer corpora.
    * ``"expr"``: the declarative twin — plain cell equi-join with
      JVM-codegen ``l2q_expr`` per pair and one window; strict
      (dist, id) semantics at any tie density.

    Both methods emit the ELEMENT-QUANTIZED distance (``_q9``: each
    squared diff quantized to 1e-9 as int64 before the sum) — the
    int sum is order-independent, so the gemm kernel's numpy
    pairwise summation, the expr path's Catalyst fold, and a SQL
    oracle's sequential ``list_reduce`` all emit the SAME value and
    the SAME near-tie rank order.  An unquantized float sum differs
    across those three at ulp level, which can flip a ``round(.,6)``
    boundary or a near-tie rank between engines.

    ``shuffle_dtype="float"`` ships BOTH shuffled vector columns as
    ``array<float>``, halving the dominant cost at scale: the probe
    side carries n·nprobe full vectors, and at 10M rows × 64 d ×
    nprobe 8 the float64 form is a ~45 GB exchange (measured as the
    /tmp-spill death of the §9g nprobe-8 run).  When the source
    vectors are float32-representable (the at-rest contract — SURVEY
    §1.2 keeps float32 at rest, computes in double), the f32→f64
    round-trip is LOSSLESS and the emitted distances are bit-identical
    to the default; for arbitrary doubles it perturbs distances by
    ≤ 1e-7 relative (document per call site).  Default "double"
    keeps the oracle-gated entry byte-exact regardless of source.

    ``probe_mass`` switches probing from fixed top-``nprobe`` cells to
    per-row ADAPTIVE mass coverage (``nprobe`` is then ignored): each
    row probes cells in ascending element-quantized distance order
    while the cumulative member count of closer cells is below the
    budget — the self-join twin of the query path's
    :func:`_adaptive_probe_cells` (verdict r08 Next #5).  This
    hard-bounds every prober's scanned candidate mass under cell-size
    skew: with fixed nprobe a prober landing on a 10×-average cell
    pays 10× in its cogroup (the measured p22 tail, SCALE.md §9g),
    while a prober in a shattered region is capped at nprobe cells
    regardless of need.  Map-side: the |C|-row cell census (one
    map-combined count over ``assigned``) is collected and broadcast
    into the probe kernel — no new shuffle in the graph plan itself.
    Pass a persisted ``assigned`` at scale so the census pass reads
    the cache instead of re-running the assign kernel.

    ``queries`` switches the PROBE side from ``df`` (the self-join)
    to the given (id_col, vector_col) table — the bipartite form
    :func:`knn_join_incremental` uses to probe only a new batch
    against the full member side.  Same plan otherwise; with
    ``exclude_self`` a query row sharing an id with a member row
    still drops that pair (the self-edge when queries ⊆ df).
    """
    from ..functions.distance import l2q_expr
    if shuffle_dtype not in ("double", "float"):
        raise ValueError(f"shuffle_dtype must be 'double' or 'float', "
                         f"got {shuffle_dtype!r}")
    assigned_on_the_fly = assigned is None
    if assigned is None:
        assigned = ivf_assign(df, centroids, id_col, vector_col,
                              c_id_col, c_vector_col)
    mass = None
    if probe_mass is not None:
        census_src = assigned
        if assigned_on_the_fly:
            # census-only pass: same assign kernel WITHOUT carrying
            # vectors through Arrow — the census needs only `cell`
            # (guide §4.2; r12 optimization round); the member side
            # keeps its own lazy vector-carrying assign
            census_src = _nearest_cells(df, centroids, 1, id_col,
                                        vector_col, c_id_col,
                                        c_vector_col, keep_vector=False)
        counts = {r["cell"]: r["count"] for r in
                  census_src.groupBy("cell").count().collect()}
        mass = (counts, probe_mass)
    probes = _nearest_cells(queries if queries is not None else df,
                            centroids, nprobe, id_col, vector_col,
                            c_id_col, c_vector_col, keep_vector=True,
                            mass=mass)
    if "cell_rank" in probes.columns:
        probes = probes.drop("cell_rank")
    _vt = "array<float>" if shuffle_dtype == "float" else None
    _cast = (lambda c: c.cast(_vt)) if _vt else (lambda c: c)
    qp = probes.select(F.col(id_col).alias("q_id"),
                       _cast(F.col(vector_col)).alias("_qv"), "cell")
    bp = assigned.select(F.col(id_col).alias("id"),
                         _cast(F.col(vector_col)).alias("_bv"), "cell")
    if queries is not None:
        # bipartite case (incremental fold, external query set):
        # members in cells NO query probes cannot score — semi-join
        # the member side down to the probed-cell list before it
        # ships.  The list is |queries|·nprobe-bounded and skinny;
        # when queries ≪ |C| (the streaming micro-batch regime) this
        # cuts the dominant member-side exchange to the probed
        # fraction of the corpus.  Self-join (queries=None) probes
        # every occupied cell by construction — skipped there.
        # The batch-sized probe output is eagerly localCheckpoint-ed
        # first (r11 ADVICE / r12 opt round): the broadcast cell list
        # and the cogroup consume qp through two plan subtrees, so an
        # unmaterialized qp re-ran the Arrow probe kernel AND its
        # query-side upstream once per action; blocks free with the
        # plan (the dedup-family _ckpt discipline).
        qp = qp.localCheckpoint(eager=True)
        bp = bp.join(F.broadcast(qp.select("cell").distinct()),
                     "cell", "semi")
    w_rank = Window.partitionBy("q_id").orderBy("dist", "id")

    if method == "expr":
        cand = qp.join(bp, on="cell")
        if exclude_self:
            cand = cand.filter(F.col("id") != F.col("q_id"))
        scored = cand.withColumn("dist", l2q_expr("_qv", "_bv"))
    elif method == "gemm":
        id_t = df.schema[id_col].dataType.simpleString()
        scored = _gemm_cell_topk(qp, bp, k, exclude_self, id_t)
    else:
        raise ValueError(f"method must be 'gemm' or 'expr', got {method!r}")
    return (scored.withColumn("rank", F.row_number().over(w_rank))
            .filter(F.col("rank") <= k)
            .select("q_id", "id", "dist", "rank"))


def _gemm_cell_topk(qp: DataFrame, bp: DataFrame, k: int,
                    exclude_self: bool, id_t: str) -> DataFrame:
    """The cell-cogrouped BLAS scoring kernel shared by
    :func:`knn_join` (query side vs full member side) and
    :func:`knn_join_incremental` (affected old probes vs new members):
    per probed cell, each query's top-k members by element-quantized
    L2 → (q_id, id, dist).  ``qp`` = (q_id, _qv, cell), ``bp`` =
    (id, _bv, cell); per-cell top-k is sufficient for every caller
    because a global (dist, id) window re-ranks the union downstream
    and any member outside a query's per-cell top-k is dominated by k
    better members of the same cell that ARE emitted."""
    excl = bool(exclude_self)

    def cell_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0 or k <= 0:
            return pd.DataFrame({"q_id": [], "id": [], "dist": []})
        qids = left["q_id"].to_numpy()
        Q = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in left["_qv"].to_numpy()])
        ids = right["id"].to_numpy()
        B = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in right["_bv"].to_numpy()])
        order = np.argsort(ids, kind="stable")
        ids, B = ids[order], B[order]
        sqb = (B * B).sum(axis=1)
        kk = min(k + 8 + (1 if excl else 0), len(ids))
        oq, oi, od = [], [], []
        for lo in range(0, len(qids), 512):
            Qb, qb = Q[lo:lo + 512], qids[lo:lo + 512]
            # |q|² is row-constant: cannot move the per-row cut
            d2 = sqb[None, :] - 2.0 * (Qb @ B.T)
            if kk < len(ids):
                sel = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            else:
                sel = np.tile(np.arange(len(ids)), (len(Qb), 1))
            # exact shortlist recompute, element-quantized (_q9):
            # int64 sums are merge-order-free, so this matches the
            # expr path's l2q_expr fold AND the oracle's sequential
            # list_reduce bit-for-bit (an unquantized numpy pairwise
            # sum differs from both at ulp level)
            diff = Qb[:, None, :] - B[sel]
            ex = np.sqrt(_q9(np.square(diff)).sum(axis=2) / 1e9)
            for r in range(len(Qb)):
                cids, dr = ids[sel[r]], ex[r]
                if excl:
                    keep = cids != qb[r]
                    cids, dr = cids[keep], dr[keep]
                top = np.lexsort((cids, dr))[:k]
                oq.append(np.full(len(top), qb[r], dtype=qids.dtype))
                oi.append(cids[top])
                od.append(dr[top])
        return pd.DataFrame({"q_id": np.concatenate(oq),
                             "id": np.concatenate(oi),
                             "dist": np.concatenate(od)})

    return (qp.groupBy("cell").cogroup(bp.groupBy("cell"))
            .applyInPandas(cell_topk,
                           schema=f"q_id {id_t}, id {id_t}, "
                                  f"dist DOUBLE"))


def knn_join_incremental(old_graph: DataFrame, old_probes: DataFrame,
                         assigned: DataFrame, new_batch: DataFrame,
                         centroids: DataFrame, k: int = 10,
                         nprobe: int = 2,
                         id_col: str = "id", vector_col: str = "vector",
                         c_id_col: str = "id",
                         c_vector_col: str = "vector",
                         method: str = "gemm",
                         shuffle_dtype: str = "double") -> DataFrame:
    """Incremental kNN-graph maintenance: fold a new batch into an
    existing :func:`knn_join` graph WITHOUT rebuilding it — the
    ingest-time operation a continuously-growing corpus runs (the
    graph consumers — SemDeDup, label propagation, PageRank coresets
    — then always see a current graph).

    Inputs are the ingest-time materializations a production layout
    already keeps (cite: the reference's ingest path persists its
    bucket assignments the same way, `PartitionedIndexService`):

    * ``old_graph``  — (q_id, id, dist, rank): knn_join over the old
      corpus at the SAME (k, nprobe, centroids);
    * ``old_probes`` — (id, cell): the old rows' probe sets
      (:func:`_nearest_cells` with ``keep_vector=False``); may
      instead carry ``vector_col`` (``keep_vector=True``), which
      skips the per-fold corpus-sized id→vector join — persist it
      pre-partitioned by cell and the fold exchanges NO old vectors;
    * ``assigned``   — (id, vector, cell): :func:`ivf_assign` of the
      old corpus;
    * ``new_batch``  — (id, vector): ids disjoint from the old corpus.

    EXACT-EQUALITY contract (equality-tested): with the coarse
    quantizer FROZEN (the production regime — retraining centroids
    re-shuffles everything and is a rebuild by definition), the
    result is bit-identical to ``knn_join(old ∪ new)`` at the same
    knobs.  Why: probe sets are per-row functions of the frozen
    centroids, cell membership is append-only, and a full-rebuild
    top-k for an old row can only contain old members drawn from its
    EXISTING top-k (any old member outside it is dominated by k
    better old members that are still present) plus new members in
    its probed cells.  Fixed ``nprobe`` only: a mass budget's probe
    sets depend on the cell census, which the batch itself changes.

    Scale: the work is proportional to the BATCH, not the corpus —
    (1) new rows probe the union members (|new|·nprobe probe rows
    against probed cells only, the knn_join bipartite path);
    (2) old rows are re-examined only where it can matter: the
    probes landing in cells that RECEIVED new rows (a broadcast
    semi-join of the skinny probe table against the batch's cell
    list) score against the NEW members of those cells only —
    |affected probes| × |new cell members| pairs through the same
    cell-cogrouped BLAS kernel the rebuild uses, never old × old;
    (3) one (dist, id) window re-ranks the merged skinny edges.
    Nothing corpus-sized shuffles: the old graph moves once (n·k
    skinny rows), the member side of (1) is pruned to probed cells,
    and (2) touches only affected probe rows joined id→vector
    against the assigned table.
    """
    from ..functions.distance import l2q_expr
    spark = new_batch.sparkSession
    if shuffle_dtype not in ("double", "float"):
        raise ValueError(f"shuffle_dtype must be 'double' or 'float', "
                         f"got {shuffle_dtype!r}")
    # EXACT-EQUALITY with knn_join(old ∪ new) requires scoring the
    # update edges on the SAME dtype knn_join shuffles: float mode
    # casts both sides to array<float> before l2q_expr (advice r10).
    _vt = "array<float>" if shuffle_dtype == "float" else None
    _cast = (lambda c: c.cast(_vt)) if _vt else (lambda c: c)
    new_assigned = ivf_assign(new_batch, centroids, id_col, vector_col,
                              c_id_col, c_vector_col)
    union_assigned = assigned.select(id_col, vector_col, "cell") \
        .unionByName(new_assigned.select(id_col, vector_col, "cell"))
    # (1) new rows vs the union member side — the bipartite knn_join
    new_edges = knn_join(union_assigned.select(id_col, vector_col),
                         centroids, k=k, nprobe=nprobe, id_col=id_col,
                         vector_col=vector_col, c_id_col=c_id_col,
                         c_vector_col=c_vector_col,
                         assigned=union_assigned, method=method,
                         shuffle_dtype=shuffle_dtype,
                         queries=new_batch).select("q_id", "id", "dist")
    # (2) affected old probes vs NEW members of their probed cells.
    # The batch's touched-cell list is |batch|-bounded — broadcast it.
    # When the standing probe table CARRIES vectors (keep_vector=True
    # at build time — the continuously-ingesting deployment shape),
    # the corpus-sized id→vector join is skipped entirely: a probe
    # table persisted pre-partitioned by cell then feeds the cogroup
    # with NO per-fold exchange of old vectors at all (the
    # n-proportional residual the skinny layout pays).
    touched = new_assigned.select("cell").distinct()
    if vector_col in old_probes.columns:
        affected = (old_probes.join(F.broadcast(touched), "cell")
                    .select(F.col(id_col).alias("q_id"),
                            _cast(F.col(vector_col)).alias("_qv"),
                            "cell"))
    else:
        affected = (old_probes.join(F.broadcast(touched), "cell")
                    .select(F.col(id_col).alias("q_id"), "cell")
                    .join(assigned.select(
                        F.col(id_col).alias("q_id"),
                        _cast(F.col(vector_col)).alias("_qv")),
                        "q_id")
                    .select("q_id", "_qv", "cell"))
    new_members = new_assigned.select(F.col(id_col).alias("id"),
                                      _cast(F.col(vector_col)).alias("_bv"),
                                      "cell")
    if method == "gemm":
        # the same BLAS kernel knn_join scores with — the expr HOF
        # fold pays ~2 orders more per pair, and the affected×new
        # pair count is where the fold's wall actually lives (no
        # self-pairs possible: old and new ids are disjoint).  Dist
        # values are bit-identical (_q9 element quantization both
        # ways), so the EXACT-EQUALITY contract is dtype-independent.
        id_t = new_batch.schema[id_col].dataType.simpleString()
        upd = _gemm_cell_topk(affected, new_members, k, False, id_t)
    elif method == "expr":
        upd = (affected.join(new_members, "cell")
               .withColumn("dist", l2q_expr("_qv", "_bv"))
               .select("q_id", "id", "dist"))
    else:
        raise ValueError(f"method must be 'gemm' or 'expr', "
                         f"got {method!r}")
    # (3) merge + re-rank: unaffected rows pass through with their
    # old edges; affected rows and new rows rank over the union.
    # The merged frame's neighbour column is literally "id" (the
    # knn_join output schema) regardless of id_col (advice r10).
    # Measured note (r11, the §9j discipline): an affected-only
    # re-rank — anti/semi-splitting the old graph on the changed-q
    # set so untouched rows skip the window — LOST to this plain
    # union+window at every batch size on the 1M fixture (b=1k:
    # 12.5 s vs 8.7 s; b=100k: 45.3 vs 26.4): the two extra passes
    # over the n·k edge table cost more than the window they avoid.
    w_rank = Window.partitionBy("q_id").orderBy("dist", "id")
    return (old_graph.select("q_id", "id", "dist")
            .unionByName(upd).unionByName(new_edges)
            .withColumn("rank", F.row_number().over(w_rank))
            .filter(F.col("rank") <= k)
            .select("q_id", "id", "dist", "rank"))


def knn_join_decremental(old_graph: DataFrame, assigned: DataFrame,
                         deleted: DataFrame, centroids: DataFrame,
                         k: int = 10, nprobe: int = 2,
                         id_col: str = "id",
                         vector_col: str = "vector",
                         c_id_col: str = "id",
                         c_vector_col: str = "vector",
                         method: str = "gemm",
                         shuffle_dtype: str = "double") -> DataFrame:
    """Incremental kNN-graph DELETION: remove a set of rows from an
    existing :func:`knn_join` graph WITHOUT rebuilding it — the
    tombstone/GDPR-erasure twin of :func:`knn_join_incremental`
    (reference tombstone semantics: F3 / `mark_deleted`'s anti-join
    discipline, `index/metadata.py`).

    Inputs: ``old_graph`` (q_id, id, dist, rank) and ``assigned``
    (id, vector, cell) over the OLD corpus at the same frozen
    (k, nprobe, centroids); ``deleted`` — one column of ids to
    remove (need not all exist).

    EXACT-EQUALITY contract (equality-tested): the result is
    bit-identical to ``knn_join(old ∖ deleted)`` at the same knobs.
    Why: deletion only REMOVES candidates — a surviving query's
    top-k changes iff it currently holds a deleted neighbour (its
    other members all survive, and anything better would already be
    in it), and a changed query's new top-k is exactly the rebuild's
    top-k over the REMAINING members of its probed cells (probe sets
    are per-row functions of the frozen centroids, untouched by
    membership).  Fixed ``nprobe`` only, as with the insert fold.

    Scale: work is proportional to the DELETION'S BLAST RADIUS, not
    the corpus — (1) dropping deleted queries and finding affected
    queries are two semi/anti joins of the skinny n·k edge table
    against the broadcast-size deleted list; (2) only the affected
    queries (≤ in-degree of the deleted set, ≤ k·|deleted|) re-score,
    through the same bipartite :func:`knn_join` path the insert fold
    uses — their probed cells' members ship via the probed-cell
    semi-join, everything else passes through verbatim with its
    existing rank.
    """
    del_ids = deleted.select(F.col(deleted.columns[0]).alias(id_col)) \
        .distinct()
    surv = old_graph.join(
        del_ids.select(F.col(id_col).alias("q_id")), "q_id", "anti")
    aff_q = (surv.join(del_ids.select(F.col(id_col).alias("id")),
                       "id", "semi")
             .select("q_id").distinct())
    clean = (surv.join(aff_q, "q_id", "anti")
             .select("q_id", "id", "dist", "rank"))
    assigned2 = assigned.join(del_ids, id_col, "anti")
    aff_vec = (aff_q.select(F.col("q_id").alias(id_col))
               .join(assigned.select(id_col, vector_col), id_col))
    rescored = knn_join(assigned2.select(id_col, vector_col),
                        centroids, k=k, nprobe=nprobe, id_col=id_col,
                        vector_col=vector_col, c_id_col=c_id_col,
                        c_vector_col=c_vector_col,
                        assigned=assigned2, method=method,
                        shuffle_dtype=shuffle_dtype, queries=aff_vec)
    return clean.unionByName(rescored)


def knn_graph_fold(graph: DataFrame, probes: DataFrame,
                   assigned: DataFrame, new_batch: DataFrame,
                   centroids: DataFrame, k: int = 10, nprobe: int = 2,
                   id_col: str = "id", vector_col: str = "vector",
                   c_id_col: str = "id", c_vector_col: str = "vector",
                   method: str = "gemm",
                   shuffle_dtype: str = "double",
                   materialize: str = "local",
                   deletes: DataFrame | None = None
                   ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One ingest-time fold of a micro-batch into the persisted
    kNN-graph state triple — the ``foreachBatch`` body of a
    continuously-maintained corpus graph (verdict r10 Next #4).

    State = (graph, probes, assigned), exactly
    :func:`knn_join_incremental`'s inputs; this helper advances all
    three so the NEXT batch can fold against them:

    * graph'    = ``knn_join_incremental(...)`` — ≡ the full rebuild
      over (corpus ∪ batch) by the exact-equality contract;
    * probes'   = probes ∪ the batch rows' probe sets;
    * assigned' = assigned ∪ ``ivf_assign(batch)``.

    ``materialize="local"`` (default) eagerly ``localCheckpoint``\\ s
    each advanced table: lineage would otherwise grow by one fold per
    batch and re-execute every prior fold on each action — the same
    truncation discipline the staged :func:`knn_join_sq8` path uses
    (in production, write the state to a table/Delta instead);
    ``"reliable"`` uses the fault-tolerant ``checkpoint`` directory
    (the cluster mode — see :func:`ops.dedup._ckpt`).
    ``materialize="none"`` returns lazy plans (single-fold callers,
    tests).  Per-batch cost is |batch|-proportional end to end: the
    three appended deltas are batch-sized, and the incremental graph
    update never scores old × old (see
    :func:`knn_join_incremental`'s scale note).

    ``deletes`` (optional, one id column) makes the fold an UPSERT:
    tombstoned rows are removed FIRST via
    :func:`knn_join_decremental` (blast-radius-bounded) and dropped
    from the probe/assign state, then ``new_batch`` folds in — so
    fold(deletes=D, batch=B) ≡ ``knn_join((corpus ∖ D) ∪ B)`` by the
    composition of the two exact-equality contracts.  ``new_batch``
    ids must be disjoint from the SURVIVING corpus; re-using a
    just-deleted id (an in-place update) is therefore valid.
    """
    if materialize not in ("local", "reliable", "none"):
        raise ValueError(f"materialize must be 'local', 'reliable' "
                         f"or 'none', got {materialize!r}")
    from .dedup import _ckpt
    keep = ((lambda d: d) if materialize == "none"
            else (lambda d: _ckpt(d, materialize)))
    if deletes is not None:
        del_ids = deletes.select(
            F.col(deletes.columns[0]).alias(id_col)).distinct()
        graph = knn_join_decremental(graph, assigned, del_ids,
                                     centroids, k=k, nprobe=nprobe,
                                     id_col=id_col,
                                     vector_col=vector_col,
                                     c_id_col=c_id_col,
                                     c_vector_col=c_vector_col,
                                     method=method,
                                     shuffle_dtype=shuffle_dtype)
        probes = probes.join(del_ids, id_col, "anti")
        assigned = assigned.join(del_ids, id_col, "anti")
    g2 = knn_join_incremental(graph, probes, assigned, new_batch,
                              centroids, k=k, nprobe=nprobe,
                              id_col=id_col, vector_col=vector_col,
                              c_id_col=c_id_col,
                              c_vector_col=c_vector_col,
                              method=method,
                              shuffle_dtype=shuffle_dtype)
    # advance the probe table in the SAME layout it arrived in (r11
    # ADVICE): a vector-carrying probe table (keep_vector=True — the
    # layout that lets the NEXT fold's update stage skip the
    # corpus-sized id→vector join) stays vector-carrying across folds
    # instead of silently degrading to the skinny layout after fold 1.
    keep_vec = vector_col in probes.columns
    new_probes = _nearest_cells(new_batch, centroids, nprobe, id_col,
                                vector_col, c_id_col, c_vector_col,
                                keep_vector=keep_vec)
    if "cell_rank" in new_probes.columns:
        new_probes = new_probes.drop("cell_rank")
    p_cols = [id_col, vector_col, "cell"] if keep_vec else [id_col, "cell"]
    p2 = probes.select(*p_cols).unionByName(new_probes.select(*p_cols))
    a2 = assigned.select(id_col, vector_col, "cell").unionByName(
        ivf_assign(new_batch, centroids, id_col, vector_col,
                   c_id_col, c_vector_col)
        .select(id_col, vector_col, "cell"))
    return keep(g2), keep(p2), keep(a2)


def knn_join_sq8(df: DataFrame, centroids: DataFrame,
                 mins: list, maxs: list, k: int = 10, nprobe: int = 2,
                 rerank: int = 2,
                 id_col: str = "id", vector_col: str = "vector",
                 c_id_col: str = "id", c_vector_col: str = "vector",
                 assigned: DataFrame | None = None,
                 exclude_self: bool = True,
                 shuffle_dtype: str = "double",
                 probe_groups: int = 1,
                 checkpoint_mode: str = "local",
                 probe_mass: int | None = None,
                 probe_table: str = "flat") -> DataFrame:
    """kNN self-join with SQ8 PROBE CODES — the high-nprobe scale
    variant of :func:`knn_join` (verdict r07 Next #2's "ascending
    ambition" option): the probe side ships each row's scalar-quantized
    codes as ONE BINARY of dim bytes instead of 8·dim float64 (8×) or
    4·dim float32 (4×), which is what bounds the n·nprobe probe-side
    cogroup exchange — the §9g single-box ceiling (f32 fit nprobe 12
    at 80% of the filesystem; codes fit nprobe ~50 in the same
    budget).

    Three stages, each mirrored EXACTLY by the generated oracle:

    1. per probed cell, rank (reconstructed-query × true-member) pairs
       by the ELEMENT-QUANTIZED approximate distance
       ``ad2 = Σ _q9((q̃_i - b_i)²)`` and keep the per-(prober, cell)
       top-k by (ad2, id) — a GEMM float pre-cut with +8 margin picks
       the candidates, the quantized recompute orders them, so the
       kept SET matches a sequential SQL evaluation bit-for-bit
       (same discipline as :func:`knn_join`'s gemm kernel);
    2. one global window keeps each prober's top-``k·rerank`` by
       (ad2, id) — the SQ8 shortlist;
    3. exact re-rank: the shortlist joins TRUE vectors on both sides
       (two exchanges of n·k·rerank skinny rows — never the corpus
       by more than its one pass) and the final top-k ranks by the
       exact quantized distance (``l2q_expr``), ties by id.

    Approximation contract: a true neighbour is lost only if SQ8
    reconstruction error demotes it below rank k IN ITS OWN CELL
    (stage 1) or below rank k·rerank globally (stage 2) — SQ8 is
    near-lossless at these ranks (§9e addendum 2/3), and ``rerank``
    widens the escape hatch.  Results are NOT bit-identical to
    :func:`knn_join`; they are identical whenever SQ8 ranking agrees
    with exact ranking down to rank k·rerank, which the equality test
    pins on the clustered fixture.

    ``shuffle_dtype="float"`` additionally ships the MEMBER side as
    float32 (lossless on f32-representable sources, like knn_join).

    ``probe_groups=g`` stages stage 1+2 over g cell partitions
    (``cell % g``) with IDENTICAL output: top-m over a union equals
    top-m over the union of per-part top-m, so each group's per-cell
    top-k feeds a per-prober top-``k·rerank`` WITHIN the group, the
    g skinny partials (n·k·rerank rows each) are materialized via
    eager ``localCheckpoint``, and one final window merges them.
    What this bounds is the NEXT footprint after SQ8 probe codes: at
    nprobe 16 × 10M the stage-1→2 window exchange is n·nprobe·k ≈
    1.6e9 rows, which overflowed the measured single box (§9g
    addendum 3) — staging divides that live shuffle by g at the cost
    of re-running the map-side probe kernel per group (no extra
    exchange; dereferenced group shuffles are reclaimed by the 1-min
    periodic-GC cleaner the session always sets).  On a cluster the
    same knob caps per-stage shuffle capacity instead of /tmp.
    Default 1 = single-pass, byte-identical plan to round 8's entry.

    ``checkpoint_mode`` picks how group partials materialize (the
    dedup family's ``_ckpt`` contract): ``"local"`` localCheckpoints
    into executor storage — fine at test scale, but the
    MEMORY_AND_DISK deserialized blocks of an n·k·rerank partial are
    heap-resident while they build (measured: heap OOM at 10M×g4 in
    a 96 GB driver); ``"reliable"`` checkpoints SERIALIZED to the
    configured checkpoint dir — zero heap residency, and with
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` +
    ``spark.checkpoint.compress=true`` superseded partials are
    deleted/compact.  Use "reliable" for corpus-scale staged runs.

    ``probe_mass`` switches to per-row ADAPTIVE mass-budget probing —
    identical rule and rationale as :func:`knn_join`'s ``probe_mass``
    (cells in ascending element-quantized distance order while the
    cumulative member count of closer cells is below the budget;
    ``nprobe`` is then ignored).  This is the knob that bounds the
    per-cell cogroup under cell-size skew at high coverage — the p22
    tail flattener (SCALE.md §9g): a prober whose neighbourhood is
    dense stops after one big cell instead of dragging nprobe
    fixed-count cells through stage 1.
    """
    from ..functions.distance import l2q_expr
    spark = df.sparkSession
    assigned_on_the_fly = assigned is None
    if assigned is None:
        assigned = ivf_assign(df, centroids, id_col, vector_col,
                              c_id_col, c_vector_col)
    mass = None
    if probe_mass is not None:
        census_src = assigned
        if assigned_on_the_fly:
            # census-only pass: same assign kernel WITHOUT carrying
            # vectors through Arrow — the census needs only `cell`
            # (guide §4.2; r12 optimization round); the member side
            # keeps its own lazy vector-carrying assign
            census_src = _nearest_cells(df, centroids, 1, id_col,
                                        vector_col, c_id_col,
                                        c_vector_col, keep_vector=False)
        counts = {r["cell"]: r["count"] for r in
                  census_src.groupBy("cell").count().collect()}
        mass = (counts, probe_mass)
    def make_qp():
        p = _nearest_cells(df, centroids, nprobe, id_col, vector_col,
                           c_id_col, c_vector_col, keep_vector=True,
                           sq8=(mins, maxs), mass=mass)
        if "cell_rank" in p.columns:
            p = p.drop("cell_rank")
        return p.select(F.col(id_col).alias("q_id"), "qcodes", "cell")

    _vt = "array<float>" if shuffle_dtype == "float" else None
    _cast = (lambda c: c.cast(_vt)) if _vt else (lambda c: c)
    bp = assigned.select(F.col(id_col).alias("id"),
                         _cast(F.col(vector_col)).alias("_bv"), "cell")
    mn8 = np.asarray(mins, dtype=np.float64)
    rg8 = np.asarray(maxs, dtype=np.float64) - mn8
    bcq = spark.sparkContext.broadcast((mn8, rg8, k, bool(exclude_self)))

    def cell_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        mn_, rg_, k_, excl = bcq.value
        if len(left) == 0 or len(right) == 0 or k_ <= 0:
            return pd.DataFrame({"q_id": [], "id": [], "ad2": []})
        qids = left["q_id"].to_numpy()
        Qc = np.vstack([np.frombuffer(b, dtype=np.uint8)
                        for b in left["qcodes"].to_numpy()]
                       ).astype(np.float64)
        # reconstruction: mn + c/255*rg — elementwise-IEEE identical to
        # the oracle's recon CTE (same operand order)
        Qr = mn_ + Qc / 255.0 * rg_
        ids = right["id"].to_numpy()
        B = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in right["_bv"].to_numpy()])
        order = np.argsort(ids, kind="stable")
        ids, B = ids[order], B[order]
        sqb = (B * B).sum(axis=1)
        kk = min(k_ + 8 + (1 if excl else 0), len(ids))
        oq, oi, od = [], [], []
        for lo in range(0, len(qids), 512):
            Qb, qb = Qr[lo:lo + 512], qids[lo:lo + 512]
            d2 = sqb[None, :] - 2.0 * (Qb @ B.T)
            if kk < len(ids):
                sel = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            else:
                sel = np.tile(np.arange(len(ids)), (len(Qb), 1))
            # quantized recompute of the GEMM-selected candidates: the
            # kept set + its ad2 values then match the oracle exactly
            diff = Qb[:, None, :] - B[sel]
            ad = _q9(np.square(diff)).sum(axis=2)
            for r in range(len(Qb)):
                cids, ar = ids[sel[r]], ad[r]
                if excl:
                    keep = cids != qb[r]
                    cids, ar = cids[keep], ar[keep]
                top = np.lexsort((cids, ar))[:k_]
                oq.append(np.full(len(top), qb[r], dtype=qids.dtype))
                oi.append(cids[top])
                od.append(ar[top])
        return pd.DataFrame({"q_id": np.concatenate(oq),
                             "id": np.concatenate(oi),
                             "ad2": np.concatenate(od)})

    id_t = df.schema[id_col].dataType.simpleString()
    sch = f"q_id {id_t}, id {id_t}, ad2 LONG"
    kk = k * rerank
    w_ap = Window.partitionBy("q_id").orderBy("ad2", "id")
    if probe_groups <= 1:
        scored = (make_qp().groupBy("cell").cogroup(bp.groupBy("cell"))
                  .applyInPandas(cell_topk, schema=sch))
        short = (scored.withColumn("_ar", F.row_number().over(w_ap))
                 .filter(F.col("_ar") <= kk).select("q_id", "id"))
    else:
        from pyspark import StorageLevel
        from .dedup import _ckpt
        # Staged probe table.  All three layouts were built and
        # measured back-to-back at 10M × p16/g4 (SCALE.md §9j):
        #   flat persist (one row per probe, DISK_ONLY)   1847.7 s
        #   packed persist (one row per prober + explode) 2036.1 s
        #   per-group kernel recompute (cell_mod fusion)  2872.4 s
        # so "flat" — the r8 plan — stays the default: disk reads of
        # the redundant table are cheaper than either the per-group
        # selection sweep or the per-group array explode + HOF filter.
        # "packed" (probe_table="packed") trades ~10% wall for a ~6×
        # smaller persisted footprint (~2.6 GB vs ~16 GB at p16) —
        # the scratch-constrained-box option.
        if probe_table == "packed":
            pk = _nearest_cells(df, centroids, nprobe, id_col,
                                vector_col, c_id_col, c_vector_col,
                                keep_vector=True, sq8=(mins, maxs),
                                mass=mass, packed=True)
            pk = (pk.select(F.col(id_col).alias("q_id"), "qcodes",
                            "cells")
                  .persist(StorageLevel.DISK_ONLY))
        elif probe_table == "flat":
            pk = make_qp().persist(StorageLevel.DISK_ONLY)
        else:
            raise ValueError(f"probe_table must be 'flat' or 'packed', "
                             f"got {probe_table!r}")
        running = None
        for gi in range(probe_groups):
            in_g = F.pmod(F.col("cell"), F.lit(probe_groups)) == gi
            if probe_table == "packed":
                qp_g = pk.select(
                    "q_id", "qcodes",
                    F.explode(F.filter(
                        # pmod, not %: SQL '%' keeps the sign of the
                        # dividend, so negative cell ids would match no
                        # group and drop candidates vs the flat path
                        "cells",
                        lambda c: F.pmod(c, F.lit(probe_groups))
                        == F.lit(gi)))
                    .alias("cell"))
            else:
                qp_g = pk.filter(in_g)
            sg = (qp_g.groupBy("cell")
                  .cogroup(bp.filter(in_g).groupBy("cell"))
                  .applyInPandas(cell_topk, schema=sch))
            # per-prober top-kk WITHIN the group, eagerly materialized:
            # the group's big shuffle is dereferenced (and reclaimed by
            # the periodic-GC cleaner) before the next group runs
            part = _ckpt(sg.withColumn("_ar", F.row_number().over(w_ap))
                         .filter(F.col("_ar") <= kk)
                         .select("q_id", "id", "ad2"),
                         checkpoint_mode)
            if running is None:
                running = part
            else:
                # incremental merge: fold into a running top-kk so the
                # LIVE state is always ≤ 2 skinny n·kk checkpoints plus
                # one n·2kk merge window — never g partials at once
                running = _ckpt(running.unionByName(part)
                                .withColumn("_ar", F.row_number().over(w_ap))
                                .filter(F.col("_ar") <= kk)
                                .select("q_id", "id", "ad2"),
                                checkpoint_mode)
        pk.unpersist()       # stages 1-2 ran eagerly; stage 3 only
        short = running.select("q_id", "id")  # reads the checkpoints
    # stage 3: exact re-rank.  The shortlist rows carry a TRUE vector
    # through the q_id join exchange — the one unavoidable vector-per-
    # pair movement.  Two footprint levers, both value-preserving:
    # shuffle_dtype="float" ships those vectors as array<float>
    # (lossless on f32-representable sources, f32→f64 promotion is
    # exact inside l2q_expr), and probe_groups>1 stages the re-rank by
    # q_id % g — every query's shortlist is COMPLETE within its chunk,
    # so per-chunk top-k rows are final and just union (no merge
    # window), dividing the live vector-carrying exchange by g.
    qv = df.select(F.col(id_col).alias("q_id"),
                   _cast(F.col(vector_col)).alias("_qv"))
    bv = df.select(F.col(id_col).alias("id"),
                   _cast(F.col(vector_col)).alias("_bv"))
    w_rank = Window.partitionBy("q_id").orderBy("dist", "id")

    def _rerank(sub_short, sub_qv):
        return (sub_short.join(bv, on="id").join(sub_qv, on="q_id")
                .withColumn("dist", l2q_expr("_qv", "_bv"))
                .withColumn("rank", F.row_number().over(w_rank))
                .filter(F.col("rank") <= k)
                .select("q_id", "id", "dist", "rank"))

    if probe_groups <= 1:
        return _rerank(short, qv)
    from .dedup import _ckpt
    out = None
    for gi in range(probe_groups):
        in_g = F.pmod(F.col("q_id"), F.lit(probe_groups)) == gi
        res_g = _ckpt(_rerank(short.filter(in_g), qv.filter(in_g)),
                      checkpoint_mode)
        out = res_g if out is None else out.unionByName(res_g)
    return out


def _key_bucket_pairs(df: DataFrame, index, threshold: float,
                      id_col: str, vector_col: str,
                      max_bucket: int | None) -> DataFrame:
    """Exact-code-key near-dup pairs, scored per bucket.

    Plan: codes ⋈ vectors (one vector per bucket MEMBER — O(n·T·D)
    rows, the only data-sized shuffle), hash-repartition on the bucket
    key + sort within partitions, then ONE mapInPandas kernel per
    partition walks the bucket boundaries and computes each bucket's
    in-bucket cosine matrix (normalized GEMM), emitting ONLY pairs
    >= threshold.  One kernel per PARTITION instead of a per-group
    applyInPandas (r12): thousands of small buckets otherwise each pay
    the per-group Arrow/pandas dispatch, which dominated the stage at
    bench scale; the per-bucket math (ids ascending, (m, dim) GEMM) is
    unchanged, so rows are bit-identical to the per-group spelling.
    A pair found in several buckets emits identical rows (same float
    math), collapsed by the final distinct.  Rounding is HALF_UP at 6
    dp like the exact path, so results are oracle-comparable."""
    sized = index.codes.groupBy("table", "division", "code_key").count()
    if max_bucket is not None:
        sized = sized.filter(F.col("count") <= max_bucket)
    members = (index.codes.join(sized.select("table", "division", "code_key"),
                                on=["table", "division", "code_key"])
               .select("table", "division", "code_key", "id")
               .join(df.select(F.col(id_col).alias("id"),
                               F.col(vector_col).alias("_v")), on="id"))
    # one mapInPandas over key-sorted partitions instead of a per-group
    # applyInPandas (r12 optimization round): thousands of small
    # buckets each paid the per-group Arrow/pandas dispatch, which
    # dominated the stage at bench scale.  The hash repartition on the
    # bucket key is the same exchange the groupBy paid; each bucket is
    # still scored as ONE (m, dim) GEMM over ids ascending, so the
    # emitted rows are bit-identical to the per-group spelling.
    nparts = df.sparkSession.sparkContext.defaultParallelism
    members = (members.repartition(nparts, "table", "division", "code_key")
               .sortWithinPartitions("table", "division", "code_key", "id"))

    def score_bucket(ids: np.ndarray, B: np.ndarray):
        m = len(ids)
        if m < 2:
            return None
        Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-30)
        S = Bn @ Bn.T
        iu, ju = np.triu_indices(m, k=1)
        s = S[iu, ju]
        keep = s >= threshold
        if not keep.any():
            return None
        s = s[keep]
        rounded = np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6
        return pd.DataFrame({"id_a": ids[iu[keep]], "id_b": ids[ju[keep]],
                             "cosine": rounded})

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tail = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if tail is not None:
                pdf = pd.concat([tail, pdf], ignore_index=True)
                tail = None
            t = pdf["table"].to_numpy()
            d = pdf["division"].to_numpy()
            ck = pdf["code_key"].to_numpy()
            change = np.flatnonzero((t[1:] != t[:-1]) | (d[1:] != d[:-1])
                                    | (ck[1:] != ck[:-1])) + 1
            bounds = np.concatenate(([0], change, [len(pdf)]))
            ids_all = pdf["id"].to_numpy()
            V_all = np.vstack([np.asarray(v, dtype=np.float64)
                               for v in pdf["_v"].to_numpy()])
            frames = []
            # hold the LAST bucket back — it may continue in the next
            # Arrow batch of this partition
            for i in range(len(bounds) - 2):
                lo, hi = bounds[i], bounds[i + 1]
                out = score_bucket(ids_all[lo:hi], V_all[lo:hi])
                if out is not None:
                    frames.append(out)
            tail = pdf.iloc[bounds[-2]:].reset_index(drop=True)
            if frames:
                yield pd.concat(frames, ignore_index=True)
        if tail is not None and len(tail):
            ids_t = tail["id"].to_numpy()
            V_t = np.vstack([np.asarray(v, dtype=np.float64)
                             for v in tail["_v"].to_numpy()])
            out = score_bucket(ids_t, V_t)
            if out is not None:
                yield out

    return (members.mapInPandas(
                run, schema="id_a BIGINT, id_b BIGINT, cosine DOUBLE")
            .distinct())


def embedding_near_dups(df: DataFrame, threshold: float = 0.95,
                        id_col: str = "id", vector_col: str = "vector",
                        index=None,
                        kernel_partitions: int | None = None,
                        max_exact_rows: int = 1_000_000,
                        bucket: str = "block",
                        max_bucket: int | None = 4096) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold, id_a < id_b.

    Scale path: when an ``AnnIndex`` is supplied, only pairs co-located
    in at least one LSH bucket are scored (bucketed candidate join — the
    all-pairs crossJoin never materializes).  ``bucket`` picks the
    blocking key:

    * ``"key"`` — pairs sharing an EXACT code key in any (table,
      division).  The recall-robust mode for high thresholds: a
      near-identical pair gets identical keys with probability ~1
      regardless of how many other vectors share them.  Scoring runs
      INSIDE a per-bucket Arrow kernel (vectors shuffle once per
      bucket member, never per pair — the sum-of-bucket² candidate
      set is compute, not a materialized DataFrame; at 1M embeddings
      the pair-join formulation spilled ~160 GB where this shape
      shuffles ~1 GB).  ``max_bucket`` (default 4096) is the df-cap
      analog (see ``jaccard_pairs``): buckets bigger than the cap are
      code-degenerate dense modes — scoring them all-pairs is
      O(bucket²) for pairs a coarse code can no longer discriminate —
      and are skipped, with the same documented recall trade as every
      frequency cap in the dedup family.
    * ``"block"`` (default, the registry/oracle semantics) — pairs
      co-located in a greedy partition block.  Volume is bounded by
      blocks·block_size² by construction, but when an equal-key run
      outgrows one block the run is CUT and pairs straddling the cut
      are missed — recall degrades as duplicate clusters outgrow
      ``block_size`` (the measured §9b limiter).  Prefer ``"key"``
      for dedup; "block" remains for volume-bounded screening.

    Without an index: exact all-pairs via broadcast — SMALL TABLES
    ONLY: the exact path collects the full (id, vector) matrix to the
    driver and broadcasts it, so it refuses inputs above
    ``max_exact_rows`` (default 1M ≈ 512 MB at dim=64 float64) with a
    pointer to the index path rather than driver-OOMing.

    The candidate id-pairs are round-robined over ``kernel_partitions``
    (default: cluster default parallelism) before the vector joins: a
    pair is 16 bytes of shuffle input but a dim-length cosine fold of
    compute, so AQE's byte-based coalescing under-parallelizes the
    scoring stage (one task at bench scale; 2.6 s → 1.3 s on 32 cores —
    same pathology as the Levenshtein kernel in ``edit_near_dups``)."""
    if bucket not in ("block", "key"):
        raise ValueError(f"bucket must be 'block' or 'key', got {bucket!r}")
    if index is not None:
        if kernel_partitions is None:
            kernel_partitions = df.sparkSession.sparkContext.defaultParallelism
        if bucket == "key":
            return _key_bucket_pairs(df, index, threshold, id_col,
                                     vector_col, max_bucket)
        bucket_col = "part_idx"
        codes = index.codes.select("table", "division", bucket_col,
                                   F.col("id").alias("_cid"))
        a = codes.select("table", "division", bucket_col,
                         F.col("_cid").alias("id_a"))
        b = codes.select("table", "division", bucket_col,
                         F.col("_cid").alias("id_b"))
        pairs = (a.join(b, on=["table", "division", bucket_col])
                 .filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b").distinct()
                 .repartition(kernel_partitions))
        va = df.select(F.col(id_col).alias("id_a"), F.col(vector_col).alias("_va"))
        vb = df.select(F.col(id_col).alias("id_b"), F.col(vector_col).alias("_vb"))
        scored = (pairs.join(va, "id_a").join(vb, "id_b")
                  .withColumn("cosine", cosine_expr("_va", "_vb")))
        return (scored.filter(F.col("cosine") >= threshold)
                .select("id_a", "id_b", F.round("cosine", 6).alias("cosine")))

    # exact path: blocked matmul — each partition scores its rows against
    # the broadcast normalized matrix (vectorized; the 2M-pair crossJoin
    # with per-pair fold expressions is ~40x slower at sf0.1)
    spark = df.sparkSession
    n_rows = df.count()
    if n_rows > max_exact_rows:
        raise ValueError(
            f"embedding_near_dups exact mode collects the whole table to "
            f"the driver: input has {n_rows} rows > max_exact_rows="
            f"{max_exact_rows}. Pass index=AnnIndex.build(df, cfg) to use "
            f"the LSH-bucketed scale path (or raise max_exact_rows if the "
            f"driver really has the memory).")
    rows = df.select(id_col, vector_col).collect()
    ids_all = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([list(r[1]) for r in rows], dtype=np.float64)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    bc = spark.sparkContext.broadcast((ids_all, Mn, float(threshold)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_, Mn_, thr = bc.value
        pos = {int(i): p for p, i in enumerate(ids_)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf[vector_col].to_numpy()])
            Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-30)
            bids = pdf[id_col].to_numpy().astype(np.int64)
            sims = Bn @ Mn_.T                       # (block, all)
            mask = (sims >= thr) & (bids[:, None] < ids_[None, :])
            bi, aj = np.nonzero(mask)
            if len(bi):
                s = sims[bi, aj]
                # HALF_UP like F.round / DuckDB round (np.round is
                # half-to-even and can disagree on exact midpoints)
                rounded = np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6
                yield pd.DataFrame({"id_a": bids[bi], "id_b": ids_[aj],
                                    "cosine": rounded})

    return df.select(id_col, vector_col).mapInPandas(
        run, schema="id_a BIGINT, id_b BIGINT, cosine DOUBLE")


def semantic_dedup(df: DataFrame, centroids: DataFrame,
                   threshold: float = 0.95,
                   id_col: str = "id", vector_col: str = "vector") -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the corpus with a coarse k-means quantizer,
    then score pairwise cosine ONLY within each cluster → (cell, id_a,
    id_b, cosine) for pairs with cosine >= ``threshold``.  The canonical
    SemDeDup keep/drop rule (drop id_b of every surviving pair) is one
    ``select id_b distinct`` over this output.

    Pass ``centroids`` from :func:`kmeans_fit` (computed once at ingest,
    like the IVF quantizer) — fitting is not repeated per call.

    Scale shape: assignment is strictly map-side against the broadcast
    centroid matrix (:func:`_nearest_cells` — no crossJoin); the pair
    join is an equi-join on the cell id, so each task scores one
    cluster's block and the corpus-wide all-pairs product never
    materializes.  With k sized so clusters are ~|corpus|/k documents,
    work is O(n²/k) spread over k independent tasks — the published
    SemDeDup recipe's exact cost model."""
    # quantize: the assign chains into the oracle-compared pair set, so
    # a float near-tie must not flip between engines (ADVICE r07)
    assigned = _nearest_cells(df, centroids, 1, id_col, vector_col,
                              "cell", "vector", keep_vector=True,
                              quantize=True)
    a = assigned.select("cell", F.col(id_col).alias("id_a"),
                        F.col(vector_col).alias("_va"))
    b = assigned.select("cell", F.col(id_col).alias("id_b"),
                        F.col(vector_col).alias("_vb"))
    pairs = (a.join(b, on="cell")
             .filter(F.col("id_a") < F.col("id_b"))
             .withColumn("cosine", cosine_expr("_va", "_vb"))
             .filter(F.col("cosine") >= threshold))
    return pairs.select("cell", "id_a", "id_b",
                        F.round("cosine", 6).alias("cosine"))


def sq8_topk(base: DataFrame, queries: DataFrame, mins: list, maxs: list,
             k: int = 10, rerank: int = 4,
             id_col: str = "id", vector_col: str = "vector",
             q_id_col: str = "q_id", q_vector_col: str = "vector",
             codes: DataFrame | None = None) -> DataFrame:
    """Compressed-refine ANN: rank candidates on SQ8 codes (4–8× less
    data scanned than float vectors), then exact re-rank only the top
    ``k*rerank`` with the true vectors → (q_id, id, dist, rank ≤ k).

    This is the memory path the SQ8 codebook exists for: the approx
    stage is an Arrow-batched numpy kernel over the codes column with a
    per-batch partial top-k (shuffle carries O(Q·k·rerank·n_batches)
    rows, like :func:`cosine_topk`), and the exact stage joins true
    vectors for only Q·k·rerank ids.  Reconstruction is elementwise
    IEEE double (mn + c/255·rg), identical in numpy and SQL, so the
    two-stage result is oracle-checkable; the ``rerank`` margin absorbs
    approx-boundary ties.

    STANDALONE mode (as called here, over the full ``codes`` table) is
    deliberately the brute-force twin: every query scans every code —
    O(N·Q) approx ranking at 1/4 the bytes of the float scan.  It is
    the exhaustive-compressed baseline, not the scale path.  The scale
    path is ``AnnIndex.with_sq8()`` + ``search_batch(sq8_rerank=...)``
    (``query/ann.py``), which runs this same kernel over only the
    LSH-capped candidate pool of each query."""
    from ..functions.distance import l2_expr
    spark = base.sparkSession
    if codes is None:
        codes = sq8_quantize(base, mins, maxs, id_col=id_col,
                             vector_col=vector_col).select("id", "codes")
    q_rows = rows_cached(queries, q_id_col, q_vector_col)
    if not q_rows:
        return spark.createDataFrame(
            [], f"q_id BIGINT, id BIGINT, dist DOUBLE, rank INT")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    mn = np.array(mins, dtype=np.float64)
    rg = np.array(maxs, dtype=np.float64) - mn
    kk = k * rerank
    bc = spark.sparkContext.broadcast((q_ids, Q, mn, rg, kk))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_, Q_, mn_, rg_, kk_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.vstack([np.asarray(c, dtype=np.float64)
                           for c in pdf["codes"].to_numpy()])
            R = mn_ + C / 255.0 * rg_              # reconstruction
            ids = pdf["id"].to_numpy()
            n = len(ids)
            take = min(kk_, n)
            frames = []
            for qi in range(len(q_ids_)):
                # element-quantized int64 sum: order-exact in any
                # engine (SCALE.md pathology #3 addendum — the duckdb
                # parallel-agg flip); mirrored in SQL_SQ8_ANN's ad CTE
                d2 = _q9(np.square(R - Q_[qi])).sum(axis=1)
                if take < n:
                    # tie-inclusive cut first (duplicated vectors yield
                    # equal codes AND equal distances, so an arbitrary
                    # boundary subset would make the shortlist depend on
                    # batch partitioning) ...
                    kth = np.partition(d2, take - 1)[take - 1]
                    part = np.flatnonzero(d2 <= kth)
                    if len(part) > take:
                        # ... then bound the plateau: exactly the batch
                        # top-take under the global (d2, id) order — a
                        # code-degenerate cluster would otherwise ship
                        # its whole membership to the shortlist window
                        # (the BQ 10M pathology)
                        order = np.lexsort((ids[part], d2[part]))[:take]
                        part = part[order]
                else:
                    part = np.arange(n)
                frames.append(pd.DataFrame({
                    "q_id": np.full(len(part), q_ids_[qi], dtype=np.int64),
                    "id": ids[part], "d2": d2[part]}))
            yield pd.concat(frames, ignore_index=True)

    id_type = codes.schema["id"].dataType.simpleString()
    partial = codes.mapInPandas(
        run, schema=f"q_id BIGINT, id {id_type}, d2 DOUBLE")
    w_approx = Window.partitionBy("q_id").orderBy(F.col("d2").asc(),
                                                  F.col("id").asc())
    shortlist = (partial.withColumn("_ar", F.row_number().over(w_approx))
                 .filter(F.col("_ar") <= kk).select("q_id", "id"))

    qv = queries.select(F.col(q_id_col).alias("q_id"),
                        F.col(q_vector_col).alias("_qv"))
    bv = base.select(F.col(id_col).alias("id"),
                     F.col(vector_col).alias("_bv"))
    w_exact = Window.partitionBy("q_id").orderBy(F.col("dist").asc(),
                                                 F.col("id").asc())
    # the shortlist is Q*k*rerank-bounded by construction: broadcast
    # it so the exact re-rank NEVER shuffles the base vector table
    # (unhinted, a >10MB shortlist silently flipped this join to
    # sort-merge over the full base — measured 5x at 10M)
    return (shortlist.hint("broadcast").join(bv, on="id")
            .join(F.broadcast(qv), on="q_id")
            .withColumn("dist", l2_expr("_qv", "_bv"))
            .withColumn("rank", F.row_number().over(w_exact))
            .filter(F.col("rank") <= k)
            .select("q_id", "id", "dist", "rank"))


def sq8_stats(df: DataFrame, vector_col: str = "vector") -> tuple[list, list]:
    """Per-dimension (mins, maxs) over the table — the SQ8 codebook.
    One tiny aggregate job (posexplode → groupBy pos → min/max); the
    result is 2×dim doubles, broadcast as literals into the encode plan."""
    stats = (df.select(F.posexplode(vector_col).alias("pos", "x"))
             .groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
             .orderBy("pos").collect())
    return [r.mn for r in stats], [r.mx for r in stats]


def sq8_quantize(df: DataFrame, mins: list, maxs: list,
                 id_col: str = "id", vector_col: str = "vector") -> DataFrame:
    """Scalar 8-bit quantization: code_i = round((x_i - mn_i)/rg_i * 255).

    Output (id, codes ARRAY<INT>, mse DOUBLE): the uint8 codes (4x-8x
    memory reduction for ANN payloads; at scale the codes column replaces
    the float vectors in the refine stage, with exact re-rank only for
    the final top-k) and the per-vector reconstruction MSE.

    Entirely map-side native expressions — the codebook rides in the plan
    as literal arrays, so quantizing 10^9 vectors is one scan with no
    shuffle and no Python."""
    dim = len(mins)
    rngs = [mx - mn for mn, mx in zip(mins, maxs)]
    # zip_with evaluates its input arrays ONCE per row; an element_at(expr)
    # inside a transform lambda would instead re-evaluate the whole array
    # expression per element (O(dim^2) per row — measured 20x slower)
    out = (df.withColumn("_mn", F.array(*[F.lit(float(v)) for v in mins]))
           .withColumn("_rg", F.array(*[F.lit(float(v)) for v in rngs])))
    shifted = F.zip_with(F.col(vector_col), F.col("_mn"), lambda x, m: x - m)
    codes = F.zip_with(
        shifted, F.col("_rg"),
        lambda s, g: F.when(g > 0, F.round(s / g * 255))
        .otherwise(F.lit(0)).cast("int"))
    residual = F.zip_with(
        shifted, F.col("_rg"),
        lambda s, g: F.when(g > 0, s - F.round(s / g * 255) / 255.0 * g)
        .otherwise(s))
    mse = (F.aggregate(F.transform(residual, lambda e: e * e),
                       F.lit(0.0), lambda acc, x: acc + x) / dim)
    return (out.withColumn("codes", codes).withColumn("mse", mse)
            .select(F.col(id_col).alias("id"), "codes", "mse"))


def bq_thresholds(mins: list, maxs: list) -> list:
    """Per-dimension binary-quantization thresholds: the midrange
    (mn+mx)/2 of each dimension.  Midrange (unlike the mean) is exactly
    reproducible across engines — min/max are order-independent, so the
    same corpus yields bit-identical thresholds in Spark, numpy, and
    SQL, which keeps the whole BQ pipeline oracle-checkable without any
    quantized-boundary tricks."""
    return [(mn + mx) / 2.0 for mn, mx in zip(mins, maxs)]


_POPCOUNT16 = None


def _popcount64(a: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array (numpy<2 has no
    ``bitwise_count``): 16-bit table lookup over the raw words."""
    global _POPCOUNT16
    if _POPCOUNT16 is None:
        _POPCOUNT16 = np.array([bin(i).count("1") for i in range(1 << 16)],
                               dtype=np.uint8)
    v = np.ascontiguousarray(a).view(np.uint16)
    return _POPCOUNT16[v].reshape(*a.shape, 4).sum(axis=-1, dtype=np.int64)


def bq_encode(df: DataFrame, thresholds: list,
              id_col: str = "id", vector_col: str = "vector",
              keep: tuple = ()) -> DataFrame:
    """1-bit binary quantization: bit_j = (x_j > thr_j), packed MSB-first
    into 64-dim words → (id, words ARRAY<BIGINT>).  32× smaller than the
    float32 column — the cheapest ANN payload compression tier (below
    SQ8's 4× and PQ's 16-64×), and the only one whose approximate
    distance is pure integer ops (XOR + popcount).

    Entirely map-side native expressions (the thresholds ride in the
    plan as a literal array) — encoding 10^9 vectors is one scan, no
    shuffle, no Python, same as :func:`sq8_quantize`.

    ``keep`` names extra input columns to carry through unchanged
    (e.g. the vector itself, for the fused encode+assign scan in
    :func:`_ivf_bq_partial`)."""
    dim = len(thresholds)
    thr = F.array(*[F.lit(float(t)) for t in thresholds])
    out = df.withColumn(
        "_bits", F.zip_with(F.col(vector_col), thr,
                            lambda x, t: (x > t).cast("long")))
    words = [
        F.aggregate(F.slice("_bits", w + 1, min(64, dim - w)),
                    F.lit(0).cast("long"),
                    lambda acc, b: F.shiftleft(acc, 1).bitwiseOR(b))
        for w in range(0, dim, 64)]
    return out.select(F.col(id_col).alias("id"),
                      F.array(*words).alias("words"),
                      *[F.col(c) for c in keep])


def _bq_encode_cells(base: DataFrame, thresholds: list,
                     centroids: DataFrame,
                     id_col: str = "id", vector_col: str = "vector",
                     c_id_col: str = "id",
                     c_vector_col: str = "vector") -> DataFrame:
    """Fused (id, words, cell) corpus table: the JVM-native BQ word
    packing of :func:`bq_encode` chained into the Arrow coarse-assign
    kernel (:func:`_assign_cells_float`, the exact `ivf_assign`
    semantics — lowest-cid ties) in ONE corpus scan, no join.

    The adaptive (``probe_mass``) BQ paths eagerly localCheckpoint this
    table so the cell census and the Hamming kernel both read the same
    materialized skinny blocks — one corpus pass per call where the
    census-only `ivf_assign` pass previously made it two (r12
    optimization round, guide §1.2/§2.4).  The words column is 32×
    smaller than the float vectors, so the materialization is cheap by
    construction."""
    spark = base.sparkSession
    enc = bq_encode(base, thresholds, id_col=id_col,
                    vector_col=vector_col, keep=(vector_col,))
    c_rows = rows_cached(centroids, c_id_col, c_vector_col)
    cid = np.array([r[0] for r in c_rows], dtype=np.int64)
    C = np.array([list(r[1]) for r in c_rows], dtype=np.float64)
    o = np.argsort(cid, kind="stable")
    bc = spark.sparkContext.broadcast((cid[o], C[o]))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cid_, C_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf[vector_col].to_numpy()])
            yield pd.DataFrame({
                "id": pdf["id"].to_numpy(),
                "words": pdf["words"].to_numpy(),
                "cell": _assign_cells_float(V, cid_, C_)})

    id_t = enc.schema["id"].dataType.simpleString()
    return enc.mapInPandas(
        run, schema=f"id {id_t}, words ARRAY<BIGINT>, cell BIGINT")


def bq_topk(base: DataFrame, queries: DataFrame, thresholds: list,
            k: int = 10, rerank: int = 8,
            id_col: str = "id", vector_col: str = "vector",
            q_id_col: str = "q_id", q_vector_col: str = "vector",
            codes: DataFrame | None = None) -> DataFrame:
    """Binary-quantization compressed-refine ANN: approximate rank by
    Hamming distance over packed sign bits (XOR + popcount, 32× less
    scanned data than the float column), then exact re-rank of the top
    ``k*rerank`` with true vectors → (q_id, id, dist, rank ≤ k).

    Same two-stage gated shape as :func:`sq8_topk`: the approx stage is
    an Arrow kernel over the words column with a per-batch tie-inclusive
    partial top-k (Hamming is integer-valued, so ties are common — the
    cut keeps every row at the kth value, and the deterministic global
    order is (hamming, id)); the exact stage joins true vectors for only
    Q·k·rerank ids.  1-bit codes are the coarsest tier, so ``rerank``
    defaults higher (8) than SQ8's 4.

    STANDALONE mode scans every code per query — the exhaustive
    compressed baseline.  At scale, compose with LSH/IVF routing the
    same way SQ8 composes via ``AnnIndex.with_sq8``."""
    from ..functions.distance import l2_expr
    spark = base.sparkSession
    if codes is None:
        codes = bq_encode(base, thresholds, id_col=id_col,
                          vector_col=vector_col)
    q_rows = rows_cached(queries, q_id_col, q_vector_col)
    if not q_rows:
        return spark.createDataFrame(
            [], "q_id BIGINT, id BIGINT, dist DOUBLE, rank INT")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    qwords = _pack_query_words(Q, thresholds)
    kk = k * rerank
    bc = spark.sparkContext.broadcast((q_ids, qwords, kk))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_, qw_, kk_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            W = np.vstack([np.asarray(ws, dtype=np.int64)
                           for ws in pdf["words"].to_numpy()]).view(np.uint64)
            ids = pdf["id"].to_numpy()
            n = len(ids)
            take = min(kk_, n)
            # Hamming is integer-valued with massive tie plateaus
            # (every member of a code-degenerate cluster shares one
            # value), so a tie-INCLUSIVE cut can keep ~whole clusters
            # per batch (measured: 10× blowup at 10M as rerank grows).
            # Instead select EXACTLY the batch top-take by the global
            # order (ham, id) via one packed-int argpartition — still
            # partition-invariant (a global top-kk row is a batch
            # top-kk row under the same total order), flat in rerank.
            ids_i = np.asarray(ids)
            packable = (np.issubdtype(ids_i.dtype, np.integer)
                        and n and ids_i.min() >= 0
                        and ids_i.max() < (1 << 48))
            frames = []
            for qi in range(len(q_ids_)):
                ham = _popcount64(W ^ qw_[qi]).sum(axis=1)
                if take < n:
                    if packable:
                        key = (ham << np.int64(48)) | ids_i.astype(np.int64)
                        part = np.argpartition(key, take - 1)[:take]
                    else:
                        kth = np.partition(ham, take - 1)[take - 1]
                        part = np.flatnonzero(ham <= kth)
                else:
                    part = np.arange(n)
                frames.append(pd.DataFrame({
                    "q_id": np.full(len(part), q_ids_[qi], dtype=np.int64),
                    "id": ids[part], "ham": ham[part]}))
            yield pd.concat(frames, ignore_index=True)

    id_type = codes.schema["id"].dataType.simpleString()
    partial = codes.mapInPandas(
        run, schema=f"q_id BIGINT, id {id_type}, ham BIGINT")
    w_approx = Window.partitionBy("q_id").orderBy(F.col("ham").asc(),
                                                  F.col("id").asc())
    shortlist = (partial.withColumn("_ar", F.row_number().over(w_approx))
                 .filter(F.col("_ar") <= kk).select("q_id", "id"))

    qv = queries.select(F.col(q_id_col).alias("q_id"),
                        F.col(q_vector_col).alias("_qv"))
    bv = base.select(F.col(id_col).alias("id"),
                     F.col(vector_col).alias("_bv"))
    w_exact = Window.partitionBy("q_id").orderBy(F.col("dist").asc(),
                                                 F.col("id").asc())
    # the shortlist is Q*k*rerank-bounded by construction: broadcast
    # it so the exact re-rank NEVER shuffles the base vector table
    # (unhinted, a >10MB shortlist silently flipped this join to
    # sort-merge over the full base — measured 5x at 10M)
    return (shortlist.hint("broadcast").join(bv, on="id")
            .join(F.broadcast(qv), on="q_id")
            .withColumn("dist", l2_expr("_qv", "_bv"))
            .withColumn("rank", F.row_number().over(w_exact))
            .filter(F.col("rank") <= k)
            .select("q_id", "id", "dist", "rank"))


def _pack_query_words(Q: np.ndarray, thresholds: list) -> np.ndarray:
    """Binary-quantize query vectors into packed MSB-first uint64 words
    (the driver-side mirror of :func:`bq_encode`'s native expression)."""
    thr = np.array(thresholds, dtype=np.float64)
    dim = len(thresholds)
    n_words = (dim + 63) // 64
    qbits = (Q > thr)
    qwords = np.zeros((len(Q), n_words), dtype=np.uint64)
    for w in range(n_words):
        chunk = qbits[:, 64 * w:64 * (w + 1)]
        for j in range(chunk.shape[1]):                # MSB-first
            qwords[:, w] = ((qwords[:, w] << np.uint64(1))
                            | chunk[:, j].astype(np.uint64))
    return qwords


def ivf_bq_topk(base: DataFrame, queries: DataFrame, centroids: DataFrame,
                thresholds: list, k: int = 10, nprobe: int = 2,
                rerank: int = 8,
                id_col: str = "id", vector_col: str = "vector",
                q_id_col: str = "q_id", q_vector_col: str = "vector",
                c_id_col: str = "id", c_vector_col: str = "vector",
                assigned: DataFrame | None = None,
                codes: DataFrame | None = None,
                probe_mass: int | None = None) -> DataFrame:
    """IVF-BQ composition: the coarse quantizer prunes each query to
    ``nprobe`` cells, Hamming distance over packed sign bits ranks ONLY
    rows in probed cells (XOR + popcount, 32× less scanned data), exact
    re-rank of the top ``k·rerank`` with true vectors.

    This is the composition :func:`bq_topk`'s docstring prescribes and
    SCALE.md §9e's 10M measurement demands: standalone BQ recall
    collapses once a code-degenerate cluster outgrows the shortlist
    (0.51 at rerank 256 over 156k-vector clusters), because 1-bit codes
    cannot rank WITHIN a cluster.  Routing first means Hamming only has
    to separate the ~nprobe·(n/|C|) probed rows, and the shortlist
    budget is spent inside the right cells — recall is restored at a
    fraction of the scan (measured: SCALE.md §9e addendum).  At 100 TB
    the two prunings compose multiplicatively exactly as IVF-PQ's
    (`ivfpq_topk`), with BQ's 32× cheaper codes and integer-only
    approximate stage as the trade against ADC's finer ranking.

    Pass ``assigned`` / ``codes`` to reuse ingest-time materializations
    (both computed once per corpus, never per query).  ``probe_mass``
    switches to per-query ADAPTIVE probing (see
    :func:`ivf_bq_sq8_topk` / :func:`_adaptive_probe_cells`)."""
    kk = k * rerank
    probe_cells = None
    if probe_mass is not None:
        # one-corpus-pass census + probes (r12 optimization round):
        # the fused (id, words, cell) encode+assign table is
        # checkpointed and reused by the census AND the Hamming
        # kernel — see _bq_adaptive_setup
        assigned, codes, probe_cells = _bq_adaptive_setup(
            base, queries, centroids, thresholds, probe_mass,
            assigned, codes, id_col, vector_col,
            q_id_col, q_vector_col, c_id_col, c_vector_col)
    partial = _ivf_bq_partial(base, queries, centroids, thresholds, kk,
                              nprobe, id_col, vector_col, q_id_col,
                              q_vector_col, c_id_col, c_vector_col,
                              assigned, codes, probe_cells)
    if partial is None:
        return base.sparkSession.createDataFrame(
            [], "q_id BIGINT, id BIGINT, dist DOUBLE, rank INT")
    partial = partial.select("q_id", "id",
                             F.col("ham").cast("double").alias("d2"))
    from .pq import _exact_rerank
    return _exact_rerank(partial, base, queries, k, kk,
                         id_col, vector_col, q_id_col, q_vector_col)


def _adaptive_probe_cells(queries: DataFrame, centroids: DataFrame,
                          counts: dict, probe_mass: int,
                          q_id_col: str = "q_id",
                          q_vector_col: str = "vector",
                          c_id_col: str = "id",
                          c_vector_col: str = "vector") -> dict:
    """Per-query ADAPTIVE probe lists (verdict r07 Next #4 — the
    O6-retry idea applied to IVF): cells in ascending quantized-L2
    order from the query, included while the cumulative member count
    of the cells BEFORE them is < ``probe_mass``.  Every query thus
    scans ≥ ``probe_mass`` candidate rows: a query in a dense region
    covers its neighbourhood with few cells, a query whose natural
    cluster is shattered across many small kmeans cells automatically
    probes deeper — fixed ``nprobe`` gives the first kind wasted work
    and the second kind a routing ceiling (SCALE.md §9e addendum 2:
    p16 sat AT the 0.41 ceiling because 16 probes cover 16/39ths of a
    shattered cluster regardless of need).

    Distances are ELEMENT-QUANTIZED (``_q9``) and ordered (dd, cid),
    so the probe SET is reproducible in any engine — the oracle's
    cumulative-sum window over the same ordering picks identical
    cells.  Driver-side by design: queries are a collected batch by
    the family's contract, |C| is bounded (the coarse codebook), and
    the output is the same per-query cell-list structure the fixed
    path broadcasts."""
    q_rows = rows_cached(queries, q_id_col, q_vector_col)
    c_rows = rows_cached(centroids, c_id_col, c_vector_col)
    cid = np.array([r[0] for r in c_rows], dtype=np.int64)
    C = np.array([list(r[1]) for r in c_rows], dtype=np.float64)
    o0 = np.argsort(cid, kind="stable")
    cid, C = cid[o0], C[o0]
    cnt = np.array([counts.get(int(c), 0) for c in cid], dtype=np.int64)
    out: dict[int, np.ndarray] = {}
    for r in q_rows:
        q = np.asarray(list(r[1]), dtype=np.float64)
        dd = _q9(np.square(C - q)).sum(axis=1)
        o = np.lexsort((cid, dd))          # (dd, cid) ascending
        prior = np.concatenate(([0], np.cumsum(cnt[o])[:-1]))
        out[int(r[0])] = np.sort(cid[o[prior < probe_mass]])
    return out


def _bq_adaptive_setup(base: DataFrame, queries: DataFrame,
                       centroids: DataFrame, thresholds: list,
                       probe_mass: int, assigned: DataFrame | None,
                       codes: DataFrame | None,
                       id_col: str, vector_col: str,
                       q_id_col: str, q_vector_col: str,
                       c_id_col: str, c_vector_col: str) -> tuple:
    """Cell census + per-query adaptive probe sets for the IVF-BQ
    family, scanning the corpus ONCE (r12 optimization round): with
    neither ``assigned`` nor ``codes`` supplied, the fused
    (id, words, cell) encode+assign table (:func:`_bq_encode_cells`)
    is eagerly checkpointed and serves as BOTH the census source and
    the Hamming-kernel input — the census-only `ivf_assign` corpus
    pass this path previously paid is gone.  A supplied persisted
    ``assigned`` keeps the cheap cached census exactly as before.
    Returns ``(assigned, codes, probe_cells)``."""
    if assigned is None and codes is None:
        codes = _bq_encode_cells(base, thresholds, centroids, id_col,
                                 vector_col, c_id_col, c_vector_col)
        codes = codes.localCheckpoint(eager=True)
        census_src = codes
    elif assigned is None:
        # codes supplied without cells: BOTH consumers (census collect
        # + cell join) need only (id, cell), so one skinny assign pass
        # (keep_vector=False — no vectors through Arrow, guide §4.2)
        # is checkpointed and shared; payload is ~16 bytes/row
        assigned = _nearest_cells(base, centroids, 1, id_col,
                                  vector_col, c_id_col, c_vector_col,
                                  keep_vector=False)
        assigned = assigned.localCheckpoint(eager=True)
        census_src = assigned
    else:
        census_src = assigned
    counts = {r["cell"]: r["count"] for r in
              census_src.groupBy("cell").count().collect()}
    probe_cells = _adaptive_probe_cells(
        queries, centroids, counts, probe_mass,
        q_id_col, q_vector_col, c_id_col, c_vector_col)
    return assigned, codes, probe_cells


def _ivf_bq_partial(base: DataFrame, queries: DataFrame,
                    centroids: DataFrame, thresholds: list, kk: int,
                    nprobe: int, id_col: str, vector_col: str,
                    q_id_col: str, q_vector_col: str,
                    c_id_col: str, c_vector_col: str,
                    assigned: DataFrame | None,
                    codes: DataFrame | None,
                    probe_cells: dict | None = None) -> DataFrame | None:
    """IVF-routed BQ Hamming pre-screen shared by :func:`ivf_bq_topk`
    and :func:`ivf_bq_sq8_topk`: (q_id, id, ham) batch partials, at
    most ``kk`` rows per (query, batch), probed cells only.  ``None``
    when the query set is empty.  ``probe_cells`` (q_id → sorted cell
    array, e.g. from :func:`_adaptive_probe_cells`) overrides the
    fixed top-``nprobe`` probe selection.

    On-the-fly plan shape (r12 optimization round): when NEITHER
    ``assigned`` nor ``codes`` is supplied, the corpus scan is ONE
    fused pass — JVM-native BQ word packing feeding an Arrow kernel
    that derives each row's coarse cell inline
    (:func:`_assign_cells_float`, the exact `ivf_assign` semantics)
    and Hamming-scores probed cells.  This removes the separate assign
    kernel pass over the corpus AND the codes⋈assigned id-join the
    previous plan paid (guide §2.4/§4).  Fixed probe sets are computed
    DRIVER-SIDE on the already-collected query batch
    (:func:`_probe_cells_local` — the `_nc_batches` kernel body
    verbatim), removing one more Spark job per call.  Pass persisted
    ``assigned``/``codes`` to keep the ingest-reuse join path."""
    spark = base.sparkSession
    fused = assigned is None and codes is None
    c_rows = None
    if fused:
        codes = bq_encode(base, thresholds, id_col=id_col,
                          vector_col=vector_col, keep=(vector_col,))
        c_rows = rows_cached(centroids, c_id_col, c_vector_col)
        a_cid = np.array([r[0] for r in c_rows], dtype=np.int64)
        a_C = np.array([list(r[1]) for r in c_rows], dtype=np.float64)
        a_ord = np.argsort(a_cid, kind="stable")
        assign_state = (a_cid[a_ord], a_C[a_ord])
    elif codes is not None and "cell" in codes.columns:
        # pre-fused (id, words, cell) table — e.g. the probe_mass
        # path's checkpointed _bq_encode_cells output: no join needed
        assign_state = None
    else:
        if assigned is None:
            assigned = ivf_assign(base, centroids, id_col, vector_col,
                                  c_id_col, c_vector_col)
        if codes is None:
            codes = bq_encode(base, thresholds, id_col=id_col,
                              vector_col=vector_col)
        codes = codes.join(assigned.select(F.col(id_col).alias("id"),
                                           "cell"), on="id")
        assign_state = None
    q_rows = rows_cached(queries, q_id_col, q_vector_col)
    if not q_rows:
        return None
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    if probe_cells is None:
        if c_rows is None:
            c_rows = rows_cached(centroids, c_id_col, c_vector_col)
        probed = _probe_cells_local(q_rows, c_rows, nprobe)
        cell_lists = [probed.get(int(q), np.empty(0, dtype=np.int64))
                      for q in q_ids]
    else:
        cell_lists = [np.asarray(probe_cells.get(int(q), ()),
                                 dtype=np.int64) for q in q_ids]
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    qwords = _pack_query_words(Q, thresholds)
    bc = spark.sparkContext.broadcast((q_ids, qwords, kk, cell_lists,
                                       assign_state))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_, qw_, kk_, cells_, assign_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            W = np.vstack([np.asarray(ws, dtype=np.int64)
                           for ws in pdf["words"].to_numpy()]).view(np.uint64)
            ids = pdf["id"].to_numpy()
            if assign_ is not None:
                V = np.vstack([np.asarray(v, dtype=np.float64)
                               for v in pdf[vector_col].to_numpy()])
                row_cell = _assign_cells_float(V, assign_[0], assign_[1])
            else:
                row_cell = np.asarray(pdf["cell"].to_numpy(),
                                      dtype=np.int64)
            # one cell-sort per batch, then each query's probed rows are
            # searchsorted range gathers — O(kept) per query instead of
            # an O(rows) isin sweep per query (the difference between
            # nprobe/|C| and 1 of the batch touched per query)
            order = np.argsort(row_cell, kind="stable")
            sorted_cells = row_cell[order]
            ids_i = np.asarray(ids)
            packable = (np.issubdtype(ids_i.dtype, np.integer)
                        and len(ids_i) and ids_i.min() >= 0
                        and ids_i.max() < (1 << 48))
            frames = []
            for qi in range(len(q_ids_)):
                cs = cells_[qi]
                lo = np.searchsorted(sorted_cells, cs, side="left")
                hi = np.searchsorted(sorted_cells, cs, side="right")
                keep = (np.concatenate([order[a:b] for a, b in zip(lo, hi)])
                        if len(cs) else np.empty(0, dtype=np.int64))
                if len(keep) == 0:
                    continue
                ham = _popcount64(W[keep] ^ qw_[qi]).sum(axis=1)
                take = min(kk_, len(keep))
                if take < len(keep):
                    if packable:
                        # exact batch top-take by the global (ham, id)
                        # order — bounded under BQ's tie plateaus (see
                        # bq_topk)
                        key = ((ham << np.int64(48))
                               | ids_i[keep].astype(np.int64))
                        part = np.argpartition(key, take - 1)[:take]
                    else:
                        kth = np.partition(ham, take - 1)[take - 1]
                        part = np.flatnonzero(ham <= kth)
                else:
                    part = np.arange(len(keep))
                frames.append(pd.DataFrame({
                    "q_id": np.full(len(part), q_ids_[qi], dtype=np.int64),
                    "id": ids[keep][part], "ham": ham[part]}))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    id_type = codes.schema["id"].dataType.simpleString()
    in_cols = ["id", "words", vector_col if fused else "cell"]
    return (codes.select(*in_cols)
            .mapInPandas(run,
                         schema=f"q_id BIGINT, id {id_type}, ham BIGINT"))


def ivf_bq_sq8_topk(base: DataFrame, queries: DataFrame,
                    centroids: DataFrame, thresholds: list,
                    mins: list, maxs: list,
                    k: int = 10, nprobe: int = 2, bq_keep: int = 32,
                    rerank: int = 4,
                    id_col: str = "id", vector_col: str = "vector",
                    q_id_col: str = "q_id", q_vector_col: str = "vector",
                    c_id_col: str = "id", c_vector_col: str = "vector",
                    assigned: DataFrame | None = None,
                    codes: DataFrame | None = None,
                    sq8_codes: DataFrame | None = None,
                    probe_mass: int | None = None) -> DataFrame:
    """Three-tier compressed ANN: IVF probe → BQ Hamming pre-screen to
    ``k·bq_keep`` → SQ8 rank to ``k·rerank`` → exact re-rank → top-k.

    This is the missing tier SCALE.md §9e names: 1-bit codes cannot
    rank WITHIN a code-degenerate cluster (standalone-BQ recall caps
    ~0.31 at 10M geometry), so re-ranking straight from Hamming either
    wastes shortlist budget (small ``rerank``) or decrypt/IO budget
    (huge ``rerank``).  Putting SQ8 between them restores ranking
    power at 1/4 the bytes of the float column: the 32×-cheaper BQ
    scan cuts probed cells to a ``k·bq_keep`` shortlist, the 4×-cheaper
    SQ8 reconstruction orders THAT shortlist well enough that only
    ``k·rerank`` true vectors are ever touched.

    Scale shape: tier-1 is :func:`ivf_bq_topk`'s map-side kernel
    (probed cells only, batch partials bounded by ``k·bq_keep``);
    tier-2 joins the broadcast-hinted shortlist to the SQ8 code table
    (Q·k·bq_keep rows of 1-byte/dim codes — never the corpus) and
    ranks in one Arrow kernel against the broadcast query matrix;
    tier-3 is the shared :func:`~.pq._exact_rerank` broadcast tail.
    Nothing corpus-sized shuffles in any tier.

    SQ8 distances are the elementwise-IEEE reconstruction of
    :func:`sq8_topk`, so the whole three-tier result is
    oracle-checkable cross-engine.

    ``probe_mass`` switches probing from fixed top-``nprobe`` cells to
    PER-QUERY ADAPTIVE coverage (:func:`_adaptive_probe_cells`): cells
    in quantized-distance order until the cumulative member count of
    prior cells reaches the budget.  This is the §9e-addendum-2
    ceiling fix — at 10M the p16 point sat AT its routing ceiling
    because fixed probes cover a fixed fraction of a shattered
    cluster; a mass budget spends the same scanned-row total where
    each query needs it.  The probe set stays engine-reproducible
    (quantized distances + (dd, cid) order + a cumulative-sum rule the
    oracle mirrors with one window)."""
    kk1 = k * bq_keep
    probe_cells = None
    if probe_mass is not None:
        # one-corpus-pass census + probes (r12 optimization round):
        # see _bq_adaptive_setup / ivf_bq_topk
        assigned, codes, probe_cells = _bq_adaptive_setup(
            base, queries, centroids, thresholds, probe_mass,
            assigned, codes, id_col, vector_col,
            q_id_col, q_vector_col, c_id_col, c_vector_col)
    partial = _ivf_bq_partial(base, queries, centroids, thresholds, kk1,
                              nprobe, id_col, vector_col, q_id_col,
                              q_vector_col, c_id_col, c_vector_col,
                              assigned, codes, probe_cells)
    spark = base.sparkSession
    if partial is None:
        return spark.createDataFrame(
            [], "q_id BIGINT, id BIGINT, dist DOUBLE, rank INT")
    w_bq = Window.partitionBy("q_id").orderBy(F.col("ham").asc(),
                                              F.col("id").asc())
    short1 = (partial.withColumn("_ar", F.row_number().over(w_bq))
              .filter(F.col("_ar") <= kk1).select("q_id", "id"))

    if sq8_codes is None:
        sq8_codes = sq8_quantize(base, mins, maxs, id_col=id_col,
                                 vector_col=vector_col).select("id", "codes")
    q_rows = rows_cached(queries, q_id_col, q_vector_col)
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    mn = np.array(mins, dtype=np.float64)
    rg = np.array(maxs, dtype=np.float64) - mn
    qidx = {int(q): i for i, q in enumerate(q_ids)}
    bc = spark.sparkContext.broadcast((qidx, Q, mn, rg))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qidx_, Q_, mn_, rg_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.vstack([np.asarray(c, dtype=np.float64)
                           for c in pdf["codes"].to_numpy()])
            R = mn_ + C / 255.0 * rg_              # sq8_topk reconstruction
            rows = np.array([qidx_[int(q)] for q in pdf["q_id"].to_numpy()])
            # element-quantized like sq8_topk (mirrors the oracle's ad)
            d2 = _q9(np.square(R - Q_[rows])).sum(axis=1)
            yield pd.DataFrame({"q_id": pdf["q_id"].to_numpy(),
                                "id": pdf["id"].to_numpy(), "d2": d2})

    id_type = sq8_codes.schema["id"].dataType.simpleString()
    # shortlist is Q·k·bq_keep-bounded: broadcast it so tier-2 reads
    # the code table map-side (same discipline as _exact_rerank)
    pairs = short1.hint("broadcast").join(sq8_codes, on="id")
    partial2 = pairs.mapInPandas(
        score, schema=f"q_id BIGINT, id {id_type}, d2 DOUBLE")
    from .pq import _exact_rerank
    return _exact_rerank(partial2, base, queries, k, k * rerank,
                         id_col, vector_col, q_id_col, q_vector_col)


def embedding_dim_stats(emb: DataFrame, vector_col: str = "embedding",
                        round_to: int = 4) -> DataFrame:
    """Per-dimension distribution report over an embedding column —
    the embedding-QA scan a pipeline runs before indexing or training
    on vectors (collapsed dimensions show as ~zero stddev, scale bugs
    as outlier min/max, normalization drift as |mean| >> 0).

    Output: (dim, n, mean, stddev, mn, mx) — one row per dimension.

    Scale shape: posexplode fans each row out dim-fold, then ONE
    aggregate keyed on the dimension index with map-side combine — the
    shuffle carries (partitions x dim) partial rows, not corpus-sized
    data.  The same stats feed sq8 codebook fitting (mins/maxs).
    """
    from ..functions.plan import select_posexploded
    e = select_posexploded(emb.select(F.col(vector_col).alias("v")),
                           F.col("v"), "dim", "x")
    return (e.groupBy(F.col("dim").cast("int").alias("dim"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg(F.col("x").cast("double")), round_to)
                  .alias("mean"),
                 F.round(F.stddev_samp(F.col("x").cast("double")), round_to)
                  .alias("stddev"),
                 F.round(F.min(F.col("x").cast("double")), round_to)
                  .alias("mn"),
                 F.round(F.max(F.col("x").cast("double")), round_to)
                  .alias("mx")))


def jl_matrix(in_dim: int, out_dim: int, seed: int = 7) -> np.ndarray:
    """Deterministic Johnson-Lindenstrauss projection matrix
    (in_dim x out_dim): iid Gaussian entries from PCG64(seed), scaled
    by 1/sqrt(out_dim) so expected squared distances are preserved
    (Johnson & Lindenstrauss 1984; Achlioptas 2003 database-friendly
    framing).  The SAME matrix feeds the Spark kernel and the
    generated SQL oracle (inlined as literals), so the projection is
    engine-portable by construction."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((in_dim, out_dim)) / np.sqrt(out_dim)


def jl_project(df: DataFrame, out_dim: int = 8, seed: int = 7,
               id_col: str = "id", vector_col: str = "vector") -> DataFrame:
    """Random-projection dimensionality reduction (JL transform) —
    compress an embedding column ~dim/out_dim-fold while approximately
    preserving pairwise distances.  The 100 TB uses: cheap first-pass
    ANN / near-dup screening over a narrow projection (read out_dim
    floats per row instead of dim), and decorrelated low-dim sketches
    for drift monitoring.  Distortion is the JL bound, ~1/sqrt(out_dim)
    relative — a screening tier, with exact re-rank on true vectors as
    the refine tier (the repo-wide two-tier pattern).

    Map-only: ONE Arrow kernel per batch against the closure-shipped
    (in_dim x out_dim) matrix — zero exchanges at any scale.  Each
    output component is an ELEMENT-QUANTIZED int64 sum
    (Σ_i round(x_i·g_ij·1e9), the ``_q9`` treatment), so numpy's
    reduction order, Spark, and a DuckDB fold land on bit-identical
    values (SCALE.md pathology #3 discipline).

    Returns (id_col, vector_col) with the projected array<double>
    (components at 1e-9 resolution).
    """
    G = jl_matrix  # resolved below once dim is known, per batch group
    seed_ = seed
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Gm = None
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf[vector_col].to_numpy()])
            if Gm is None:
                Gm = G(X.shape[1], out_dim, seed_)
            # element-quantize each x_i*g_ij term, sum as int64 — one
            # output column at a time, so the working set is
            # O(batch × in_dim) per column, never the full
            # batch × in_dim × out_dim tensor (a 1024-d embedding at
            # a 10k-row Arrow batch would otherwise cube to ~5 GB)
            T = np.empty((len(X), out_dim), dtype=np.float64)
            for j in range(out_dim):
                T[:, j] = _q9(X * Gm[None, :, j]).sum(axis=1) / 1e9
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                vector_col: list(T)})

    return df.select(id_col, vector_col).mapInPandas(
        run, schema=f"{id_col} {id_t}, {vector_col} ARRAY<DOUBLE>")


def jl_topk(base: DataFrame, queries: DataFrame, k: int = 10,
            rerank: int = 4, out_dim: int = 8, seed: int = 7,
            id_col: str = "id", vector_col: str = "vector",
            q_id_col: str = "q_id") -> DataFrame:
    """Random-projection-screened ANN: rank approximately in JL space
    (``out_dim`` doubles per row scanned instead of dim — 8× less at
    64→8), then exact re-rank of the top ``k*rerank`` shortlist with
    true vectors — ``jl_project``'s screening tier instantiated as the
    repo-standard compressed-refine pattern (SQ8/BQ/PQ siblings).

    Where it fits among the tiers: SQ8 reads dim BYTES (8× under
    float64, near-lossless rank), BQ reads dim BITS (64×, recall-
    capped); JL reads ``out_dim`` DOUBLES with JL-bound distortion —
    the right screen when vectors are very wide (out_dim is fixed by
    the distortion target, so the ratio GROWS with dim, e.g. 1024→32
    is 32×) and no quantizer state (mins/maxs/codebook) may be
    maintained: the matrix is a pure function of (seed, dims).

    Determinism: projections are element-quantized int64 sums
    (``jl_project``), both ranking stages use ``l2q_expr``/(value, id)
    orderings — bit-identical across engines.

    Scale shape: the screen is a broadcast-query-matrix crossJoin over
    the PROJECTED table (the repo-sanctioned crossJoin class); the
    per-query shortlist window is a rank-filter (WindowGroupLimit:
    partial top-n before the exchange, so the shuffle carries
    ≤ partitions × Q × k·rerank skinny rows, never n×Q); the exact
    tail joins true vectors for Q·k·rerank ids only.
    """
    from ..functions.distance import l2q_expr
    if k <= 0 or rerank <= 0:
        raise ValueError("k and rerank must be positive")
    bp = (jl_project(base, out_dim=out_dim, seed=seed,
                     id_col=id_col, vector_col=vector_col)
          .select(id_col, F.col(vector_col).alias("_bp")))
    qp = (jl_project(queries, out_dim=out_dim, seed=seed,
                     id_col=q_id_col, vector_col=vector_col)
          .select(q_id_col, F.col(vector_col).alias("_qp")))
    w_short = Window.partitionBy(q_id_col).orderBy("ad", id_col)
    shortlist = (bp.crossJoin(F.broadcast(qp))
                 .withColumn("ad", l2q_expr("_bp", "_qp"))
                 .withColumn("_rn", F.row_number().over(w_short))
                 .filter(F.col("_rn") <= k * rerank)
                 .select(q_id_col, id_col))
    w_rank = Window.partitionBy(q_id_col).orderBy("dist", id_col)
    return (shortlist
            .join(base.select(id_col, F.col(vector_col).alias("_bv")),
                  id_col)
            .join(F.broadcast(queries.select(
                q_id_col, F.col(vector_col).alias("_qv"))), q_id_col)
            .withColumn("dist", l2q_expr("_qv", "_bv"))
            .withColumn("rank", F.row_number().over(w_rank))
            .filter(F.col("rank") <= k)
            .select(q_id_col, id_col, "dist", "rank"))


def semantic_decontaminate(base: DataFrame, bench: DataFrame,
                           threshold: float = 0.95,
                           id_col: str = "id", vector_col: str = "vector",
                           b_id_col: str = "id",
                           b_vector_col: str = "vector") -> DataFrame:
    """Embedding-level benchmark decontamination: flag every training
    vector whose cosine to ANY benchmark vector reaches ``threshold``
    → (id, bench_id, cosine) pairs.  The n-gram ``decontaminate``
    op catches verbatim leakage; this catches paraphrased/translated
    leakage the lexical check misses (the published eval-contamination
    recipe for embedding-indexed corpora).  The distinct ``id`` set of
    this output is the drop list.

    Scale shape: the benchmark set is small BY CONSTRUCTION (an eval
    suite, not a corpus) — it broadcasts as a dense matrix and the
    corpus side is ONE map-only blocked-matmul pass (same Arrow kernel
    family as :func:`cosine_topk`), emitting only above-threshold
    pairs.  Zero shuffles on the corpus side; at 100 TB this is a
    straight scan, embarrassingly parallel across executors.
    """
    import numpy as np
    import pandas as pd
    spark = base.sparkSession
    b_rows = rows_cached(bench, b_id_col, b_vector_col)
    out_schema = f"id BIGINT, bench_id BIGINT, cosine DOUBLE"
    if not b_rows:
        return spark.createDataFrame([], out_schema)
    b_ids = np.array([r[0] for r in b_rows], dtype=np.int64)
    B = np.array([list(r[1]) for r in b_rows], dtype=np.float64)
    Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-30)
    bc = spark.sparkContext.broadcast((b_ids, Bn, float(threshold)))

    def run(batches):
        b_ids_, Bn_, thr = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf[vector_col].to_numpy()])
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                                1e-30)
            ids = pdf[id_col].to_numpy()
            sims = Xn @ Bn_.T                       # (n, |bench|)
            ri, ci = np.nonzero(sims >= thr)
            if len(ri) == 0:
                continue
            yield pd.DataFrame({"id": ids[ri].astype(np.int64),
                                "bench_id": b_ids_[ci],
                                "cosine": sims[ri, ci]})

    pairs = base.select(id_col, vector_col).mapInPandas(run, schema=out_schema)
    return pairs.select("id", "bench_id", F.round("cosine", 6).alias("cosine"))
