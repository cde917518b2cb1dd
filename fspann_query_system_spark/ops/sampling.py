"""Corpus-assembly operators for training-data pipelines (beyond-
reference mandate): deterministic stratified sampling (data-mixing
ratios) and sequence packing (context-window assembly).

Both are engine-portable by construction — the sampling decision is a
pure hash of the row key and the packing is a deterministic prefix sum —
so train/test splits and pack layouts are exactly reproducible across
runs, engines, and cluster sizes (Bernoulli ``df.sample``/``sampleBy``
give none of these guarantees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SAMPLE_DENOM = 10_000


def sample_bucket(key, salt: str = "") -> "F.Column":
    """Deterministic per-row bucket in [0, SAMPLE_DENOM): first 15 md5
    hex chars of salt||key as a BIGINT, mod the denominator.  Pure
    function of the key → identical in ANSI SQL
    (``('0x' || substr(md5(..), 1, 15))::BIGINT % denom``)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
            % SAMPLE_DENOM)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "source",
                      key_col: str = "doc_id",
                      default_rate: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's
    rate — the data-mixing step of corpus assembly ("20% of web, all of
    books"), entirely map-side (no shuffle, no RNG state), stable under
    re-runs and appends: a row's fate depends only on (salt, key).
    ``salt`` derives independent samples (e.g. train vs holdout)."""
    expr = F.lit(int(round(default_rate * SAMPLE_DENOM)))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == stratum,
                      F.lit(int(round(rate * SAMPLE_DENOM)))).otherwise(expr)
    return df.filter(sample_bucket(F.col(key_col), salt) < expr)


def pack_sequences(df: DataFrame, size_col: str = "n_chars",
                   id_col: str = "doc_id", by: str = "source",
                   window: int = 2048) -> DataFrame:
    """Sequence packing: concatenate documents in deterministic
    (by, id) order and split at fixed ``window`` boundaries — the
    context-window assembly step of a pretraining pipeline (documents
    straddling a boundary are split, exactly like concat-and-chunk
    training data).  → one row per doc: (by, id, size, pack_id,
    pack_offset), where pack_id is the window the document STARTS in.

    Plan: one cumulative-sum window per ``by`` group.  A prefix sum is
    the same two-pass distributed-ranking problem the LSH partitioner
    solves (``lsh/partitioner.py:_global_rank``: per-slice partials +
    broadcast carry-ins); groups bigger than one task's comfort should
    route through that scheme — the native window here is the
    oracle-checkable spec."""
    w = Window.partitionBy(by).orderBy(id_col)
    cum = F.sum(size_col).over(w)
    off = (cum - F.col(size_col)).alias("pack_offset_global")
    return (df.select(F.col(by), F.col(id_col), F.col(size_col),
                      off)
            .withColumn("pack_id",
                        F.floor(F.col("pack_offset_global") / window))
            .withColumn("pack_offset",
                        F.col("pack_offset_global") % window)
            .drop("pack_offset_global"))


def shard_assign(df: DataFrame, n_shards: int,
                 id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic global shuffle + sharding: the training-order
    assembly step (shuffle the corpus, split into N loader shards,
    give every row a stable position).  → (id, shard, pos): shard =
    hash mod N, pos = the row's rank within its shard under the hashed
    order — a full deterministic permutation, reproducible across runs,
    engines, and cluster sizes (``df.repartition`` + file order gives
    none of that).

    ``salt`` derives independent epoch orders: a different salt is a
    fresh shuffle with zero state carried between epochs.

    Plan: the hash is map-side; ranking is one row_number window per
    shard.  Shards bigger than one task's comfort route the rank through
    the partitioner's two-pass scheme (``lsh/partitioner.py:
    _global_rank`` — per-slice partials + broadcast carry-ins); the
    native window here is the oracle-checkable spec, exactly as in
    :func:`pack_sequences`.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    hval = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    base = df.select(F.col(id_col), hval.alias("_h"))
    w = Window.partitionBy(F.pmod(F.col("_h"), F.lit(n_shards))) \
              .orderBy("_h", id_col)
    return (base.select(
        F.col(id_col),
        F.pmod(F.col("_h"), F.lit(n_shards)).alias("shard"),
        F.row_number().over(w).alias("pos")))


def chunk_docs(docs: DataFrame, chunk_size: int = 32, overlap: int = 8,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token-budget document chunking with overlap — the
    split-long-documents step of context-window assembly (RAG indexing
    and long-doc pretraining both run it): each document becomes
    ceil-strided windows of ``chunk_size`` tokens advancing by
    ``chunk_size - overlap``, the last chunk short if the tail is.

    n >  chunk_size: n_chunks = 1 + ceil((n - chunk_size) / stride)
    n <= chunk_size: n_chunks = 1           (the doc itself)

    Output: (doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_text)
    — every column a pure function of (doc, chunk_id), so the op takes
    a full cross-engine oracle.

    Scale shape: map-only — tokenize, build the start offsets
    array-side, one explode; no exchange at any size.  Fan-out is
    bounded by doc length / stride per row, never corpus-sized.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got "
                         f"{overlap=} {chunk_size=}")
    stride = chunk_size - overlap
    from ..functions import text as T
    from ..functions.plan import select_posexploded
    d = (docs.select(F.col(id_col).alias("doc_id"),
                     T.tokens(text_col).alias("toks"))
         .withColumn("n", F.size("toks"))
         .where(F.col("n") >= 1))
    # ceil((n - cs) / st) via integer math: (n - cs + st - 1) div st
    n_chunks = F.when(
        F.col("n") <= chunk_size, F.lit(1)
    ).otherwise(
        F.lit(1) + F.floor((F.col("n") - chunk_size + stride - 1)
                           / F.lit(stride)).cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            (i * stride).cast("int").alias("start_tok"),
            F.least(F.lit(chunk_size),
                    F.col("n") - i * stride).cast("int")
             .alias("n_chunk_tokens"),
            F.concat_ws(" ", F.slice("toks", i * stride + 1, chunk_size))
             .alias("chunk_text")))
    out = select_posexploded(d, chunks, "chunk_id", "c", "doc_id")
    return out.select("doc_id", F.col("chunk_id").cast("int").alias("chunk_id"),
                      F.col("c.start_tok"), F.col("c.n_chunk_tokens"),
                      F.col("c.chunk_text"))


def sample_to_budget(df: DataFrame, budgets: dict[str, int],
                     size_col: str = "n_tokens",
                     strata_col: str = "source",
                     key_col: str = "doc_id",
                     salt: str = "") -> DataFrame:
    """Token-budget mixture sampling: down-sample each stratum to a
    target size budget ("10B tokens of web, 2B of code") with a
    deterministic hash keep-decision — the two-pass form of corpus
    mixing where the RATE is derived from the data instead of given.

    Pass 1 aggregates per-stratum totals (tiny result, broadcast back);
    pass 2 keeps a row iff its hash bucket < floor(budget/total *
    DENOM) — so each stratum lands at ~its budget in expectation, with
    per-row fates stable under re-runs.  Strata under budget keep
    everything; strata missing from ``budgets`` are dropped (budget 0).

    Output: kept rows as (key, stratum, size, rate) where rate is the
    applied keep-fraction in [0, 1] — every column deterministic, so
    the op takes a full cross-engine oracle.
    """
    totals = df.groupBy(strata_col).agg(F.sum(size_col).alias("_total"))
    expr = F.lit(0)
    for stratum, budget in sorted(budgets.items()):
        expr = F.when(F.col(strata_col) == stratum,
                      F.lit(int(budget))).otherwise(expr)
    rated = (df.join(F.broadcast(totals), on=strata_col)
             .withColumn("_budget", expr)
             .withColumn(
                 "rate",
                 F.least(F.lit(1.0),
                         F.col("_budget") / F.col("_total").cast("double"))))
    kept = rated.filter(
        sample_bucket(F.col(key_col), salt)
        < F.floor(F.col("rate") * SAMPLE_DENOM).cast("long"))
    return kept.select(F.col(key_col), F.col(strata_col),
                       F.col(size_col), F.round("rate", 6).alias("rate"))


def reservoir_sample(df: DataFrame, n: int, by: str = "source",
                     key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic fixed-SIZE sample per group: the ``n`` rows with the
    smallest md5(salt||key) per ``by`` value — the reproducible stand-in
    for reservoir sampling ("5k eval docs per source") where
    :func:`stratified_sample` fixes a RATE instead.

    The hash order is a uniform random permutation of each group that is
    a pure function of (salt, key): re-runs, engine changes, and
    partition layout cannot move the sample, and appending rows only
    displaces hash-boundary rows (bounded churn — classic bottom-k
    sketch behavior).  Plan shape at scale: ONE hash-partitioned
    exchange on ``by``; Spark's WindowGroupLimit pushes the rank filter
    into a per-partition partial top-n before the shuffle, so a
    10^9-row group moves only ~n rows per input partition, never the
    group.  ``salt`` derives independent samples."""
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(by).orderBy(h.asc(), F.col(key_col).asc())
    return (df.withColumn("_rs_rn", F.row_number().over(w))
            .filter(F.col("_rs_rn") <= n).drop("_rs_rn"))


def temperature_mix(df: DataFrame, alpha: float = 0.3,
                    budget_frac: float = 0.5,
                    strata_col: str = "source",
                    key_col: str = "doc_id",
                    salt: str = "") -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-corpus recipe
    of XLM-R / mT5, their exponent alpha): target share of source s ∝
    n_s^alpha, so alpha=1 reproduces natural proportions and alpha→0
    flattens toward uniform — up-weighting tail sources (rate ∝
    n^(alpha−1)) without duplicating rows.

    rate_s = min(1, budget_frac · N · q_s / n_s) with
    q_s = n_s^alpha / Σ_t n_t^alpha; the keep-decision is the same
    deterministic md5 bucket as :func:`stratified_sample` (append-
    stable, salt-derivable).  Two tiny aggregates (per-stratum counts,
    then the 1-row normalizer broadcast back via crossJoin — the bm25
    corpus-stats shape); the data pass itself is map-side.

    Rates are rounded to 6dp BEFORE the bucket threshold so the pow()
    ulp disagreements between engines cannot move a row across the
    keep boundary.  Output: (key, stratum, rate).
    """
    totals = df.groupBy(strata_col).agg(
        F.count("*").cast("double").alias("_n"))
    z = totals.agg(
        F.sum(F.pow(F.col("_n"), F.lit(float(alpha)))).alias("_zn"),
        F.sum("_n").alias("_total"))
    rates = (totals.crossJoin(F.broadcast(z))
             .withColumn(
                 "rate",
                 F.least(F.lit(1.0), F.round(
                     F.lit(budget_frac) * F.col("_total")
                     * F.pow(F.col("_n"), F.lit(float(alpha)))
                     / F.col("_zn") / F.col("_n"), 6)))
             .select(strata_col, "rate"))
    kept = (df.join(F.broadcast(rates), on=strata_col)
            .filter(sample_bucket(F.col(key_col), salt)
                    < F.floor(F.col("rate") * SAMPLE_DENOM).cast("long")))
    return kept.select(F.col(key_col), F.col(strata_col), F.col("rate"))


def quality_curriculum(docs: DataFrame, n_buckets: int = 4,
                       floor: float = 0.2, text_col: str = "text",
                       key_col: str = "doc_id",
                       salt: str = "") -> DataFrame:
    """Quality-bucketed curriculum sampling: score every document with
    the engine's composite quality heuristic, split the corpus into
    ``n_buckets`` equal-size quality tiers (ntile over (score, id) —
    the id tie-break makes bucket assignment deterministic across
    engines and re-runs), and keep a linearly ramped fraction of each:
    rate(worst)=``floor`` … rate(best)=1.0.  The "sample more of the
    good data" recipe (perplexity-bucket sampling of CCNet, quality
    weighting of DoReMi-style mixes) without duplicating any row.

    Output: (key, bucket 1..n, rate) for kept rows.  The keep decision
    is the same deterministic md5 bucket as :func:`stratified_sample`
    (append-stable, salt-derivable).

    Scale shape: scoring is map-only; the ntile is ONE global sort of
    (score, id) pairs — a 16-byte-row exchange, the same budget as any
    global rank; the keep filter is map-side.  For corpora where even
    that is too hot, the partitioner's two-pass ranking scheme applies,
    but a quality curriculum is typically computed on corpus-sized
    metadata, not raw bytes.
    """
    from ..functions.text import quality_score
    scored = docs.select(F.col(key_col),
                         F.round(quality_score(text_col), 6).alias("q"))
    w = Window.orderBy(F.col("q").asc(), F.col(key_col).asc())
    b = scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    rate = F.round(
        F.lit(floor) + F.lit(1.0 - floor)
        * (F.col("bucket") - 1) / F.lit(float(n_buckets - 1)), 6)
    b = b.withColumn("rate", rate)
    return (b.filter(sample_bucket(F.col(key_col), salt)
                     < F.floor(F.col("rate") * SAMPLE_DENOM).cast("long"))
            .select(key_col, "bucket", "rate"))


def cluster_sample(df: DataFrame, centroids: DataFrame, per_cell: int,
                   id_col: str = "id",
                   vector_col: str = "vector") -> DataFrame:
    """Cluster-balanced (diversity) subsampling: assign every vector to
    its nearest k-means cell and keep at most ``per_cell`` rows per
    cell, chosen by a deterministic hash order — the embedding-space
    analog of stratified sampling (the "prune redundant dense regions,
    keep sparse-region coverage" recipe of SemDeDup-family pruning and
    cluster-balanced fine-tuning mixes).  A head-count cap per cell
    would bias toward low ids; the md5 order is an unbiased,
    engine-portable shuffle of each cell.

    Output: (cell, id, rk) with rk 1..per_cell.

    Pass ``centroids`` from :func:`~.similarity.kmeans_fit` (fit once
    at ingest, reused — never refit per call).

    Scale shape: assignment is strictly map-side against the broadcast
    centroid matrix (:func:`~.similarity._nearest_cells`); the per-cell
    rank is one window keyed by the cell id over (hash, id) pairs —
    a bounded-width exchange (16-byte rows), partitioned k ways.  Cells
    are ~|corpus|/k rows by construction, so no single task sees more
    than a cell; skewed cells are the quantizer's problem (grow k),
    not the sampler's.
    """
    from .similarity import _nearest_cells
    # quantize: the assign decides oracle-compared cell membership, so
    # a float near-tie must not flip between engines (ADVICE r07)
    assigned = _nearest_cells(df, centroids, 1, id_col, vector_col,
                              "cell", "vector", keep_vector=False,
                              quantize=True)
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy("cell").orderBy(h.asc(), F.col(id_col).asc())
    return (assigned.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= per_cell)
            .select("cell", F.col(id_col), "rk"))
