"""LSH parameter families ("GFunctions").

Semantics (reference spec, studied not copied):
- per (table t, division d) family seed = base_seed + t*1_000_003 + d
  (reference ``index/.../GFunctionRegistry.java:291-293``).
- alpha: m gaussian rows of length dim, each row L2-normalized
  (reference ``index/.../Coding.java:136-161``).
- omega_j: data-adaptive width = (max_j - min_j) / omega_divisor of the
  sample's projections on alpha_j, divisor default 2.5
  (reference ``index/.../Coding.java:184-241``, divisor at 224).
- r_j: uniform offset in [0, omega_j) (reference ``Coding.java:156-158``).

Determinism: numpy PCG64(seed) per family; the reference uses
SplittableRandom + Box-Muller, so numeric parity with Java is NOT expected —
determinism across *our* sessions is, and params are persisted to a
``lsh_params`` table so a restarted session routes identically
(reference persists nothing and relies on RNG parity; see SURVEY §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

FAMILY_SEED_STRIDE = 1_000_003  # reference GFunctionRegistry.computeSeed


@dataclass(frozen=True)
class LshConfig:
    """Tuning knobs of the index (reference ``SystemConfig`` subset)."""
    dim: int
    m: int = 8                  # projections per family
    lam: int = 2                # bits kept per projection ("lambda")
    tables: int = 4             # L
    divisions: int = 2          # D
    seed: int = 42
    omega_divisor: float = 2.5
    block_size: int = 64        # greedy partition block (reference: 64)
    probes: int = 5             # max partitions probed per (table, division)
    probe_override: int = 10    # adaptive-retry probe budget
    refinement_limit: int = 20_000
    hamming_threshold: int = 0  # F4 prefilter; 0 disables
    hard_cap: int = 0           # 0 => max(refinement_limit, ...) semantics

    @property
    def code_bits(self) -> int:
        return self.m * self.lam

    @property
    def code_words(self) -> int:
        return (self.code_bits + 63) // 64


@dataclass
class LshParams:
    """Fitted families: dict {(table, division): (alpha, r, omega)}."""
    cfg: LshConfig
    families: dict = field(default_factory=dict)  # (t,d) -> (alpha[m,d], r[m], omega[m])

    def packed(self) -> list:
        """[(t, d, alpha, r, omega)] in deterministic order."""
        return [
            (t, d, *self.families[(t, d)])
            for t in range(self.cfg.tables)
            for d in range(self.cfg.divisions)
        ]


def family_seed(base_seed: int, table: int, division: int) -> int:
    return base_seed + table * FAMILY_SEED_STRIDE + division


def _fit_family(sample: np.ndarray, cfg: LshConfig, seed: int):
    rng = np.random.Generator(np.random.PCG64(seed))
    alpha = rng.standard_normal((cfg.m, cfg.dim))
    norms = np.linalg.norm(alpha, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    alpha = alpha / norms
    proj = sample @ alpha.T                      # (n, m)
    span = proj.max(axis=0) - proj.min(axis=0)   # (m,)
    omega = span / cfg.omega_divisor
    omega[~(omega > 0.0)] = 1.0                  # degenerate sample guard
    r = rng.uniform(0.0, omega)
    return alpha, r, omega


def fit_params(sample: np.ndarray, cfg: LshConfig) -> LshParams:
    """Fit all L*D families from a driver-side sample matrix (n, dim).

    The sample should be >= ~1000 vectors for stable omegas (reference
    MIN_SAMPLE_SIZE gate, ``PartitionedIndexService.java:50-51``); fewer
    is accepted for tests.
    """
    sample = np.asarray(sample, dtype=np.float64)
    if sample.ndim != 2 or sample.shape[1] != cfg.dim:
        raise ValueError(f"sample shape {sample.shape} != (n, {cfg.dim})")
    if not np.isfinite(sample).all():
        raise ValueError("sample contains NaN/Inf")
    fams = {}
    for t in range(cfg.tables):
        for d in range(cfg.divisions):
            fams[(t, d)] = _fit_family(sample, cfg, family_seed(cfg.seed, t, d))
    return LshParams(cfg=cfg, families=fams)


def fit_params_from_df(df, cfg: LshConfig, sample_size: int = 10_000,
                       vector_col: str = "vector") -> LshParams:
    """Fit from a DataFrame sample (driver-side collect of <= sample_size rows)."""
    rows = df.select(vector_col).limit(sample_size).collect()
    sample = np.array([r[0] for r in rows], dtype=np.float64)
    return fit_params(sample, cfg)


# --- persistence (lsh_params table; FIXTURES.md §6 schema) -------------------

def save_params(spark, params: LshParams, path: str) -> None:
    rows = []
    for t, d, alpha, r, omega in params.packed():
        for j in range(params.cfg.m):
            rows.append((t, d, j, [float(x) for x in alpha[j]],
                         float(r[j]), float(omega[j])))
    df = spark.createDataFrame(
        rows, "table INT, division INT, j INT, alpha ARRAY<DOUBLE>, r DOUBLE, omega DOUBLE")
    meta = spark.createDataFrame(
        [(params.cfg.dim, params.cfg.m, params.cfg.lam, params.cfg.tables,
          params.cfg.divisions, params.cfg.seed, params.cfg.omega_divisor,
          params.cfg.block_size, params.cfg.probes, params.cfg.refinement_limit)],
        "dim INT, m INT, lam INT, tables INT, divisions INT, seed LONG, "
        "omega_divisor DOUBLE, block_size INT, probes INT, refinement_limit INT")
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/families")
    meta.coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_params(spark, path: str) -> LshParams:
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    cfg = LshConfig(dim=meta.dim, m=meta.m, lam=meta.lam, tables=meta.tables,
                    divisions=meta.divisions, seed=meta.seed,
                    omega_divisor=meta.omega_divisor, block_size=meta.block_size,
                    probes=meta.probes, refinement_limit=meta.refinement_limit)
    fams = {}
    for row in spark.read.parquet(f"{path}/families").collect():
        key = (row.table, row.division)
        if key not in fams:
            fams[key] = (np.zeros((cfg.m, cfg.dim)), np.zeros(cfg.m), np.zeros(cfg.m))
        alpha, r, omega = fams[key]
        alpha[row.j] = row.alpha
        r[row.j] = row.r
        omega[row.j] = row.omega
    return LshParams(cfg=cfg, families=fams)
