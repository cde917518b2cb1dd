"""System configuration (reference ``config/.../SystemConfig.java:91-190``:
JSON config with named profile overrides, validated on load).

Subset kept: the knobs that change engine behavior.  Unknown keys are
rejected (the reference validates via Jackson strict binding)."""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field, fields, replace

from .lsh.params import LshConfig


@dataclass(frozen=True)
class SystemConfig:
    # index geometry
    dim: int = 64
    m: int = 8
    lam: int = 2
    tables: int = 4
    divisions: int = 2
    seed: int = 42
    omega_divisor: float = 2.5
    block_size: int = 64
    # query runtime
    probes: int = 5
    probe_override: int = 10
    refinement_limit: int = 20_000
    hamming_threshold: int = 0
    top_k: int = 10
    # key rotation (St2 thresholds, reference SystemConfig.java:50-54)
    rotation_max_ops: int = 1_000_000
    rotation_max_age_sec: float = 86_400.0
    reenc_mode: str = "end"          # "end" | "background" | "off"
    # decoys / cloaking (reference CloakConfig:426-428, DecoyQueryGenerator)
    cloak_noise: float = 0.0
    decoy_ratio: float = 0.0
    decoy_mode: str = "uniform"      # uniform | gaussian | clustered

    def lsh(self) -> LshConfig:
        return LshConfig(dim=self.dim, m=self.m, lam=self.lam,
                         tables=self.tables, divisions=self.divisions,
                         seed=self.seed, omega_divisor=self.omega_divisor,
                         block_size=self.block_size, probes=self.probes,
                         probe_override=self.probe_override,
                         refinement_limit=self.refinement_limit,
                         hamming_threshold=self.hamming_threshold)

    def validate(self) -> "SystemConfig":
        if self.dim <= 0 or self.m <= 0 or self.lam <= 0:
            raise ValueError("dim/m/lam must be positive")
        if self.tables <= 0 or self.divisions <= 0:
            raise ValueError("tables/divisions must be positive")
        if self.reenc_mode not in ("end", "background", "off"):
            raise ValueError(f"bad reenc_mode {self.reenc_mode!r}")
        if self.decoy_mode not in ("uniform", "gaussian", "clustered"):
            raise ValueError(f"bad decoy_mode {self.decoy_mode!r}")
        if not (0.0 <= self.decoy_ratio < 1.0):
            raise ValueError("decoy_ratio must be in [0, 1)")
        return self


def load_config(path: str, profile: str | None = None) -> SystemConfig:
    """Load JSON config; apply a named profile's overrides (reference
    profile application ``SystemConfig.java:129-182``)."""
    with open(path) as f:
        raw = json.load(f)
    profiles = raw.pop("profiles", {})
    if profile is not None:
        if profile not in profiles:
            raise KeyError(f"unknown profile {profile!r}")
        raw.update(profiles[profile])
    known = {f.name for f in fields(SystemConfig)}
    unknown = set(raw) - known
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return SystemConfig(**raw).validate()


def config_sha256(path: str) -> str:
    """C9 reproducibility stamp (reference ``exportArtifacts:1213-1222``)."""
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()
