"""Versioned key management (reference ``keymanagement/.../KeyManager.java``).

Semantics:
- session key for version v is HKDF-style derived:
  K_v = HMAC-SHA256(K_master, int32_be(v))[0:32]
  (reference ``KeyManager.deriveSessionKey:221-237``).
- rotation bumps the current version; old keys stay resolvable until
  retired (reference retention MAX_RETAINED_KEYS, ``KeyManager.java:35-36``).
- a key version is safe to delete iff no stored point is still bound to
  it (reference ``KeyUsageTracker.isSafeToDelete:72-82``) — the census is
  a Spark aggregation supplied by the caller.
- keystore persists driver-side only (tmp file + atomic rename, mirroring
  ``KeyManager.persistSync:185-219``); keys reach executors exclusively
  via broadcast for the crypto UDFs.  They are never shuffled or written
  to any table.

Trust model (SURVEY §7.4): executors play the reference's "client" role
during refinement — they hold session keys in memory only.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import secrets
import struct
import time


KEY_LEN = 32
MAX_RETAINED_KEYS = 5


def derive_session_key(master: bytes, version: int) -> bytes:
    return hmac.new(master, struct.pack(">i", version), hashlib.sha256).digest()[:KEY_LEN]


class RotationPolicy:
    """Ops-count / age thresholds (reference ``KeyRotationPolicy.java:10-16``)."""

    def __init__(self, max_ops: int = 1_000_000, max_age_sec: float = 86_400.0):
        self.max_ops = max_ops
        self.max_age_sec = max_age_sec

    def should_rotate(self, ops_since: int, age_sec: float) -> bool:
        return ops_since >= self.max_ops or age_sec >= self.max_age_sec


class KeyManager:
    """Driver-side keystore with versioned derived keys."""

    def __init__(self, master: bytes | None = None, path: str | None = None,
                 policy: RotationPolicy | None = None):
        self.path = path
        self.policy = policy or RotationPolicy()
        self._ops_since_rotation = 0
        self._last_rotation = time.time()
        if path and os.path.exists(path):
            self._load()
        else:
            self.master = master if master is not None else secrets.token_bytes(KEY_LEN)
            self.current_version = 1
            self.created_at = {1: time.time()}
            self.retired: set[int] = set()
            if path:
                self.persist()
        self._cache: dict[int, bytes] = {}

    # -- derivation ---------------------------------------------------------
    def key_for(self, version: int) -> bytes:
        if version < 1 or version > self.current_version:
            raise KeyError(f"unknown key version {version}")
        if version in self.retired:
            raise KeyError(f"key version {version} retired (forward security)")
        if version not in self._cache:
            self._cache[version] = derive_session_key(self.master, version)
        return self._cache[version]

    def key_map(self, oldest: int | None = None) -> dict[int, bytes]:
        """{version: key} for broadcast to crypto UDFs."""
        lo = oldest if oldest is not None else max(1, self.current_version - MAX_RETAINED_KEYS)
        return {v: self.key_for(v) for v in range(lo, self.current_version + 1)
                if v not in self.retired}

    # -- rotation -----------------------------------------------------------
    def rotate(self) -> int:
        self.current_version += 1
        self.created_at[self.current_version] = time.time()
        self._ops_since_rotation = 0
        self._last_rotation = time.time()
        if self.path:
            self.persist()
        return self.current_version

    def record_ops(self, n: int) -> None:
        self._ops_since_rotation += n

    def rotate_if_needed(self) -> int | None:
        """St2 per-batch check; returns the new version if rotated."""
        if self.policy.should_rotate(self._ops_since_rotation,
                                     time.time() - self._last_rotation):
            return self.rotate()
        return None

    # -- retirement ---------------------------------------------------------
    def safe_to_delete(self, version: int, bound_count: int) -> bool:
        """F6: deletable iff census says nothing is bound to it and it is
        not current."""
        return version < self.current_version and bound_count == 0

    def delete_keys_older_than(self, version: int,
                               census: dict[int, int]) -> list[int]:
        """Forward-security retirement (reference
        ``KeyManager.deleteKeysOlderThan:274-317``): retire every version
        < ``version`` whose ``census`` count is 0 (A8 census gates the
        delete — never retire a key that still guards data, never the
        current key).  Retired versions can no longer derive keys; with
        per-version derivation, retirement is an enforced deny-list that
        survives restarts."""
        retired = []
        for v in range(1, min(version, self.current_version)):
            if v not in self.retired and census.get(v, 0) == 0:
                self.retired.add(v)
                self._cache.pop(v, None)
                retired.append(v)
        if retired and self.path:
            self.persist()
        return retired

    # -- persistence (driver-local, atomic) ---------------------------------
    def persist(self) -> None:
        blob = json.dumps({
            "master": base64.b64encode(self.master).decode(),
            "current_version": self.current_version,
            "created_at": self.created_at,
            "retired": sorted(self.retired),
        })
        tmp = f"{self.path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(blob)
        os.replace(tmp, self.path)

    def _load(self) -> None:
        with open(self.path) as f:
            blob = json.load(f)
        self.master = base64.b64decode(blob["master"])
        self.current_version = int(blob["current_version"])
        self.created_at = {int(k): v for k, v in blob["created_at"].items()}
        self.retired = set(blob.get("retired", []))

    def wipe(self) -> None:
        """C8 best-effort in-memory key wipe (Python strings/bytes are
        immutable; documented best-effort like the JVM reference,
        ``SecureKeyDeletion.wipeKey:50-64``)."""
        self._cache.clear()
        self.master = b"\x00" * KEY_LEN
