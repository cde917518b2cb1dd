"""Query-result cache (reference ``ForwardSecureANNSystem.java:1103-1151``:
LRU + TTL keyed by the *logical* token — same query vector, K, and index
version hit the same entry regardless of the per-query random IV).

App-level and driver-side only: the cache stores collected top-K rows
(K·|Q| tuples, bounded), never DataFrames or plans.  At scale this is the
classic read-through cache in front of the probe pipeline; entries are
invalidated wholesale on index change (routing state is immutable, so the
index epoch only moves on rebuild/re-encryption swap)."""

from __future__ import annotations

import hashlib
import time
from collections import OrderedDict


class QueryCache:
    def __init__(self, max_entries: int = 1000, ttl_sec: float = 300.0):
        self.max_entries = max_entries
        self.ttl_sec = ttl_sec
        self._d: OrderedDict[str, tuple[float, list]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def key_of(vector, k: int, epoch: int) -> str:
        """Logical token key: query geometry + K + index epoch (the
        reference's ``cacheKeyOf`` — deliberately ignores the encryption
        IV so re-encrypted identical queries still hit)."""
        h = hashlib.sha256()
        h.update(b"%d|%d|" % (k, epoch))
        h.update(b",".join(repr(float(x)).encode() for x in vector))
        return h.hexdigest()

    def get(self, key: str):
        ent = self._d.get(key)
        if ent is None:
            self.misses += 1
            return None
        ts, rows = ent
        if time.time() - ts > self.ttl_sec:
            del self._d[key]
            self.misses += 1
            return None
        self._d.move_to_end(key)
        self.hits += 1
        return rows

    def put(self, key: str, rows: list) -> None:
        self._d[key] = (time.time(), rows)
        self._d.move_to_end(key)
        while len(self._d) > self.max_entries:
            self._d.popitem(last=False)

    def invalidate(self) -> None:
        """Index epoch change (rebuild / payload swap) drops everything."""
        self._d.clear()
