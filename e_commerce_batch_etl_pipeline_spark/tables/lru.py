"""One LRU-dict discipline for the table layer's metadata caches.

Both caches hold IMMUTABLE, content-addressed artifacts (manifest entry
lists, bloom sidecar bits) keyed by absolute path — safe to cache
indefinitely, but not unboundedly: a long-lived driver (soak/streaming
engine) with per-epoch churn would otherwise accumulate one entry per
artifact ever touched. Eviction only costs a re-read. Cached values are
shared and must not be mutated by callers.

Thread-safe (r6): commit now writes dirty-bucket manifests from a thread
pool, so puts can race; a plain OrderedDict's move_to_end/popitem
interleavings are not atomic under the GIL.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict


class LruCache:
    def __init__(self, env_var: str, default_max: int):
        self._data: OrderedDict = OrderedDict()
        self._lock = threading.Lock()
        self.max = int(os.environ.get(env_var, str(default_max)))

    def get(self, key):
        with self._lock:
            got = self._data.get(key)
            if got is not None:
                self._data.move_to_end(key)
            return got

    def put(self, key, value) -> None:
        with self._lock:
            self._data[key] = value
            self._data.move_to_end(key)
            while len(self._data) > self.max:
                self._data.popitem(last=False)

    def __len__(self) -> int:
        with self._lock:
            return len(self._data)

    def clear(self) -> None:
        with self._lock:
            self._data.clear()
