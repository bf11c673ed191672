"""Session-scoped plan caches.

Memoized DataFrames (lazy plans, persisted shared stages) are only valid
for the SparkSession that built them. Keying a module-level dict by
``id(spark)`` is unsafe: CPython reuses ids after garbage collection, so
a new session could be served a plan bound to a dead one — and dead
sessions' entries would never be evicted. A ``WeakKeyDictionary`` keyed
on the live session object fixes both: identity can't be confused with a
new session, and a collected session drops its whole cache with it.
"""

from __future__ import annotations

import weakref

_SESSION_CACHES: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def session_cache(spark, namespace: str) -> dict:
    """The mutable cache dict for (``spark``, ``namespace``) — created on
    first use, garbage-collected with the session."""
    per_session = _SESSION_CACHES.get(spark)
    if per_session is None:
        per_session = {}
        _SESSION_CACHES[spark] = per_session
    return per_session.setdefault(namespace, {})
