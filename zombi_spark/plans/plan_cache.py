"""Session-scoped plan caches.

Memoized DataFrames (lazy plans, persisted shared stages) are only valid
for the SparkSession that built them. Keying a module-level dict by
``id(spark)`` is unsafe: CPython reuses ids after garbage collection, so
a new session could be served a plan bound to a dead one. A
``WeakKeyDictionary`` keyed on the live session object fixes the
identity half outright.

Eviction needs one more step: cached DataFrames strongly reference
their session, and a WeakKeyDictionary holds its VALUES strongly — the
value would pin its own key forever (the documented WeakKeyDictionary
caveat). So every lookup also purges entries whose session has been
STOPPED (``sparkContext._jsc is None``): a stopped session's plans are
unusable anyway, and dropping them releases the session object for
collection.
"""

from __future__ import annotations

import threading
import weakref

_SESSION_CACHES: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
# get/check/set below must be atomic: two threads racing the first
# lookup for a session would each mint a dict, one gets orphaned, and
# anything the loser caches (persisted shared stages!) becomes an
# unreachable, never-unpersistable pin on executor storage
_CACHE_LOCK = threading.Lock()


def _is_stopped(session) -> bool:
    try:
        return session.sparkContext._jsc is None
    except Exception:
        return False  # not a real session (tests) or state unknown: keep


def session_cache(spark, namespace: str) -> dict:
    """The mutable cache dict for (``spark``, ``namespace``) — created on
    first use, dropped once the session is stopped or collected."""
    with _CACHE_LOCK:
        for dead in [k for k in list(_SESSION_CACHES) if _is_stopped(k)]:
            del _SESSION_CACHES[dead]
        per_session = _SESSION_CACHES.get(spark)
        if per_session is None:
            per_session = {}
            _SESSION_CACHES[spark] = per_session
        return per_session.setdefault(namespace, {})
