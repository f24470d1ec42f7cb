"""Session-scoped cache registry: every operator-internal ``persist()``
is tracked so callers can release executor memory after their action.

Round-1 hazard fixed here: sketch DataFrames (MinHash bands, SimHash
digit arrays, n-gram blocks, bench postings) were pinned with
``persist()`` and never released — a cache leak in any long-lived
pipeline. Operators now route through :func:`track`; pipeline drivers
(bench.py, tests, user jobs) call :func:`release_all` once their action
completes. The persists themselves remain measured-necessary (they stop
Catalyst's project-collapsing from re-inlining md5 sketch subtrees into
both sides of self-joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# STRONG references, deliberately: Spark's CacheManager pins the
# InMemoryRelation JVM-side until an explicit unpersist — garbage-
# collecting the Python wrapper does NOT uncache the plan. The original
# weakref registry silently lost the ability to release any persist
# whose wrapper died before release_all (store.diff's internal frame
# was the first caught case: the returned plan references the cached
# relation, but no Python object keeps the wrapper alive), leaving the
# executor memory pinned forever. Holding the wrapper costs a few
# hundred bytes per entry; release_all drains the list either way.
_TRACKED: list[DataFrame] = []
_RELEASE_HOOKS: list = []


def track(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and remember it for :func:`release_all`."""
    df.persist()
    _TRACKED.append(df)
    return df


def register_release_hook(fn) -> None:
    """Register a ``() -> int`` callback run by :func:`release_all` —
    for operator caches that are not DataFrames (e.g. bpe_encode's
    per-model merge-table broadcasts)."""
    _RELEASE_HOOKS.append(fn)


def release_all() -> int:
    """Unpersist every tracked DataFrame still alive (plus registered
    non-DataFrame caches); returns the count."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            released += 1
        except Exception:
            pass
    for fn in _RELEASE_HOOKS:
        try:
            released += int(fn() or 0)
        except Exception:
            pass
    return released
