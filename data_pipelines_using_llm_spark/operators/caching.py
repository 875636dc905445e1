"""Lifecycle tracking for persisted intermediates.

Several operators materialize an expensive intermediate behind
``persist()`` so Catalyst's projection collapse cannot re-evaluate it per
consumer (the 50x trap documented in operators/dedup.py).  The persisted
block outlives the returned DataFrame, so long-lived sessions that run
many queries (the bench loop, the correctness driver) would accumulate
cached blocks and lean on LRU eviction.

``barrier(df)`` persists and registers the intermediate;
``release_barriers()`` unpersists everything registered so far.  Entry
points that loop over queries (bench.py, scripts/drive_contract.py,
tests) call ``release_barriers()`` after materializing each result; the
blocks are non-blocking-unpersisted, so an already-running plan that
still references one simply recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def barrier(df: DataFrame) -> DataFrame:
    """Persist ``df`` and track it for later :func:`release_barriers`."""
    _TRACKED.append(df)
    return df.persist()


def release_barriers() -> int:
    """Unpersist every tracked intermediate; returns how many were freed."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
