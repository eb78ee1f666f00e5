"""Per-JVM memo for static Column/WindowSpec expression trees.

Several builders (pair verification reasons, stat parity, the survivor
chain) construct expression trees that depend only on configuration
and on which columns are present — never on data — yet were rebuilt
through thousands of py4j round trips on every run_dedup call
(~1.5-2 s of driver wall per run, measured by cProfile at 500 docs;
see OPTIMIZATION_r06.md). Column objects are immutable expression
handles that bind by NAME at analysis time, so one tree serves every
DataFrame carrying those columns.

The py4j gateway object itself is part of the key (and kept referenced
by it): entries stay valid across SparkSession/SparkContext restarts
within one JVM — Spark Columns are session-independent expressions —
and a process with a fresh gateway simply misses and rebuilds.

Expressions only, NEVER query results or data: every run still
computes everything from its inputs.
"""

from __future__ import annotations

from collections.abc import Callable

_CACHE: dict = {}

# keys may carry per-run identity (streaming drains pass a fresh
# run_id/run_ts to select_survivors every trigger) — cap the memo so a
# long-lived driver can't grow it without bound; a clear just means
# the next call rebuilds its tree once
_MAX_ENTRIES = 512


def memo(key_parts: tuple, builder: Callable):
    """Return builder() memoized under (gateway, *key_parts)."""
    from pyspark import SparkContext

    key = (SparkContext._gateway, *key_parts)
    val = _CACHE.get(key)
    if val is None:
        if len(_CACHE) >= _MAX_ENTRIES:
            _CACHE.clear()
        val = builder()
        _CACHE[key] = val
    return val
