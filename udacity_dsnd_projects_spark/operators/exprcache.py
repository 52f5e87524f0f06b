"""Session-scoped cache of UNRESOLVED Column templates.

Building a large expression tree through the PySpark DSL costs one
py4j round trip (~1 ms) per Column operation: a baked BPE replace
chain is hundreds of calls, a K×dim centroid-distance argmin is
500+ — real driver latency (0.4-0.8 s) paid on EVERY query
construction, and the bench constructs every query twice (best-of-2).
The finished Column is an immutable unresolved expression over fixed
input column names: one instance serves every plan in the session
(the analyzer resolves lambda variables per plan occurrence; trees
are rewritten copy-on-write), so it is safe to build once per
(applicationId, semantic key) and reuse.

This caches plan FRAGMENTS, never data or results: every action over
a plan that embeds a cached template still computes from its inputs.
applicationId in the key fences off stale JVM objects across session
restarts (the _BPE_LEARN_CACHE convention in functions/text.py)."""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

from pyspark.sql import Column, SparkSession

_CACHE: "OrderedDict[tuple, Column]" = OrderedDict()
_CAP = 64


def cached_expr(
    spark: SparkSession, key: tuple, build: Callable[[], Column]
) -> Column:
    """``build()``'s Column, memoized per (applicationId, ``key``).
    ``key`` must capture everything the expression depends on (the
    artifact values baked into it, any constants)."""
    full_key = (spark.sparkContext.applicationId, *key)
    hit = _CACHE.get(full_key)
    if hit is not None:
        _CACHE.move_to_end(full_key)
        return hit
    col = build()
    while len(_CACHE) >= _CAP:
        _CACHE.popitem(last=False)
    _CACHE[full_key] = col
    return col
