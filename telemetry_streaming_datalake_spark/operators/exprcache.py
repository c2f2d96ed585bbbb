"""Process-level cache for UNRESOLVED Column expression trees.

Why this exists (r14 optimization round, guide §1.2 order-of-work and
§7.3 driver-side bottlenecks): several operators in this engine build
large column-expression trees — the 66-rule percent-decode URL
canonicalizer, the HTML block-extraction chain, the Gopher gate's
feature set.  Constructing such a tree costs hundreds-to-thousands of
py4j round trips (every ``F.xxx`` call crosses the Python↔JVM
boundary), measured at 0.25-0.55 s *per construction* on the bench
box.  A batch query pays that once; a **per-micro-batch** operator
(the crawl topologies' ``foreachBatch`` ladders) pays it on every
batch, and a bench/driver harness pays it on every timed run — it is
a fixed driver-side cost that no executor parallelism can hide.

A PySpark ``Column`` is an *unresolved* expression: it binds to input
attributes by NAME at analysis time and holds no reference to any
DataFrame, SparkSession, or SparkContext — only to JVM expression
objects, which live as long as the JVM gateway (one per Python
process; surviving ``SparkSession.stop()``/re-create cycles, which
re-use the gateway).  Reusing one Column in many plans is therefore
exactly as safe as the ubiquitous ``c = F.col("x") + 1; df1.select(c);
df2.select(c)`` idiom — analysis re-resolves the immutable tree per
plan and never mutates it.

``cached_cols(key, build)`` memoizes ``build()`` (returning a Column
or a list/tuple of Columns) per process.  Builders MUST be
deterministic, parameter-free closures over module constants — any
operator knob that changes the expression must be part of ``key``.
"""

from __future__ import annotations

from typing import Callable, TypeVar

T = TypeVar("T")

_CACHE: dict[str, object] = {}


def cached_cols(key: str, build: Callable[[], T]) -> T:
    """Return ``build()``, memoized per process under ``key``.

    Benign under concurrent first use (CPython dict ops are atomic;
    the worst case is building the same immutable tree twice).
    """
    got = _CACHE.get(key)
    if got is None:
        got = build()
        _CACHE[key] = got
    return got  # type: ignore[return-value]
