"""Named-query registry: the driver contract surface.

Every operator from SURVEY.md §2 surfaces here as a named query over the
``/root/testdata`` catalog, paired (where ANSI-SQL-expressible) with a
DuckDB oracle string. ``__spark_entry__.queries()`` / ``oracle_sql()`` are
thin views over this registry.

Contract reminders:
- builder signature: (spark, sf_dir) -> DataFrame
- every computed column aliased IDENTICALLY in the Spark plan and the
  oracle SQL (driver hashes values under sorted column names)
- results must be deterministic (explicit tie-breaks, rounded doubles)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""  # SURVEY §2 row(s) this query covers
    tags: tuple[str, ...] = field(default_factory=tuple)
    # Per-branch builders for FOLDED queries (several kinds/methods
    # unioned into one registered result): {branch: (spark, sf_dir) ->
    # DataFrame building ONLY that branch}. The bench uses these to
    # attribute a folded query's cost per branch — a new fold must
    # never again read as a regression of the whole query. Branch
    # timings are STANDALONE costs: a branch built alone re-creates
    # any projection the fold shares (e.g. a persisted shingle frame),
    # so the fold total can be less than the branch sum.
    branches: dict[str, Builder] = field(default_factory=dict)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "",
             tags: tuple[str, ...] = (),
             branches: dict[str, Builder] | None = None,
             ) -> Callable[[Builder], Builder]:
    """Decorator: add a named query (+ optional oracle) to the registry."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle,
                               doc=doc or (fn.__doc__ or ""), tags=tags,
                               branches=dict(branches or {}))
        return fn

    return wrap


def queries() -> dict[str, Builder]:
    return {q.name: q.builder for q in REGISTRY.values()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle}
