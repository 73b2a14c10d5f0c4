"""Registry of named queries with optional DuckDB oracle SQL.

The driver contract (``__spark_entry__.py``) needs ``queries()`` and
``oracle_sql()``; this registry is the single source of truth for both.
Column names are aliased identically in the Spark plan and the oracle SQL —
the driver's compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    #: ANSI SQL equivalent runnable by DuckDB over the same parquet tables;
    #: None for genuinely non-SQL-expressible operators (driver then records
    #: a weaker rows-only check).
    oracle: str | None = None
    #: Included in bench.py's headline timing set.
    headline: bool = False
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            headline=headline,
            description=description,
            tags=tags,
        )
        return fn

    return deco
