"""Data-quality auditing: declarative constraint checks in one pass.

A training-data pipeline gates every ingest behind constraint checks
(null keys, duplicate keys, range violations, enum drift). This operator
evaluates an arbitrary rule set in a SINGLE aggregate pass over the
table — each rule is a Column predicate flagging VIOLATING rows, all
rules reduce to conditional counts inside one partial-agg'd shuffle, and
the wide one-row result unpivots to (rule, n_violations) rows. At 100 TB
the cost is one scan regardless of how many rules ride on it.

Uniqueness is the one constraint a row predicate can't express; it is
handled as a dedicated count(*) - count(distinct ...) term in the same
aggregate (Spark plans the distinct as a two-stage expand, still one
scan of the input).
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def audit(
    df: DataFrame,
    violation_rules: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Count violations per rule; returns (rule, n_violations) rows.

    ``violation_rules`` maps rule name -> predicate that is TRUE for a
    violating row. ``unique_keys`` maps rule name -> key column list that
    must be unique (violations = extra copies beyond the first, among
    rows whose key components are all non-null: COUNT(DISTINCT) skips
    null-containing keys, so rows with a null key component are excluded
    from BOTH counts — null-ness is its own rule, not a duplicate).
    """
    # coalesce: SUM over zero rows is NULL — an empty ingest must audit
    # as "0 violations", not "unknown".
    aggs = [
        F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias(name)
        for name, cond in violation_rules.items()
    ]
    for name, keys in (unique_keys or {}).items():
        all_non_null = F.lit(True)
        for k in keys:
            all_non_null = all_non_null & F.col(k).isNotNull()
        aggs.append(
            (
                F.count(F.when(all_non_null, 1))
                - F.count_distinct(*[F.col(k) for k in keys])
            )
            .cast("long")
            .alias(name)
        )
    wide = df.agg(*aggs)
    names = wide.columns
    stack_expr = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.select(
        F.expr(f"stack({len(names)}, {stack_expr}) as (rule, n_violations)")
    )


#: Monotonic suffix so two instrumented stages of ONE query never share
#: an Observation name (Spark rejects duplicate names in a plan).
_OBS_COUNTER = itertools.count()


def observed(
    df: DataFrame,
    metrics: dict[str, Column],
    name: str | None = None,
):
    """Attach zero-extra-scan metrics to a DataFrame via ``observe``.

    ``audit`` answers "how bad is this table" with a dedicated aggregate
    job; ``observed`` instruments a DataFrame that is *already* flowing
    through a pipeline, collecting aggregate metrics as a side effect of
    whatever action the caller runs — no second scan, no extra shuffle
    (metrics are accumulated per-task and merged on the driver). This is
    how a 100 TB ingest records row counts / null rates / violation
    counts for every stage without doubling its IO.

    Returns ``(instrumented_df, observation)``; read
    ``observation.get`` AFTER an action has run on the instrumented
    DataFrame.
    """
    from pyspark.sql import Observation

    obs = Observation(name or f"dq-{next(_OBS_COUNTER)}")
    named = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *named), obs
