"""Physical-plan boundedness analysis: flag single-partition exchanges
over unbounded input.

A ``Window.orderBy`` with an empty partition spec (or any plan that
funnels a corpus-sized table through ``Exchange SinglePartition``) runs
the whole input through ONE task — invisible at local scale, fatal at
100 TB. Spark only infers ``WindowGroupLimit`` for *partitioned* rank
filters, so the empty-spec form silently stays a global one-task sort.

``unbounded_single_partition_exchanges(df)`` walks the EXECUTED plan
(post-AQE) and returns a description of every ``ShuffleExchangeExec``
with ``SinglePartition`` output whose input subtree is not provably
constant-bounded. Boundedness is a conservative bottom-up analysis:

- limit nodes (``GlobalLimit`` / ``LocalLimit`` / ``CollectLimit`` /
  ``TakeOrderedAndProject``) bound their subtree;
- an aggregate with NO grouping expressions is bounded (partial: one
  row per task; final: one row);
- ``LocalTableScan`` / empty relations are bounded;
- unary operators propagate the child's boundedness; joins and unions
  are bounded only if every child is;
- file scans and cached corpus scans are unbounded (cached plans are
  additionally walked for offenders of their own).

Queries with a documented bounded-by-construction single-partition
stage that this analysis cannot see (e.g. a generated constant spine)
are named in ``SINGLE_PARTITION_ALLOWLIST`` with the justification.
Used by ``tools/plan_sweep.py`` (registry-wide) and
``tests/test_plan_quality.py`` (CI pin for the round-4 fixed queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Query name -> justification for a single-partition exchange the
# boundedness analysis cannot prove bounded. Every entry must cite why
# the exchanged rowcount is a small constant at ANY corpus scale.
SINGLE_PARTITION_ALLOWLIST: dict[str, str] = {}

_LIMIT_NODES = {
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
    "TakeOrderedAndProjectExec",
}

_BOUNDED_LEAVES = {
    "LocalTableScanExec",
    "EmptyRelationExec",
    "OneRowRelationExec",
    "RDDScanExec",  # only from tiny createDataFrame locals in this repo
}

_AGG_NODES = {
    "HashAggregateExec",
    "SortAggregateExec",
    "ObjectHashAggregateExec",
}


def _simple_name(node) -> str:
    return node.getClass().getSimpleName()


def _unwrap(node):
    """Follow AQE / query-stage / reuse wrappers to the real operator.

    Returns (node, extra_plans) where extra_plans are separately-rooted
    plans to ALSO sweep for offenders (cached relations).
    """
    extra = []
    while True:
        name = _simple_name(node)
        if name == "AdaptiveSparkPlanExec":
            node = node.executedPlan()
        elif name in ("ShuffleQueryStageExec", "BroadcastQueryStageExec",
                      "TableCacheQueryStageExec", "ResultQueryStageExec"):
            node = node.plan()
        elif name in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            node = node.child()
        elif name in ("WholeStageCodegenExec", "InputAdapter"):
            node = node.child()
        elif name == "InMemoryTableScanExec":
            extra.append(node.relation().cachedPlan())
            return node, extra
        else:
            return node, extra


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _analyze(node, offenders: list[str], extras: list) -> bool:
    """Bottom-up: returns True iff the subtree's output row count is a
    small constant regardless of input scale; appends offending
    single-partition exchanges to ``offenders``."""
    node, extra = _unwrap(node)
    extras.extend(extra)
    name = _simple_name(node)

    if name in _BOUNDED_LEAVES:
        return True
    if name == "InMemoryTableScanExec":
        return False  # cached corpus; its own plan is swept via extras

    kids = _children(node)
    kid_bounded = [_analyze(k, offenders, extras) for k in kids]

    if name in _LIMIT_NODES:
        return True
    if name in _AGG_NODES:
        try:
            if node.groupingExpressions().size() == 0:
                return True
        except Exception:  # pragma: no cover - py4j API drift
            pass
        return all(kid_bounded) if kid_bounded else False
    if name == "ShuffleExchangeExec":
        bounded = all(kid_bounded) if kid_bounded else False
        if not bounded and "SinglePartition" in str(node.outputPartitioning()):
            child_desc = _simple_name(_unwrap(kids[0])[0]) if kids else "?"
            offenders.append(
                f"Exchange SinglePartition over unbounded {child_desc}"
            )
        return bounded
    if not kids:
        return False  # unknown leaf (file scan, range, stream source)
    return all(kid_bounded)


def unbounded_single_partition_exchanges(df: DataFrame) -> list[str]:
    """Offending single-partition exchanges in ``df``'s executed plan
    (call after an action so the AQE plan is final). Also sweeps the
    plans of cached relations the query reads."""
    root = df._jdf.queryExecution().executedPlan()
    offenders: list[str] = []
    pending = [root]
    seen: set[int] = set()
    while pending:
        plan = pending.pop()
        try:
            key = plan.id()
        except Exception:  # pragma: no cover
            key = id(plan)
        if key in seen:
            continue
        seen.add(key)
        extras: list = []
        _analyze(plan, offenders, extras)
        pending.extend(extras)
    return offenders
