"""Graph query batch (`plans/graph_queries.py`): oracle differentials plus
the structural invariants the oracle can't see."""

from __future__ import annotations

import pytest

from hadoop_map_reduce_spark.plans import REGISTRY
from tests.oracle_utils import compare_query

GRAPH = sorted(name for name, q in REGISTRY.items() if "graph" in q.tags)


@pytest.mark.parametrize("name", GRAPH)
def test_oracle_match(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_pagerank_mass_and_margin(spark, oracle_sf_dir):
    """Rank mass is conserved (no dangling nodes on the undirected graph,
    so sum(rank) == 1 up to float noise), and every rank sits far from a
    round-6 boundary relative to cross-engine summation noise — the
    condition that makes the hash-compare oracle sound for doubles."""
    rows = REGISTRY["graph_pagerank"].fn(spark, oracle_sf_dir).collect()
    total = sum(r.rank for r in rows)
    assert abs(total - 1.0) < 1e-3  # round-6 truncation per node
    margin = min(abs(r.rank * 1e6 - round(r.rank * 1e6) - 0.5) for r in rows)
    # summation noise is ~1e-17 absolute => ~1e-11 in boundary units;
    # require 6 orders of headroom
    assert margin > 1e-5


def test_degree_hist_totals(spark, oracle_sf_dir):
    hist = REGISTRY["graph_degree_hist"].fn(spark, oracle_sf_dir).collect()
    n_nodes = sum(r.n_nodes for r in hist)
    n_ranks = REGISTRY["graph_pagerank"].fn(spark, oracle_sf_dir).count()
    assert n_nodes == n_ranks > 0
