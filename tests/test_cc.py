"""Connected components vs networkx (SURVEY §5.2.4), incl. adversarial
hot-node stars (the water/ethanol skew scenario)."""

import networkx as nx
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kgx.canon.cc import connected_components

pytestmark = pytest.mark.usefixtures("spark")


def _run_cc(spark, edges, hot_threshold=50):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df, hot_threshold=hot_threshold).collect()
    return {r["node_id"]: r["component_id"] for r in rows}


def _nx_components(edges):
    g = nx.Graph()
    g.add_edges_from(edges)
    out = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for n in comp:
            out[n] = m
    return out


def test_two_components(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    assert _run_cc(spark, edges) == _nx_components(edges)


def test_hot_star_with_bridge(spark):
    # node 0 is "water": a hot star, plus a chain bridging two stars
    edges = [(0, i) for i in range(100, 400)] + [(1, i) for i in range(400, 700)]
    edges += [(0, 5), (5, 1)]  # bridge -> one giant component
    got = _run_cc(spark, edges, hot_threshold=50)
    assert got == _nx_components(edges)
    assert set(got.values()) == {0}


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_graphs_match_networkx(spark, edges):
    assert _run_cc(spark, edges) == _nx_components(edges)
