"""Full-pipeline golden validation — the engine-side equivalent of the
reference's `--validate` mode (462 checks over the 8 fixtures at 1%
relative / 0.001 absolute tolerance, viz/graph2metrics.py:1742-1778),
with integer metrics exact."""

import pytest

from k2_18_spark.io import fixtures
from k2_18_spark.pipeline.metrics import compute_all_metrics

INT_METRICS = ["degree_in", "degree_out", "component_id", "prerequisite_depth"]
FLOAT_METRICS = [
    ("degree_centrality", "degree_centrality"),
    ("pagerank", "pagerank"),
    ("betweenness_centrality", "betweenness_centrality"),
    ("out_closeness", "out-closeness"),
    ("learning_effort", "learning_effort"),
    ("educational_importance", "educational_importance"),
]


def close(a, b):
    if b == 0:
        return abs(a) <= 0.001
    return abs(a - b) <= 0.01 * abs(b) + 1e-9


@pytest.mark.parametrize("name", fixtures.FIXTURE_NAMES)
def test_full_pipeline_golden(spark, name):
    nodes, edges, _ = fixtures.load_fixture(spark, name)
    nodes_out, edges_out, summary = compute_all_metrics(spark, nodes, edges)
    got = {r["id"]: r.asDict() for r in nodes_out.collect()}
    checks = 0
    for nid, exp in fixtures.expected_node_metrics(name).items():
        for m in INT_METRICS:
            if m in exp:
                assert got[nid][m] == exp[m], (name, nid, m, got[nid][m], exp[m])
                checks += 1
        for ours, theirs in FLOAT_METRICS:
            if theirs in exp:
                assert close(got[nid][ours], exp[theirs]), (
                    name,
                    nid,
                    ours,
                    got[nid][ours],
                    exp[theirs],
                )
                checks += 1
    # edge metric: inverse_weight
    egot = {
        (r["src_id"], r["dst_id"], r["edge_type"]): r["inverse_weight"]
        for r in edges_out.collect()
    }
    for key, exp in fixtures.expected_edge_metrics(name).items():
        if "inverse_weight" in exp:
            assert close(egot[key], exp["inverse_weight"]), (name, key)
            checks += 1
    assert checks > 0
    assert summary["pagerank_sum_ok"] and summary["educational_importance_sum_ok"]


def test_pipeline_summary_counts(spark):
    nodes, edges, _ = fixtures.load_fixture(spark, "test_disconnected")
    _, _, summary = compute_all_metrics(spark, nodes, edges)
    want = fixtures.expected_node_metrics("test_disconnected")
    n_comp = len({v["component_id"] for v in want.values()})
    assert summary["num_components"] == n_comp
    assert summary["nodes"] == len(want)
