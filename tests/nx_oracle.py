"""NetworkX oracle helpers for golden-fixture parity tests.

Builds the same DiGraph the reference builds
(viz/graph2metrics.py:138-187: parallel typed edges collapse
last-writer-wins) so nx results are the ground truth the engine must
match at allclose 1e-6 (north_rule)."""

from __future__ import annotations

import networkx as nx


def to_nx(data: dict) -> nx.DiGraph:
    g = nx.DiGraph()
    for node in data.get("nodes", []):
        g.add_node(node["id"], **{k: v for k, v in node.items() if k != "id"})
    for edge in data.get("edges", []):
        g.add_edge(
            edge["source"],
            edge["target"],
            **{k: v for k, v in edge.items() if k not in ("source", "target")},
        )
    return g


def pagerank_power(
    g: nx.DiGraph,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
    weight: str = "weight",
    personalization: dict | None = None,
) -> dict:
    """Pure-Python power iteration with NetworkX's exact semantics
    (uniform or explicit personalization, dangling mass to the
    personalization vector, L1 convergence err < n*tol). scipy is
    unavailable in this sandbox, so this stands in for nx.pagerank as
    the test oracle."""
    n = g.number_of_nodes()
    if n == 0:
        return {}
    nodes = list(g.nodes())
    x = {u: 1.0 / n for u in nodes}
    if personalization is None:
        p = {u: 1.0 / n for u in nodes}
    else:
        s = sum(personalization.values())
        p = {u: personalization.get(u, 0.0) / s for u in nodes}
    out_wsum = {
        u: sum(d.get(weight, 1.0) for _, _, d in g.out_edges(u, data=True))
        for u in nodes
    }
    dangling = [u for u in nodes if out_wsum[u] == 0.0]
    for _ in range(max_iter):
        xlast = x
        x = {u: 0.0 for u in nodes}
        danglesum = alpha * sum(xlast[u] for u in dangling)
        for u in nodes:
            if out_wsum[u] > 0:
                for _, v, d in g.out_edges(u, data=True):
                    x[v] += alpha * xlast[u] * d.get(weight, 1.0) / out_wsum[u]
        for u in nodes:
            x[u] += danglesum * p[u] + (1.0 - alpha) * p[u]
        err = sum(abs(x[u] - xlast[u]) for u in nodes)
        if err < n * tol:
            return x
    raise RuntimeError("oracle pagerank failed to converge")


def nx_pagerank(data: dict, alpha: float = 0.85, max_iter: int = 100) -> dict:
    g = to_nx(data)
    if g.number_of_edges() == 0:
        n = g.number_of_nodes()
        return {node: 1.0 / n for node in g.nodes()} if n else {}
    return pagerank_power(g, alpha=alpha, max_iter=max_iter, weight="weight")
