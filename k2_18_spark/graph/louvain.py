"""Driver-side Louvain clustering — the G4 fixture-scale parity path.

The reference clusters with ``community_louvain.best_partition(UG,
weight="weight", resolution=config, random_state=42)`` and renumbers
clusters by min node id (viz/graph2metrics.py:417-511). python-louvain
is not installable in every environment (absent from this sandbox), so
this module reimplements ``best_partition`` from the published
python-louvain 0.16 algorithm: seeded ``numpy.RandomState`` node-order
shuffles, one-level greedy modularity moves with the 0.16 gain formula
(``remove_cost + dnc − resolution·Σ_tot·k_i/2m``), first-break-on-
``__MIN`` dendrogram levels, and the same induced-graph contraction.
Iteration orders follow the same ``networkx.Graph`` adjacency/insertion
orders the real library sees, so tie-breaking behaves identically for
a graph built in the same edge order.

This is a DRIVER-side algorithm by design: modularity optimization is
inherently sequential/seeded (SURVEY §7.2); the distributed scale path
is LPA (graph/lpa.py). ``louvain_clustering`` guards the collect with a
hard budget and raises above it rather than silently degrading.
"""

from __future__ import annotations

import networkx as nx
import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__PASS_MAX = -1
__MIN = 0.0000001


class _Status:
    """Mirror of python-louvain's Status (community_louvain.Status)."""

    def __init__(self):
        self.node2com = {}
        self.total_weight = 0.0
        self.degrees = {}
        self.gdegrees = {}
        self.internals = {}
        self.loops = {}

    def init(self, graph, weight):
        self.__init__()
        self.total_weight = graph.size(weight=weight)
        for count, node in enumerate(graph.nodes()):
            self.node2com[node] = count
            deg = float(graph.degree(node, weight=weight))
            self.degrees[count] = deg
            self.gdegrees[node] = deg
            edge_data = graph.get_edge_data(node, node, default={weight: 0})
            self.loops[node] = float(edge_data.get(weight, 1))
            self.internals[count] = self.loops[node]


def _randomize(items, rng):
    items = list(items)
    rng.shuffle(items)
    return items


def _neighcom(node, graph, status, weight_key):
    weights = {}
    for neighbor, datas in graph[node].items():
        if neighbor != node:
            w = datas.get(weight_key, 1)
            com = status.node2com[neighbor]
            weights[com] = weights.get(com, 0) + w
    return weights


def _remove(node, com, weight, status):
    status.degrees[com] = status.degrees.get(com, 0.0) - status.gdegrees.get(
        node, 0.0
    )
    status.internals[com] = float(
        status.internals.get(com, 0.0) - weight - status.loops.get(node, 0.0)
    )
    status.node2com[node] = -1


def _insert(node, com, weight, status):
    status.node2com[node] = com
    status.degrees[com] = status.degrees.get(com, 0.0) + status.gdegrees.get(
        node, 0.0
    )
    status.internals[com] = float(
        status.internals.get(com, 0.0) + weight + status.loops.get(node, 0.0)
    )


def _modularity(status, resolution):
    links = float(status.total_weight)
    result = 0.0
    for community in set(status.node2com.values()):
        in_degree = status.internals.get(community, 0.0)
        degree = status.degrees.get(community, 0.0)
        if links > 0:
            result += in_degree * resolution / links - (degree / (2.0 * links)) ** 2
    return result


def _one_level(graph, status, weight_key, resolution, rng):
    modified = True
    nb_pass_done = 0
    cur_mod = _modularity(status, resolution)
    new_mod = cur_mod
    while modified and nb_pass_done != __PASS_MAX:
        cur_mod = new_mod
        modified = False
        nb_pass_done += 1
        for node in _randomize(graph.nodes(), rng):
            com_node = status.node2com[node]
            degc_totw = status.gdegrees.get(node, 0.0) / (
                status.total_weight * 2.0
            )
            neigh_communities = _neighcom(node, graph, status, weight_key)
            remove_cost = -neigh_communities.get(com_node, 0) + resolution * (
                status.degrees.get(com_node, 0.0)
                - status.gdegrees.get(node, 0.0)
            ) * degc_totw
            _remove(node, com_node, neigh_communities.get(com_node, 0.0), status)
            best_com = com_node
            best_increase = 0
            for com, dnc in _randomize(neigh_communities.items(), rng):
                incr = remove_cost + dnc - resolution * status.degrees.get(
                    com, 0.0
                ) * degc_totw
                if incr > best_increase:
                    best_increase = incr
                    best_com = com
            _insert(node, best_com, neigh_communities.get(best_com, 0.0), status)
            if best_com != com_node:
                modified = True
        new_mod = _modularity(status, resolution)
        if new_mod - cur_mod < __MIN:
            break


def _renumber(dictionary):
    values = set(dictionary.values())
    target = set(range(len(values)))
    if values == target:
        return dictionary.copy()
    renumbering = dict(zip(target.intersection(values), target.intersection(values)))
    renumbering.update(
        dict(zip(values.difference(target), target.difference(values)))
    )
    return {k: renumbering[v] for k, v in dictionary.items()}


def _induced_graph(partition, graph, weight):
    ret = nx.Graph()
    ret.add_nodes_from(partition.values())
    for node1, node2, datas in graph.edges(data=True):
        edge_weight = datas.get(weight, 1)
        com1, com2 = partition[node1], partition[node2]
        w_prec = ret.get_edge_data(com1, com2, {weight: 0}).get(weight, 1)
        ret.add_edge(com1, com2, **{weight: w_prec + edge_weight})
    return ret


def best_partition(
    graph: "nx.Graph",
    weight: str = "weight",
    resolution: float = 1.0,
    random_state: int = 42,
) -> dict:
    """python-louvain-0.16 ``best_partition`` semantics on an undirected
    ``nx.Graph`` → {node: community_int}."""
    rng = np.random.RandomState(random_state)
    if graph.number_of_edges() == 0:
        return {node: i for i, node in enumerate(graph.nodes())}
    current_graph = graph.copy()
    status = _Status()
    status.init(current_graph, weight)
    status_list = []
    _one_level(current_graph, status, weight, resolution, rng)
    new_mod = _modularity(status, resolution)
    partition = _renumber(status.node2com)
    status_list.append(partition)
    mod = new_mod
    current_graph = _induced_graph(partition, current_graph, weight)
    status.init(current_graph, weight)
    while True:
        _one_level(current_graph, status, weight, resolution, rng)
        new_mod = _modularity(status, resolution)
        if new_mod - mod < __MIN:
            break
        partition = _renumber(status.node2com)
        status_list.append(partition)
        mod = new_mod
        current_graph = _induced_graph(partition, current_graph, weight)
        status.init(current_graph, weight)
    # partition_at_level(dendrogram, len-1)
    final = status_list[0].copy()
    for index in range(1, len(status_list)):
        for node, community in final.items():
            final[node] = status_list[index][community]
    return final


def louvain_clustering(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    resolution: float = 1.0,
    random_state: int = 42,
    max_collect: int = 1_000_000,
) -> DataFrame:
    """Reference ``compute_louvain_clustering`` as a DataFrame wrapper:
    → (id, cluster_id) with clusters renumbered by min node id
    (viz/graph2metrics.py:493-505). The edge table is collected to the
    driver (count-guarded BEFORE collecting; raises above
    ``max_collect`` — use graph/lpa.py at scale). Weights are sanitized
    the way the reference does before clustering (missing→1.0, ≤0→eps;
    viz/graph2metrics.py:387-414), and parallel typed edges collapse
    last-writer-wins first (the nx.DiGraph metrics view)."""
    from k2_18_spark.graph.adjacency import metrics_view

    # self-loops removed per sanitize_graph_weights (:400-402)
    e = (
        metrics_view(edges)
        .filter(F.col("src_id") != F.col("dst_id"))
        .select(
            "src_id",
            "dst_id",
            F.when(
                F.coalesce(F.col("weight"), F.lit(1.0)) <= 0, F.lit(1e-9)
            ).otherwise(F.coalesce(F.col("weight"), F.lit(1.0))).alias("weight"),
        )
    )
    n_edges = e.count()
    if n_edges > max_collect:
        raise RuntimeError(
            f"louvain_clustering collects the edge list to the driver; "
            f"{n_edges} edges exceeds max_collect={max_collect}. Use "
            "label_propagation (graph/lpa.py) for graphs this size."
        )
    rows = e.collect()
    node_rows = (
        [r["id"] for r in nodes.select("id").collect()]
        if nodes is not None
        else sorted({r["src_id"] for r in rows} | {r["dst_id"] for r in rows})
    )

    if not node_rows:
        return spark.createDataFrame([], "id string, cluster_id int")
    if len(node_rows) == 1:
        return spark.createDataFrame(
            [(node_rows[0], 0)], "id string, cluster_id int"
        )

    # undirected projection, bidirectional weights summed (U2 —
    # viz/graph2metrics.py:459-472), isolated nodes appended after
    ug = nx.Graph()
    for r in rows:
        u, v, w = r["src_id"], r["dst_id"], float(r["weight"])
        if ug.has_edge(u, v):
            ug[u][v]["weight"] += w
        else:
            ug.add_edge(u, v, weight=w)
    for node in node_rows:
        if node not in ug:
            ug.add_node(node)

    partition = best_partition(
        ug, resolution=resolution, random_state=random_state
    )

    clusters: dict[int, list] = {}
    for node, cid in partition.items():
        clusters.setdefault(cid, []).append(node)
    out = []
    for new_id, (_, members) in enumerate(
        sorted(clusters.items(), key=lambda kv: min(kv[1]))
    ):
        out.extend((m, new_id) for m in members)
    return spark.createDataFrame(sorted(out), "id string, cluster_id int")
