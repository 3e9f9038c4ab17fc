"""k-truss extraction as an edge-peeling DataFrame loop.

The k-truss of an undirected graph is the maximal subgraph in which
every edge participates in ≥ k−2 triangles of that subgraph (Cohen,
"Trusses: cohesive subgraphs for social network analysis", 2008) — the
edge-strength refinement of the k-core, the standard community-core /
spam-filter primitive on web link graphs. The reference has no
equivalent; this extends the engine's undirected-projection family
(G3/G17) with the same edge-table contract.

Algorithm: iterative peeling over a ONE-TIME triangle incidence. The
triangles of any edge-subgraph are exactly the original triangles
whose three edges all survive, so the expensive wedge enumeration
(the O(Σ d_lo²) stage) runs ONCE; every peel round after that is
three semi-joins of the shrinking triangle table against the
surviving edge set plus one map-side-combinable support groupBy.
Round t drops every edge with support < k−2; removals destroy
triangles, so peeling cascades to a fixpoint — exactly the k-truss.

Cascade tails (e.g. a chain of triangles that exposes one new
sub-threshold edge per round) would otherwise cost O(cascade depth)
Spark jobs at fixed per-job overhead, so once the surviving edge set
fits under ``driver_finish_max_edges`` the remaining peel runs
EXACTLY in the driver over the collected incidence (O(E + T) with a
work queue) — the same guarded driver tier as the SCC post-peel core
(scc.py). The k-truss fixpoint is unique and peel-order independent,
so the tier never changes the answer, only the job count; an
adversarial chain peels in O(1) Spark rounds instead of O(|E|).

The surviving set shrinks monotonically and is re-materialized each
round (lazy localCheckpoint fused with the changed-count aggregate).
With ``checkpoint_dir`` every round writes survivors + lineage
through CheckpointStore and a killed job resumes mid-peel (the
incidence is re-derived from the restored edge set).

Semantics match ``nx.k_truss``: direction and parallel edges are
collapsed, self-loops dropped, k ≥ 2 (k=2 keeps every edge that has
both endpoints, i.e. support ≥ 0). Returns the surviving edges with
their final within-truss support — all integers, so the driver oracle
(``__spark_entry__.graph_ktruss``) compares with no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from k2_18_spark.checkpoint import CheckpointStore

# distributed peel rounds executed by the most recent k_truss call
# (driver-tier finishes add none) — observability for tests/bench
LAST_RUN_ROUNDS = 0


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    checkpoint_dir: str | None = None,
    job_name: str = "ktruss",
    max_rounds: int = 1000,
    num_partitions: int | None = None,
    driver_finish_max_edges: int = 100_000,
) -> DataFrame:
    """→ (id_a, id_b, support) of the k-truss, id_a < id_b.

    ``driver_finish_max_edges``: once the surviving edge set is at or
    under this size (and the alive triangle table under 20× it), the
    remaining cascade peels exactly in the driver — O(1) further Spark
    jobs. 0 disables the tier (pure distributed peel).
    """
    from k2_18_spark.session import superstep_conf

    if k < 2:
        raise ValueError("k must be >= 2")
    with superstep_conf(spark):
        return _ktruss_loop(
            spark, edges, k, checkpoint_dir, job_name, max_rounds,
            num_partitions, driver_finish_max_edges,
        )


def _triangles(cur: DataFrame) -> DataFrame:
    """Enumerate the triangles of the canonical edge set (a < b) once →
    one row per triangle carrying its three canonical edges
    (a1,b1,a2,b2,a3,b3). Wedges form only at each triangle's smallest-
    (degree, id) corner, so per-vertex fan-out is O(sqrt(E)) even on
    power-law graphs (same orientation trick as the triangle counter).
    """
    deg = (
        cur.select(F.col("a").alias("v"))
        .union(cur.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    oriented = (
        cur.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")).hint(
            "shuffle_hash"), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")).hint(
            "shuffle_hash"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
            )
            .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
            .alias("e"),
        )
        .select("e.lo", "e.hi")
    )
    e1 = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    wedges = e1.join(e2.hint("shuffle_hash"), "x").filter(F.col("y") < F.col("z"))
    closing = cur.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tri = wedges.join(closing.hint("shuffle_hash"), ["y", "z"], "left_semi")
    return tri.select(
        F.least("x", "y").alias("a1"), F.greatest("x", "y").alias("b1"),
        F.least("x", "z").alias("a2"), F.greatest("x", "z").alias("b2"),
        F.col("y").alias("a3"), F.col("z").alias("b3"),
    )


def _support(cur: DataFrame, tri: DataFrame) -> DataFrame:
    """Per-edge alive-triangle support → (a, b, support); edges in no
    alive triangle get 0."""
    tri_edges = (
        tri.select(F.col("a1").alias("a"), F.col("b1").alias("b"))
        .unionAll(tri.select(F.col("a2").alias("a"), F.col("b2").alias("b")))
        .unionAll(tri.select(F.col("a3").alias("a"), F.col("b3").alias("b")))
    )
    sup = tri_edges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))
    return cur.join(sup.hint("shuffle_hash"), ["a", "b"], "left").select(
        "a", "b", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def _alive(tri: DataFrame, cur: DataFrame) -> DataFrame:
    """Triangles whose three edges all survive in ``cur``."""
    for i in (1, 2, 3):
        tri = tri.join(
            cur.select(F.col("a").alias(f"a{i}"), F.col("b").alias(f"b{i}")).hint(
                "shuffle_hash"
            ),
            [f"a{i}", f"b{i}"],
            "left_semi",
        )
    return tri


def _driver_peel(
    edge_rows: list, tri_rows: list, min_support: int
) -> list[tuple]:
    """Exact in-driver cascade over the collected incidence: classic
    queue peel, O(E + T). Returns surviving (a, b, final_support)."""
    tris = [
        ((t[0], t[1]), (t[2], t[3]), (t[4], t[5])) for t in tri_rows
    ]
    sup: dict[tuple, int] = {(r[0], r[1]): 0 for r in edge_rows}
    inc: dict[tuple, list[int]] = {}
    for ti, t in enumerate(tris):
        for e in t:
            sup[e] += 1
            inc.setdefault(e, []).append(ti)
    tri_alive = [True] * len(tris)
    dead: set[tuple] = set()
    queue = [e for e, s in sup.items() if s < min_support]
    while queue:
        e = queue.pop()
        if e in dead:
            continue
        dead.add(e)
        for ti in inc.get(e, ()):
            if not tri_alive[ti]:
                continue
            tri_alive[ti] = False
            for e2 in tris[ti]:
                if e2 == e or e2 in dead:
                    continue
                sup[e2] -= 1
                if sup[e2] < min_support:
                    queue.append(e2)
    return [(a, b, sup[(a, b)]) for (a, b) in sup if (a, b) not in dead]


def _ktruss_loop(
    spark, edges, k, checkpoint_dir, job_name, max_rounds, num_partitions,
    driver_finish_max_edges,
) -> DataFrame:
    global LAST_RUN_ROUNDS
    LAST_RUN_ROUNDS = 0
    cur = (
        edges.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if num_partitions:
        cur = cur.repartition(num_partitions, "a")
    cur = cur.localCheckpoint(eager=True)

    store = (
        CheckpointStore(spark, checkpoint_dir, job_name, state_version="ktruss-v1")
        if checkpoint_dir
        else None
    )
    start = 0
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            cur = store.load_state(last).select("a", "b")
            if store.load_marker(last).get("converged"):
                return _final(cur)
            start = last + 1

    min_support = k - 2
    n_edges = cur.count()

    def _finish_in_driver(it: int) -> DataFrame | None:
        """Collect the incidence and peel exactly; None = tier declined
        (triangle table too large relative to the edge cap). ``tri`` is
        alive w.r.t. ``cur`` by loop invariant — _triangles only emits
        triangles whose edges are in the set, and the in-loop update
        semi-joins against the survivors."""
        tri_n = tri.count()
        if tri_n > 20 * driver_finish_max_edges:
            return None
        edge_rows = [(r["a"], r["b"]) for r in cur.collect()]
        tri_rows = [tuple(r) for r in tri.collect()]
        survivors = _driver_peel(edge_rows, tri_rows, min_support)
        a_type = cur.schema["a"].dataType
        out = spark.createDataFrame(
            survivors,
            T.StructType(
                [
                    T.StructField("a", a_type),
                    T.StructField("b", a_type),
                    T.StructField("support", T.LongType()),
                ]
            ),
        )
        if store is not None:
            saved = store.save_state(
                it, out.select("a", "b"), rows_in=n_edges
            )
            saved.count()
            store.annotate(it, edges=len(survivors), converged=True)
            saved.unpersist()
        return out.select(
            F.col("a").alias("id_a"), F.col("b").alias("id_b"), "support"
        )

    # one-time wedge enumeration; every later round touches only this
    # (monotonically shrinking) incidence table
    tri = _triangles(cur).localCheckpoint(eager=True)

    if driver_finish_max_edges and n_edges <= driver_finish_max_edges:
        out = _finish_in_driver(start)
        if out is not None:
            cur.unpersist(), tri.unpersist()
            return out

    converged = n_edges == 0
    it = start - 1
    # tri is lazily re-checkpointed each round; its blocks must outlive
    # the NEXT round's materialization (the new table's truncated plan
    # reads them), so releases are deferred by one round
    tri_release: DataFrame | None = None
    for it in range(start, max_rounds):
        if n_edges == 0:
            converged = True
            break
        nxt = (
            _support(cur, tri)
            .filter(F.col("support") >= min_support)
            .select("a", "b")
        )
        prev = cur
        if store is not None:
            nxt = store.save_state(it, nxt, rows_in=n_edges)
        else:
            nxt = nxt.localCheckpoint(eager=False)
        n_next = nxt.count()  # materializes nxt AND this round's tri
        LAST_RUN_ROUNDS += 1
        if tri_release is not None:
            tri_release.unpersist()
            tri_release = None
        cur = nxt
        prev.unpersist()
        converged = n_next == n_edges
        if store is not None:
            store.annotate(it, edges=n_next, converged=bool(converged))
        n_edges = n_next
        if converged:
            break
        tri_release = tri
        tri = _alive(tri, cur).localCheckpoint(eager=False)
        if driver_finish_max_edges and n_edges <= driver_finish_max_edges:
            out = _finish_in_driver(it + 1)  # materializes the new tri
            if out is not None:
                cur.unpersist(), tri_release.unpersist(), tri.unpersist()
                return out
    if not converged:
        raise RuntimeError(f"k_truss did not converge in {max_rounds} rounds")

    if tri_release is not None:
        tri_release.unpersist()
    tri.unpersist()
    return _final(cur)


def _final(cur: DataFrame) -> DataFrame:
    """Surviving edges with their within-truss support, renamed to the
    output contract (one re-enumeration on the final, small set)."""
    return _support(cur, _triangles(cur)).select(
        F.col("a").alias("id_a"), F.col("b").alias("id_b"), "support"
    )
