"""Bow-tie decomposition of a directed web graph.

Broder et al., "Graph structure in the Web" (WWW 2000) — THE
canonical structural taxonomy of a crawl-scale link graph: every
vertex falls into exactly one region relative to the giant strongly
connected component. The reference has no equivalent (its graphs are
curated knowledge graphs); this extends the engine's web-analysis
family (G1 PageRank, G5 SCC, G16 HITS, W1 host rollup) with the
measurement every Common-Crawl-style corpus report leads with.

Regions (one ``region`` label per vertex, complete partition):

- ``CORE``          — the chosen SCC (largest; ties broken by min
                      ``scc_id``, deterministic).
- ``IN``            — reaches CORE, not in it.
- ``OUT``           — reachable from CORE, not in it.
- ``TUBE``          — on an IN→OUT path that avoids CORE.
- ``TENDRIL_IN``    — reachable from IN, cannot reach OUT or CORE.
- ``TENDRIL_OUT``   — reaches OUT, not reachable from IN or CORE.
- ``TENDRIL_OTHER`` — in CORE's weakly connected component but none
                      of the above (e.g. a vertex that only points
                      INTO a tendril). Broder's paper lumps these
                      into "tendrils"; the split label keeps the
                      partition information-preserving.
- ``DISCONNECTED``  — outside CORE's weakly connected component.

Set algebra (all directed closures include their seeds):
F = fwd-reach(CORE), B = bwd-reach(CORE). F ∩ B = CORE exactly
(any vertex in both would be in CORE's SCC). OUT = F − CORE,
IN = B − CORE. On the remainder R = V − F − B:
Fin  = fwd-reach(IN)  ∩ R   (closure seeded at IN, blocked at F ∪ B:
Bout = bwd-reach(OUT) ∩ R    a path through CORE only reaches F ⊆ ¬R,
                             so blocking loses nothing and skips
                             re-walking the giant component)
TUBE = Fin ∩ Bout, TENDRIL_IN = Fin − Bout, TENDRIL_OUT = Bout − Fin.
The leftover splits by one undirected closure seeded at everything
already classified (= CORE's weak component, reached in few rounds
because the seeds already blanket it).

Spark plan: SCC comes from the house decomposition (G5: trim-peel +
Tarjan/FW-BW auto tier). Each closure is a frontier superstep —
per round ONE shuffle-hash join of the (small) frontier against the
persisted from_id-partitioned edge table plus an anti-join against
the visited set; frontier and visited are re-checkpointed per round
(lazy plan truncation, the house idiom), so cost per round is
O(frontier out-degree), not O(|E|). Rounds = directed diameter —
the same bound every other superstep loop here carries. Nothing
collects to the driver except the 1-row core-component choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

REGIONS = (
    "CORE",
    "IN",
    "OUT",
    "TUBE",
    "TENDRIL_IN",
    "TENDRIL_OUT",
    "TENDRIL_OTHER",
    "DISCONNECTED",
)


def _reach(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    blocked: DataFrame | None = None,
    max_rounds: int = 10_000,
) -> DataFrame:
    """Directed closure: seeds ∪ every vertex reachable from them over
    ``edges`` (from_id, to_id), never expanding into ``blocked``.
    → single-column (id). Frontier superstep, one edge join/round."""
    visited = seeds.select("id").distinct().localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_rounds):
        nxt = (
            edges.join(
                frontier.withColumnRenamed("id", "from_id").hint("shuffle_hash"),
                "from_id",
                "left_semi",
            )
            .select(F.col("to_id").alias("id"))
            .distinct()
            .join(visited.hint("shuffle_hash"), "id", "left_anti")
        )
        if blocked is not None:
            nxt = nxt.join(blocked.hint("shuffle_hash"), "id", "left_anti")
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def bowtie_decomposition(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    scc_method: str = "auto",
    num_partitions: int | None = None,
) -> DataFrame:
    """→ (id, region) — the Broder bow-tie partition of the directed
    graph, one row per vertex, ``region`` ∈ REGIONS."""
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _bowtie(spark, edges, nodes, scc_method, num_partitions)


def _bowtie(spark, edges, nodes, scc_method, num_partitions) -> DataFrame:
    from k2_18_spark.graph.adjacency import vertex_ids
    from k2_18_spark.graph.scc import strongly_connected_components

    verts = vertex_ids(edges, nodes).persist(StorageLevel.MEMORY_AND_DISK)
    e = (
        edges.select(
            F.col("src_id").alias("from_id"), F.col("dst_id").alias("to_id")
        )
        .filter(F.col("from_id") != F.col("to_id"))
        .distinct()
    )
    if num_partitions:
        e = e.repartition(num_partitions, "from_id")
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    rev = e.select(
        F.col("to_id").alias("from_id"), F.col("from_id").alias("to_id")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # 1. giant SCC (largest member count, ties → min scc_id: the choice
    # is a 1-row driver scalar, never the component itself)
    scc = strongly_connected_components(
        spark, edges, nodes=nodes, method=scc_method
    ).persist(StorageLevel.MEMORY_AND_DISK)
    top = (
        scc.groupBy("scc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("scc_id"))
        .limit(1)
        .collect()
    )
    if not top:  # vertexless graph
        return spark.createDataFrame([], "id string, region string")
    core_id = top[0]["scc_id"]
    core = (
        scc.filter(F.col("scc_id") == F.lit(core_id))
        .select("id")
        .localCheckpoint(eager=True)
    )

    # 2. directed closures around CORE
    fwd = _reach(spark, e, core)  # F ⊇ CORE
    bwd = _reach(spark, rev, core)  # B ⊇ CORE
    f_or_b = fwd.union(bwd).distinct().localCheckpoint(eager=True)
    out_set = fwd.join(bwd.hint("shuffle_hash"), "id", "left_anti").localCheckpoint(
        eager=True
    )
    in_set = bwd.join(fwd.hint("shuffle_hash"), "id", "left_anti").localCheckpoint(
        eager=True
    )

    # 3. tendrils/tubes on the remainder (closures blocked at F ∪ B,
    # so they never re-walk the giant component)
    fin = _reach(spark, e, in_set, blocked=f_or_b).join(
        in_set, "id", "left_anti"
    )
    bout = _reach(spark, rev, out_set, blocked=f_or_b).join(
        out_set, "id", "left_anti"
    )
    fin = fin.localCheckpoint(eager=True)
    bout = bout.localCheckpoint(eager=True)
    tube = fin.join(bout, "id", "left_semi")
    t_in = fin.join(bout, "id", "left_anti")
    t_out = bout.join(fin, "id", "left_anti")

    # 4. CORE's weak component: undirected closure seeded at everything
    # already classified (the seeds blanket the component → few rounds)
    sym = e.union(rev)
    classified = (
        f_or_b.union(fin.select("id"))
        .union(bout.select("id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    weak = _reach(spark, sym, classified)

    labeled = (
        core.withColumn("region", F.lit("CORE"))
        .unionByName(in_set.withColumn("region", F.lit("IN")))
        .unionByName(out_set.withColumn("region", F.lit("OUT")))
        .unionByName(tube.withColumn("region", F.lit("TUBE")))
        .unionByName(t_in.withColumn("region", F.lit("TENDRIL_IN")))
        .unionByName(t_out.withColumn("region", F.lit("TENDRIL_OUT")))
    )
    rest = verts.join(labeled.select("id"), "id", "left_anti").join(
        weak.withColumn("in_weak", F.lit(True)).hint("shuffle_hash"), "id", "left"
    )
    rest = rest.select(
        "id",
        F.when(F.col("in_weak"), F.lit("TENDRIL_OTHER"))
        .otherwise(F.lit("DISCONNECTED"))
        .alias("region"),
    )
    return labeled.unionByName(rest)


def bowtie_summary(decomposition: DataFrame) -> DataFrame:
    """→ (region, n_vertices) — the headline bow-tie table, ordered by
    the canonical region sequence."""
    order = F.array(*[F.lit(r) for r in REGIONS])
    return (
        decomposition.groupBy("region")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .withColumn("_ord", F.array_position(order, F.col("region")))
        .orderBy("_ord")
        .drop("_ord")
    )
