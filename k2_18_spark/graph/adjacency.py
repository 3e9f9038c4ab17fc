"""Adjacency preparation shared by every superstep algorithm.

The edge DataFrame IS the graph (SURVEY.md §1.1). Before any iterative
loop we build, once:

- the *metrics view*: at most one edge per (src,dst) — the reference's
  NetworkX DiGraph collapses parallel typed edges last-writer-wins in
  file order (reference viz/graph2metrics.py:163-170); keeping the last
  edge per pair by ``edge_order`` reproduces its numbers bit-for-bit.
- CSR-style layout: edges hash-partitioned by ``src_id`` and sorted
  within partitions, persisted once and reused by every superstep so
  the per-iteration rank join shuffles only the (much smaller) rank
  vector, never the edge table.
- the vertex set (nodes table if given, else distinct endpoints).

Skew (north_rule): hub vertices are split out by out-degree; the
superstep join handles them with a broadcast of the hub rank slice
(the top-k degree tail) while the long tail goes through the normal
shuffle join. ``groupBy(dst)`` aggregations need no manual salting —
Spark's partial (map-side) hash aggregation already combines per input
partition, which bounds any hub destination's final-stage fan-in by the
partition count, i.e. partial agg IS the salt.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel


def metrics_view(edges: DataFrame) -> DataFrame:
    """Collapse to the last edge per (src,dst) in file order.

    Output columns: src_id, dst_id, edge_type, weight (missing → 1.0).
    """
    collapsed = _collapse_multi(edges)
    return collapsed.withColumn("weight", F.coalesce(F.col("weight"), F.lit(1.0)))


def _collapse_multi(edges: DataFrame) -> DataFrame:
    """One row per (src,dst): last by ``edge_order`` when present, else a
    DETERMINISTIC tie-break over the remaining columns (desc weight, then
    desc on everything else) — ``dropDuplicates`` would keep an arbitrary
    row, making PageRank on a multigraph vary across runs/partitionings.

    Implemented as ``max(struct(...))`` — a HASH aggregate with map-side
    partial combine — instead of a row_number window: same row selected
    (struct comparison is lexicographic with nulls low, i.e. the window's
    desc_nulls_last), but no per-partition sort and parallel edges
    collapse before the exchange instead of after it."""
    rest = [c for c in edges.columns if c not in ("src_id", "dst_id")]
    if "edge_order" in edges.columns:
        keep = [c for c in rest if c != "edge_order"]
        ordered = ["edge_order"] + keep
    else:
        keep = rest
        ordered = rest
        if not ordered:  # bare (src,dst) pairs — already collapse-invariant
            return edges.dropDuplicates(["src_id", "dst_id"])
    agg = edges.groupBy("src_id", "dst_id").agg(
        F.max(F.struct(*[F.col(c) for c in ordered])).alias("_m")
    )
    return agg.select(
        "src_id", "dst_id", *[F.col(f"_m.{c}").alias(c) for c in keep]
    )


def vertex_ids(edges: DataFrame, nodes: DataFrame | None) -> DataFrame:
    """Vertex set as a single-column ('id') DataFrame."""
    if nodes is not None:
        return nodes.select(F.col("id"))
    return (
        edges.select(F.col("src_id").alias("id"))
        .union(edges.select(F.col("dst_id").alias("id")))
        .distinct()
    )


def dense_vertex_ids(
    verts: DataFrame, id_col: str = "id", out_col: str = "ord"
) -> DataFrame:
    """→ (id_col, out_col): deterministic dense longs 0..n-1 in
    ``id_col`` order, WITHOUT a single-task global sort.

    Two-phase numbering: range-partition by id (distributed sort),
    number within each partition in parallel, then add per-partition
    offsets computed from one driver aggregate over numPartitions rows.
    Range boundaries come from sampling but the produced numbering is
    boundary-invariant (ranges are ordered, windows order within). This
    is the superstep vertex ENCODING: every iterative algorithm joins
    and shuffles these longs instead of the (arbitrarily long, e.g.
    URL) string ids."""
    parts = (
        verts.select(id_col)
        .distinct()
        .repartitionByRange(F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    running, offsets = 0, {}
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = running
        running += r["c"]
    w = Window.partitionBy("_pid").orderBy(id_col)
    # zero-arg create_map() types as map<void,void> and can't be indexed
    # by an int — an empty input needs an explicit typed empty map
    if offsets:
        mapping = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    else:
        mapping = F.lit(None).cast("map<int,long>")
    out = parts.select(
        id_col,
        (F.row_number().over(w) - 1 + F.coalesce(mapping[F.col("_pid")], F.lit(0)))
        .cast("long")
        .alias(out_col),
    ).localCheckpoint(eager=True)
    parts.unpersist()
    return out


@dataclass
class Adjacency:
    """Prepared, persisted adjacency for superstep loops.

    Vertices are dictionary-ENCODED: ``src_id``/``dst_id`` in ``edges``
    and ``id`` in ``vertices`` are dense longs (``dense_vertex_ids``
    order), so every per-superstep join/shuffle moves 8-byte keys
    instead of string ids; ``vertices.orig_id`` decodes back."""

    edges: DataFrame  # src_id(long), dst_id(long), frac (weight/out_wsum)
    vertices: DataFrame  # id(long), orig_id, dangling, out_wsum, out_deg
    hub_ids: list  # top-k out-degree encoded ids (skew tail)
    edges_hub: DataFrame | None  # src_id ∈ hub_ids (pre-split, persisted)
    edges_tail: DataFrame | None  # the long tail
    n: int  # |V|

    def unpersist(self) -> None:
        self.edges.unpersist()
        self.vertices.unpersist()
        for df in (self.edges_hub, self.edges_tail):
            if df is not None:
                df.unpersist()


def build_adjacency(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    num_partitions: int | None = None,
    hub_top_k: int = 256,
    encode: str = "hash",
) -> Adjacency:
    """Build the reusable adjacency for PageRank-style supersteps.

    One pass computes per-src out-weight sums; each edge gets
    ``frac = weight / out_wsum`` so the per-iteration contribution is a
    single multiply (no per-iteration normalization job). Edges are
    repartitioned by src_id (CSR-style bucketing) and persisted.

    ``encode``: vertex-id encoding strategy. "hash" (default) encodes
    inline with xxhash64 — ZERO extra joins at build (an expression on
    each edge row), deterministic, resume-safe — and verifies
    injectivity with one |V| aggregate, falling back to "dense"
    (two-phase dense numbering + two encode joins) on the
    astronomically-rare collision. PageRank doesn't need ORDERED ids,
    only unique ones; components/LPA keep dense order encoding because
    their labels double as renumbering keys.
    """
    from k2_18_spark.session import superstep_conf

    with superstep_conf(edges.sparkSession):
        return _build_adjacency(edges, nodes, num_partitions, hub_top_k, encode)


def _build_adjacency(
    edges: DataFrame,
    nodes: DataFrame | None,
    num_partitions: int | None,
    hub_top_k: int,
    encode: str = "hash",
) -> Adjacency:
    # staging persist (r6, guide §1.2): the build reads the input edge
    # PLAN at least twice — once for the collapse chain, once for the
    # vertex set when ``nodes`` is None. When ``edges`` is an expensive
    # upstream plan (e.g. the co-supplier lineitem self-join behind the
    # driver-contract graph queries) that doubled its cost. Cache a
    # derived copy (select("*") so an already-persisted caller frame
    # keeps its own storage level), release before returning — every
    # Adjacency output is materialized by then.
    edges = edges.select("*").persist(StorageLevel.MEMORY_AND_DISK)
    # vertex encoding FIRST (deterministic, so a resumed job re-derives
    # the identical encoding), then one shuffle builds the rest:
    # hash(src_id) partitioning satisfies the clustering requirement of
    # the (src,dst) collapse, the out-weight aggregate, AND the
    # normalization join (subset rule), so everything below the
    # repartition is exchange-free.
    raw = edges.select("src_id", "dst_id", "weight", *(
        ["edge_order"] if "edge_order" in edges.columns else []
    ))
    if encode == "hash":
        vb = vertex_ids(edges, nodes)
        # injectivity of the xxhash64 encoding is verified LATER, fused
        # into the verts aggregate (count vs countDistinct in the same
        # pass) — one |V| action instead of two
        vmap_dec = vb.select(F.col("id").alias("orig_id"), F.xxhash64("id").alias("id"))
        raw = raw.select(
            F.xxhash64("src_id").alias("src_id"),
            F.xxhash64("dst_id").alias("dst_id"),
            "weight",
            *(["edge_order"] if "edge_order" in edges.columns else []),
        )
    else:
        vmap = dense_vertex_ids(vertex_ids(edges, nodes))  # (id, ord)
        vmap_dec = vmap.select(F.col("ord").alias("id"), F.col("id").alias("orig_id"))
        enc_src = vmap.select(F.col("id").alias("src_id"), F.col("ord").alias("_vs"))
        enc_dst = vmap.select(F.col("id").alias("dst_id"), F.col("ord").alias("_vd"))
        raw = (
            raw.join(enc_src.hint("shuffle_hash"), "src_id")
            .join(enc_dst.hint("shuffle_hash"), "dst_id")
            .select(
                F.col("_vs").alias("src_id"),
                F.col("_vd").alias("dst_id"),
                "weight",
                *(["edge_order"] if "edge_order" in edges.columns else []),
            )
        )
    if num_partitions:
        raw = raw.repartition(num_partitions, "src_id")
    else:
        raw = raw.repartition("src_id")
    collapsed = _collapse_multi(raw).withColumn(
        "weight", F.coalesce(F.col("weight"), F.lit(1.0))
    )
    # build-scoped cache: the collapse feeds both the edge
    # materialization and the per-src aggregate below
    collapsed = collapsed.persist(StorageLevel.MEMORY_AND_DISK)

    # frac via a window-sum over the EXISTING src partitioning: the
    # window's clustering requirement is satisfied by the repartition
    # above (subset rule) and an unordered frame needs no sort, so this
    # replaces the old groupBy + |E|-row normalization join with a
    # second pass over the same partitions — one fewer |E| join at build
    wsrc = Window.partitionBy("src_id")
    e = (
        collapsed.select(
            "src_id",
            "dst_id",
            (F.col("weight") / F.sum("weight").over(wsrc)).alias("frac"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()  # materialize now — supersteps must not pay the build

    out_w = collapsed.groupBy("src_id").agg(
        F.sum("weight").alias("out_wsum"), F.count(F.lit(1)).alias("out_deg")
    )
    verts = (
        vmap_dec
        .join(out_w.withColumnRenamed("src_id", "id"), "id", "left")
        .select(
            "id",
            "orig_id",
            F.col("out_wsum").isNull().alias("dangling"),
            F.coalesce(F.col("out_wsum"), F.lit(0.0)).alias("out_wsum"),
            F.coalesce(F.col("out_deg"), F.lit(0)).alias("out_deg"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if encode == "hash":
        # fused injectivity check: one aggregate gives |V| AND the
        # distinct encoded-id count; mismatch = 64-bit collision →
        # rebuild with join-based dense encoding
        vstats = verts.agg(
            F.count(F.lit(1)).alias("n"), F.countDistinct("id").alias("nd")
        ).collect()[0]
        n = vstats["n"]
        if n != vstats["nd"]:
            for df in (e, verts, collapsed):
                df.unpersist()
            out = _build_adjacency(
                edges, nodes, num_partitions, hub_top_k, "dense"
            )
            edges.unpersist()
            return out
    else:
        n = verts.count()

    hub_ids: list = []
    edges_hub = edges_tail = None
    if hub_top_k and hub_top_k > 0:
        # adaptive: splitting pays only under real skew — a hub source
        # whose out-degree dwarfs the average would otherwise pin one
        # join partition. Below 32× avg the plain shuffle join + AQE
        # skew handling is cheaper than the extra union stage.
        stats = out_w.agg(
            F.max("out_deg").alias("mx"), F.avg("out_deg").alias("av")
        ).collect()[0]
        if stats["mx"] and stats["av"] and stats["mx"] >= 32 * stats["av"]:
            hub_ids = [
                r["src_id"]
                for r in out_w.filter(
                    F.col("out_deg") >= 32 * stats["av"]
                )
                .orderBy(F.col("out_deg").desc())
                .limit(hub_top_k)
                .select("src_id")
                .collect()
            ]
    if hub_ids:
        is_hub = F.col("src_id").isin(hub_ids)
        edges_hub = e.filter(is_hub).persist(StorageLevel.MEMORY_AND_DISK)
        edges_tail = e.filter(~is_hub).persist(StorageLevel.MEMORY_AND_DISK)
        edges_hub.count()
        edges_tail.count()
    collapsed.unpersist()
    edges.unpersist()
    return Adjacency(
        edges=e,
        vertices=verts,
        hub_ids=hub_ids,
        edges_hub=edges_hub,
        edges_tail=edges_tail,
        n=n,
    )
