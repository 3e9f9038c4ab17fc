"""Global graph statistics — reciprocity and degree assortativity
(north_rule additions: the standard whole-graph health measures for a
directed web link graph; not present in the reference).

Both are single aggregates over the edge table — no driver-side state
beyond the scalar result, every step a groupBy/join with map-side
partial aggregation.

- ``reciprocity``: nx.overall_reciprocity semantics — on the simple
  directed graph (parallel edges collapsed), the fraction of directed
  edges whose reverse edge also exists; self-loops stay in the
  denominator but are never counted as reciprocated (measured against
  nx 3.6, not assumed).
- ``degree_assortativity``: nx.degree_assortativity_coefficient
  semantics on the simple undirected projection — the Pearson
  correlation of endpoint degrees over the mirrored edge list
  (each edge contributes both (deg u, deg v) and (deg v, deg u);
  self-loops dropped with the projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def reciprocity(spark: SparkSession, edges: DataFrame) -> float:
    """Fraction of directed edges with an existing reverse edge."""
    e = edges.select("src_id", "dst_id").distinct()
    rev = e.select(F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id"))
    row = (
        e.filter(F.col("src_id") != F.col("dst_id"))
        .join(rev.hint("shuffle_hash"), ["src_id", "dst_id"], "left_semi")
        .agg(F.count(F.lit(1)).alias("recip"))
        .collect()[0]
    )
    total = e.count()
    if total == 0:
        raise ValueError("reciprocity is undefined for an empty graph")
    return row["recip"] / total


def degree_assortativity(spark: SparkSession, edges: DataFrame) -> float:
    """Pearson degree-degree correlation on the undirected projection."""
    und = (
        edges.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    mirrored = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    xy = (
        mirrored.join(
            deg.select(F.col("v").alias("a"), F.col("deg").alias("x")).hint(
                "shuffle_hash"
            ),
            "a",
        )
        .join(
            deg.select(F.col("v").alias("b"), F.col("deg").alias("y")).hint(
                "shuffle_hash"
            ),
            "b",
        )
        .select(F.col("x").cast("double"), F.col("y").cast("double"))
    )
    r = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).collect()[0]
    n = r["n"]
    if n == 0:
        raise ValueError("assortativity is undefined without edges")
    cov = r["sxy"] / n - (r["sx"] / n) * (r["sy"] / n)
    vx = r["sxx"] / n - (r["sx"] / n) ** 2
    vy = r["syy"] / n - (r["sy"] / n) ** 2
    if vx == 0 or vy == 0:
        raise ValueError("assortativity is undefined on a degree-regular graph")
    return cov / (vx * vy) ** 0.5


def modularity_by_community(
    spark: SparkSession,
    edges: DataFrame,
    clusters: DataFrame,
    resolution: float = 1.0,
    directed: bool = True,
) -> DataFrame:
    """Per-community modularity contributions → (cluster_id,
    internal_w, out_w, in_w, contribution).

    nx.algorithms.community.modularity semantics (Newman; nx's
    published formula, reimplemented): directed
    ``Q_c = L_c/m − γ·Σout_c·Σin_c/m²``; undirected
    ``Q_c = L_c/m − γ·(D_c/(2m))²`` where the input edge table lists
    each undirected edge ONCE and degrees count self-loops twice.
    Parallel (src,dst) rows sum their weights (MultiDiGraph
    adjacency). ``clusters`` is (id, cluster_id); vertices missing
    from it are dropped with their edges, like passing nx a partial
    partition is an error — pass a total clustering.

    Plan: weight-collapse groupBy, two shuffle-hash joins tagging the
    endpoints with their communities, then ONE groupBy(cluster pair) →
    per-community rollup — every aggregate map-side partial, shuffle
    O(distinct cluster pairs), not O(|E|).
    """
    w = F.col("weight") if "weight" in edges.columns else F.lit(1.0)
    e = (
        edges.select(
            F.col("src_id").alias("src"),
            F.col("dst_id").alias("dst"),
            w.cast("double").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    cm = clusters.select(F.col("id"), F.col("cluster_id"))
    tagged = (
        e.join(
            cm.select(F.col("id").alias("src"), F.col("cluster_id").alias("c_src")),
            "src",
        )
        .join(
            cm.select(F.col("id").alias("dst"), F.col("cluster_id").alias("c_dst")),
            "dst",
        )
        .groupBy("c_src", "c_dst")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    if directed:
        m = tagged.agg(F.sum("w")).collect()[0][0] or 0.0
        if m == 0:
            raise ValueError("modularity is undefined for an empty graph")
        out_c = tagged.groupBy(F.col("c_src").alias("cluster_id")).agg(
            F.sum("w").alias("out_w")
        )
        in_c = tagged.groupBy(F.col("c_dst").alias("cluster_id")).agg(
            F.sum("w").alias("in_w")
        )
        intra = (
            tagged.filter(F.col("c_src") == F.col("c_dst"))
            .select(F.col("c_src").alias("cluster_id"), F.col("w"))
            .groupBy("cluster_id")
            .agg(F.sum("w").alias("internal_w"))
        )
        out = (
            out_c.join(in_c, "cluster_id", "outer")
            .join(intra, "cluster_id", "left")
            .select(
                "cluster_id",
                F.coalesce("internal_w", F.lit(0.0)).alias("internal_w"),
                F.coalesce("out_w", F.lit(0.0)).alias("out_w"),
                F.coalesce("in_w", F.lit(0.0)).alias("in_w"),
            )
            .withColumn(
                "contribution",
                F.col("internal_w") / F.lit(m)
                - F.lit(resolution)
                * F.col("out_w")
                * F.col("in_w")
                / F.lit(m * m),
            )
        )
        tagged.unpersist()
        return out
    # undirected: degree counts BOTH endpoints (self-loop → 2w)
    deg_rows = tagged.select(F.col("c_src").alias("cluster_id"), "w").unionAll(
        tagged.select(F.col("c_dst").alias("cluster_id"), "w")
    )
    deg_c = deg_rows.groupBy("cluster_id").agg(F.sum("w").alias("deg_w"))
    deg_sum = tagged.agg(F.sum(F.col("w") * F.lit(2.0))).collect()[0][0] or 0.0
    if deg_sum == 0:
        raise ValueError("modularity is undefined for an empty graph")
    m = deg_sum / 2.0
    intra = (
        tagged.filter(F.col("c_src") == F.col("c_dst"))
        .select(F.col("c_src").alias("cluster_id"), F.col("w"))
        .groupBy("cluster_id")
        .agg(F.sum("w").alias("internal_w"))
    )
    out = (
        deg_c.join(intra, "cluster_id", "left")
        .select(
            "cluster_id",
            F.coalesce("internal_w", F.lit(0.0)).alias("internal_w"),
            F.col("deg_w").alias("out_w"),
            F.col("deg_w").alias("in_w"),
        )
        .withColumn(
            "contribution",
            F.col("internal_w") / F.lit(m)
            - F.lit(resolution)
            * (F.col("out_w") / F.lit(deg_sum))
            * (F.col("in_w") / F.lit(deg_sum)),
        )
    )
    tagged.unpersist()
    return out


def conductance_by_community(
    spark: SparkSession,
    edges: DataFrame,
    clusters: DataFrame,
) -> DataFrame:
    """Per-community conductance → (cluster_id, cut_w, volume,
    conductance) — the cut-quality complement of
    :func:`modularity_by_community` (low conductance = a well-separated
    community; the objective spectral/Fiedler partitioning minimizes).

    Semantics (nx.algorithms.cuts.conductance, reimplemented): the
    edge table is an undirected weighted multigraph — parallel
    (src, dst) rows sum; each row adds w to BOTH endpoint degrees (a
    self-loop adds 2w to its vertex, nx degree semantics);
    ``cut_w(c)`` = total weight of edges with exactly one endpoint in
    c; ``volume(c)`` = Σ deg(v∈c);
    ``conductance = cut_w / min(volume, total_volume − volume)``
    (NULL for an empty or whole-graph side, where nx raises).

    Plan: identical to modularity — weight-collapse, two shuffle-hash
    community tag joins, ONE cluster-pair groupBy; everything after is
    O(distinct cluster pairs). Vertices missing from ``clusters``
    drop with their edges (pass a total clustering)."""
    w = F.col("weight") if "weight" in edges.columns else F.lit(1.0)
    e = (
        edges.select(
            F.col("src_id").alias("src"),
            F.col("dst_id").alias("dst"),
            w.cast("double").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    cm = clusters.select(F.col("id"), F.col("cluster_id"))
    tagged = (
        e.join(
            cm.select(F.col("id").alias("src"), F.col("cluster_id").alias("c_src")),
            "src",
        )
        .join(
            cm.select(F.col("id").alias("dst"), F.col("cluster_id").alias("c_dst")),
            "dst",
        )
        .groupBy("c_src", "c_dst")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    total_vol = (tagged.agg(F.sum(F.col("w") * 2)).collect()[0][0]) or 0.0
    vol = (
        tagged.select(F.col("c_src").alias("cluster_id"), "w")
        .unionByName(tagged.select(F.col("c_dst").alias("cluster_id"), "w"))
        .groupBy("cluster_id")
        .agg(F.sum("w").alias("volume"))
    )
    cut = (
        tagged.filter(F.col("c_src") != F.col("c_dst"))
        .select(F.col("c_src").alias("cluster_id"), "w")
        .unionByName(
            tagged.filter(F.col("c_src") != F.col("c_dst")).select(
                F.col("c_dst").alias("cluster_id"), "w"
            )
        )
        .groupBy("cluster_id")
        .agg(F.sum("w").alias("cut_w"))
    )
    out = (
        vol.join(cut, "cluster_id", "left")
        .select(
            "cluster_id",
            F.coalesce("cut_w", F.lit(0.0)).alias("cut_w"),
            "volume",
            (
                F.coalesce("cut_w", F.lit(0.0))
                / F.when(
                    F.least(F.col("volume"), F.lit(total_vol) - F.col("volume"))
                    > 0,
                    F.least(F.col("volume"), F.lit(total_vol) - F.col("volume")),
                )
            ).alias("conductance"),
        )
    )
    tagged.unpersist()
    return out


def modularity(
    spark: SparkSession,
    edges: DataFrame,
    clusters: DataFrame,
    resolution: float = 1.0,
    directed: bool = True,
) -> float:
    """Newman modularity Q of a clustering (nx.community.modularity
    semantics) — the sum of :func:`modularity_by_community` rows."""
    contrib = modularity_by_community(
        spark, edges, clusters, resolution=resolution, directed=directed
    )
    return float(contrib.agg(F.sum("contribution")).collect()[0][0])


def degree_histogram(
    spark: SparkSession, edges: DataFrame, direction: str = "out"
) -> DataFrame:
    """→ (degree, n_vertices): the degree distribution of the simple
    directed graph — the first artifact every webgraph release (e.g.
    the Common Crawl host graph) publishes. ``direction`` ∈
    out | in | total (total = undirected-projection degree, distinct
    neighbors). Two map-side-combinable groupBys; shuffle = O(|V|)
    then O(distinct degrees)."""
    e = edges.select("src_id", "dst_id").distinct()
    if direction == "out":
        per_v = e.groupBy(F.col("src_id").alias("id"))
    elif direction == "in":
        per_v = e.groupBy(F.col("dst_id").alias("id"))
    elif direction == "total":
        und = e.filter(F.col("src_id") != F.col("dst_id")).select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        ).distinct()
        per_v = und.select(F.col("a").alias("id")).union(
            und.select(F.col("b").alias("id"))
        ).groupBy("id")
    else:
        raise ValueError(f"unknown direction {direction!r}")
    deg = per_v.agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .orderBy("degree")
    )


def powerlaw_alpha(
    spark: SparkSession,
    edges: DataFrame,
    direction: str = "out",
    d_min: int = 1,
) -> tuple[float, int]:
    """Discrete power-law exponent MLE for the degree tail:
    α̂ = 1 + n · [Σ ln(d_i / (d_min − ½))]⁻¹ over degrees ≥ d_min
    (Clauset, Shalizi & Newman, "Power-law distributions in empirical
    data", SIAM Review 2009, eq. 3.7 — the standard estimator for the
    webgraph in/out-degree exponents, ~2.1/2.7 in Broder WWW'00).
    → (alpha, n_tail). One filtered aggregate over the per-vertex
    degree table; vertices with degree 0 never enter (they have no
    row), matching the d_i ≥ d_min ≥ 1 tail convention."""
    if d_min < 1:
        raise ValueError("d_min must be >= 1")
    hist = degree_histogram(spark, edges, direction=direction)
    row = (
        hist.filter(F.col("degree") >= d_min)
        .agg(
            F.sum(
                F.col("n_vertices")
                * F.log(F.col("degree") / F.lit(d_min - 0.5))
            ).alias("s"),
            F.sum("n_vertices").alias("n"),
        )
        .collect()[0]
    )
    n = int(row["n"] or 0)
    if n == 0:
        raise ValueError(f"no vertices with degree >= {d_min}")
    # s > 0 always holds here: every term is ln(d/(d_min-0.5)) with
    # d >= d_min > d_min - 0.5
    return 1.0 + n / float(row["s"]), n


def attribute_mixing_matrix(
    edges: DataFrame, attrs: DataFrame, directed: bool = True
) -> DataFrame:
    """Mixing matrix over a nominal vertex attribute (Newman 2003,
    "Mixing patterns in networks" §II) → (attr_src, attr_dst,
    n_edges, frac): what fraction of edges run between each attribute
    pair — language↔language or TLD↔TLD linking structure on a web
    graph. ``attrs`` is (id, attr); edges whose endpoints miss an
    attribute row are dropped (inner joins). Undirected mode counts
    each edge in both orientations (the nx convention, which makes
    the matrix symmetric).

    Scale shape: two hash joins tagging endpoints + ONE
    groupBy(attr pair) — the rollup output is O(|attr values|²),
    tiny; the |E| table shuffles only through the joins.
    """
    e = edges.select(F.col("src_id").alias("s"), F.col("dst_id").alias("t"))
    if not directed:
        e = e.unionAll(
            e.select(F.col("t").alias("s"), F.col("s").alias("t"))
        )
    a = attrs.select(F.col("id").alias("s"), F.col("attr").alias("attr_src"))
    b = attrs.select(F.col("id").alias("t"), F.col("attr").alias("attr_dst"))
    m = (
        e.join(a, "s")
        .join(b, "t")
        .groupBy("attr_src", "attr_dst")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    total = m.agg(F.sum("n_edges").alias("_tot"))
    return m.crossJoin(F.broadcast(total)).select(
        "attr_src",
        "attr_dst",
        "n_edges",
        F.round(F.col("n_edges") / F.col("_tot"), 6).alias("frac"),
    )


def attribute_assortativity(
    spark: SparkSession, edges: DataFrame, attrs: DataFrame,
    directed: bool = True,
) -> float:
    """Newman's nominal assortativity coefficient r = (Σ_i e_ii −
    Σ_i a_i b_i) / (1 − Σ_i a_i b_i), with a/b the row/column sums of
    the mixing matrix (nx.attribute_assortativity_coefficient
    semantics). r = 1 → perfectly assortative; 0 → random mixing;
    r = 1 exactly when every attribute class links only to itself
    (then the denominator is guarded — nx returns 1.0).

    Driver traffic: the O(|attr values|²) matrix only.
    """
    m = attribute_mixing_matrix(edges, attrs, directed=directed)
    # exact integer counts, not the display-rounded fracs — rounding
    # at 6dp before the coefficient loses ~1e-6 of precision vs nx
    rows = m.select("attr_src", "attr_dst", "n_edges").collect()
    from collections import defaultdict

    total = sum(r.n_edges for r in rows)
    if total == 0:
        return float("nan")
    av, bv = defaultdict(float), defaultdict(float)
    tr = 0.0
    for r in rows:
        f = r.n_edges / total
        av[r.attr_src] += f
        bv[r.attr_dst] += f
        if r.attr_src == r.attr_dst:
            tr += f
    sab = sum(av[k] * bv.get(k, 0.0) for k in av)
    if abs(1.0 - sab) < 1e-15:
        return 1.0
    return (tr - sab) / (1.0 - sab)
