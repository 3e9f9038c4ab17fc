"""HITS hubs & authorities as a DataFrame superstep loop.

Kleinberg's HITS (Authoritative sources in a hyperlinked environment,
JACM 46(5), 1999) is the second canonical web-link-analysis algorithm
next to PageRank; the reference's metrics suite has no equivalent
(its importance measure is PageRank-family — ``viz/graph2metrics.py:
620-665``), so this is a scale-path extension of the same edge-table
contract.

Semantics are the classic power iteration (the pure-python
``networkx`` implementation before 3.0 switched to a scipy SVD —
reimplemented here from the published algorithm, not copied):

    h ← 1/n
    repeat:
        a(v)  = Σ_{u→v} h(u)·w(u,v)        (authority from in-edges)
        h(u)  = Σ_{u→v} a(v)·w(u,v)        (hub from out-edges)
        h ×= 1/max(h);  a ×= 1/max(a)      (max-normalize, nx order)
        err = Σ_v |h(v) − h_prev(v)|; stop when err < tol
    finally h ×= 1/Σh, a ×= 1/Σa           (L1 output normalization)

Parallel (src,dst) edge rows sum their weights (MultiDiGraph
adjacency semantics). Vertices with no in-edges get authority 0, no
out-edges get hub 0.

Spark plan, per iteration: two shuffle-hash joins that stream the
persisted edge table and hash the |V|-row score vector, two groupBys
with map-side partial aggregation (weighted sums are associative, so
hub in/out-degrees never skew the reduce — same argument as the
PageRank contribution aggregate), one scalar job for the max-norms
and one for the convergence delta fused with the state checkpoint.
Per-iteration shuffle volume is the |V| score vector, not |E|.

``fixed_iter=K`` runs exactly K iterations with no convergence test —
fully deterministic, which is what the driver-oracle query uses (the
DuckDB twin unrolls the same K rounds in a recursive CTE; see
``__spark_entry__._HITS_ORACLE``). ``checkpoint_dir`` gives the house
CheckpointStore contract: per-iteration state + per-partition lineage
rows and mid-run resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.checkpoint import CheckpointStore
from k2_18_spark.graph.adjacency import vertex_ids
from k2_18_spark.graph.pagerank import PowerIterationFailedConvergence


def hits(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 100,
    tol: float = 1e-8,
    fixed_iter: int | None = None,
    checkpoint_dir: str | None = None,
    job_name: str = "hits",
    num_partitions: int | None = None,
) -> DataFrame:
    """→ (id, hub, authority), L1-normalized.

    ``fixed_iter`` overrides the tol test and runs exactly that many
    iterations (deterministic mode); otherwise the loop stops when the
    L1 hub delta drops below ``tol`` and raises
    PowerIterationFailedConvergence after ``max_iter``.
    """
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _hits_loop(
            spark,
            edges,
            nodes,
            max_iter,
            tol,
            fixed_iter,
            checkpoint_dir,
            job_name,
            num_partitions,
        )


def _hits_loop(
    spark,
    edges,
    nodes,
    max_iter,
    tol,
    fixed_iter,
    checkpoint_dir,
    job_name,
    num_partitions,
) -> DataFrame:
    verts = vertex_ids(edges, nodes).persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()
    out_schema = "id string, hub double, authority double"
    if n == 0:
        return spark.createDataFrame([], out_schema)

    # r6 (guide §2.3 narrower types): supersteps shuffled STRING vertex
    # keys; encode to xxhash64 longs (8-byte keys, cheap hash/compare),
    # decode the |V|-row result once at the end. One |V| aggregate
    # verifies injectivity AND measures key width; the encoding is only
    # worth its own hash+decode cost when the keys are wider than the
    # 8-byte long it produces (web ids are URLs; bench ids are 5-char
    # synthetics — a data-derived gate, not a core-count one). The
    # astronomically-rare hash collision also falls back to the raw
    # string keys (identical semantics either way — the sums don't
    # depend on the key representation).
    vstats = verts.select(
        F.xxhash64("id").alias("h"), F.length("id").alias("l")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("h").alias("nd"),
        F.avg("l").alias("w"),
    ).collect()[0]
    encode = vstats["n"] == vstats["nd"] and (vstats["w"] or 0.0) > 8.0

    def _enc(col):
        return F.xxhash64(col) if encode else col

    w = F.col("weight") if "weight" in edges.columns else F.lit(1.0)
    e = (
        edges.select(
            _enc(F.col("src_id")).alias("src"),
            _enc(F.col("dst_id")).alias("dst"),
            w.cast("double").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    # TWO persisted copies, one per join key: the a-step joins scores
    # on src, the h-step joins this round's authorities on dst — with a
    # single src-partitioned table the h-step would re-shuffle ALL
    # edges every round (|E| ≫ |V| at scale); two copies keep every
    # per-round shuffle at the |V|-row score vector
    e = e.repartition(*([num_partitions, "src"] if num_partitions else ["src"]))
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    if e.count() == 0:
        # no edges: every score is 0 in the raw pass; define the
        # degenerate output as uniform L1 mass (matches a single
        # isolated-vertex graph's only consistent normalization)
        out = verts.select(
            "id",
            (F.lit(1.0) / F.lit(float(n))).alias("hub"),
            (F.lit(1.0) / F.lit(float(n))).alias("authority"),
        )
        verts.unpersist()
        return out

    e_by_dst = e.repartition(
        *([num_partitions, "dst"] if num_partitions else ["dst"])
    ).persist(StorageLevel.MEMORY_AND_DISK)
    e_by_dst.count()

    def _emit(state: DataFrame) -> DataFrame:
        out = _finalize(state)
        if encode:
            dec = verts.select(
                F.xxhash64("id").alias("id"), F.col("id").alias("orig_id")
            )
            out = out.join(dec.hint("shuffle_hash"), "id").select(
                F.col("orig_id").alias("id"), "hub", "authority"
            )
        out = out.localCheckpoint(eager=True)
        verts.unpersist()
        e.unpersist()
        e_by_dst.unpersist()
        return out

    store = (
        CheckpointStore(
            spark, checkpoint_dir, job_name,
            state_version="hits-xxh64-v2" if encode else "hits-str-v2",
        )
        if checkpoint_dir
        else None
    )

    state = None  # (id, h, a)
    start = 0
    rounds = fixed_iter if fixed_iter is not None else max_iter
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            state = store.load_state(last).select("id", "h", "a")
            if store.load_marker(last).get("converged"):
                return _emit(state)
            start = last + 1
    if state is None:
        state = verts.select(
            _enc(F.col("id")).alias("id"),
            (F.lit(1.0) / F.lit(float(n))).alias("h"),
            F.lit(0.0).alias("a"),
        ).localCheckpoint(eager=True)

    for it in range(start, rounds):
        a_raw = (
            e.join(
                state.select(F.col("id").alias("src"), "h").hint("shuffle_hash"),
                "src",
            )
            .select("dst", (F.col("h") * F.col("w")).alias("c"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").alias("a_raw"))
        )
        h_raw = (
            e_by_dst.join(
                a_raw.select(F.col("id").alias("dst"), "a_raw").hint("shuffle_hash"),
                "dst",
            )
            .select("src", (F.col("a_raw") * F.col("w")).alias("c"))
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("c").alias("h_raw"))
        )
        raw = (
            state.select("id", F.col("h").alias("h_prev"))
            .join(a_raw.hint("shuffle_hash"), "id", "left")
            .join(h_raw.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                "h_prev",
                F.coalesce("a_raw", F.lit(0.0)).alias("a_raw"),
                F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
            )
            .localCheckpoint(eager=False)
        )
        maxes = raw.agg(
            F.max("h_raw").alias("hm"), F.max("a_raw").alias("am")
        ).collect()[0]
        hm, am = maxes["hm"], maxes["am"]
        if not hm or not am:
            raise PowerIterationFailedConvergence(
                f"hits: zero norm at iteration {it} (graph has no "
                "alternating walk mass — e.g. sinks only)"
            )
        # nx order of operations: multiply by the reciprocal
        new = raw.select(
            "id",
            (F.col("h_raw") * F.lit(1.0 / hm)).alias("h"),
            (F.col("a_raw") * F.lit(1.0 / am)).alias("a"),
            "h_prev",
        )
        prev = state
        if store is not None:
            new = store.save_state(it, new, rows_in=n)
        else:
            new = new.localCheckpoint(eager=False)
        if store is not None or fixed_iter is None:
            err = new.agg(
                F.sum(F.abs(F.col("h") - F.col("h_prev"))).alias("e")
            ).collect()[0]["e"]
        else:
            # fixed_iter with no checkpoint store (the deterministic
            # oracle/bench mode): the L1 delta is provably unused — no
            # tol test, no marker to annotate — so skip its full-|V|
            # aggregate job per round (r6). `new` materializes inside
            # the NEXT round's max-norm job; it depends only on the
            # `raw` checkpoint that round's collect already
            # materialized, never on the unpersisted prior state.
            err = None
        state = new.select("id", "h", "a")
        prev.unpersist()
        converged = fixed_iter is None and err < tol
        if store is not None:
            store.annotate(it, err=float(err), converged=bool(converged))
        if converged:
            break
    else:
        if fixed_iter is None:
            raise PowerIterationFailedConvergence(
                f"hits did not converge in {max_iter} iterations (tol={tol})"
            )

    return _emit(state)


def _finalize(state: DataFrame) -> DataFrame:
    sums = state.agg(F.sum("h").alias("hs"), F.sum("a").alias("as_")).collect()[0]
    hs, as_ = sums["hs"], sums["as_"]
    return state.select(
        "id",
        (F.col("h") * F.lit(1.0 / hs)).alias("hub"),
        (F.col("a") * F.lit(1.0 / as_)).alias("authority"),
    )
