"""Deterministic random-walk corpus generation (DeepWalk-style).

At web scale the walk corpus IS the training input for graph
embeddings: DeepWalk / node2vec (p = q = 1) sample ``num_walks``
truncated walks of length ``walk_length`` from every start vertex and
feed the node sequences to a skip-gram model. The reference's concept
graph has no walk sampler (its NetworkX metrics stop at centralities,
`viz/graph2metrics.py`); this operator is the scale-path addition that
turns the link graph into an embedding-training corpus.

Randomness is hash-derived, not RNG-state-derived: the step from
``cur`` along candidate edge ``(cur, dst)`` at global step ``t`` of
walk ``walk_id`` is scored ``md5(seed | walk_id | t | dst)`` and the
minimum score wins (ties broken by ``dst`` — the 32-hex score is
compared first, then the id, exactly like DuckDB's
``min(md5(...) || dst)``). Consequences that matter at 100 TB:

- the corpus is bit-reproducible across runs, partitionings, AND
  cluster sizes — no per-partition RNG seeding discipline needed;
- a resumed job regenerates identical walks (checkpoint-free resume);
- an exact SQL twin exists (the driver oracle unrolls the steps as
  chained argmin CTEs), so the sampler is hard-verifiable.

``weighted=True`` switches the per-candidate key to the exponential
race ``-ln(u) / weight`` (u = the md5-derived uniform in (0, 1]),
which picks each neighbor with probability proportional to its edge
weight — the standard Gumbel/exponential trick, still deterministic.

Plan shape per step: ONE shuffle-hash join of the walk frontier
against the src-partitioned persisted edge table + one per-walk
argmin aggregation (map-side partial min). Walks that reach a
dangling vertex leave the frontier that round, so the per-step cost
tracks the number of LIVE walks, not the corpus size. The frontier
passes through an aggregate each round — the ratio-based size
estimate keeps `localCheckpoint` stats flat (the Louvain two-join
hazard does not apply; see BASELINE.md "sharp edge").
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _walk_key(seed: str, step: int, weighted: bool):
    """Per-candidate selection key at global step ``step`` (min wins)."""
    h = F.md5(
        F.encode(
            F.concat_ws(
                "|",
                F.lit(seed),
                F.col("walk_id"),
                F.lit(str(step)),
                F.col("dst_id"),
            ),
            "UTF-8",
        )
    )
    if not weighted:
        return h
    # exponential race: u in (0, 1] from the top 60 hash bits; the
    # min of -ln(u)/w over candidates lands on each with P ∝ w.
    u = (F.conv(F.substring(h, 1, 15), 16, 10).cast("double") + 1.0) / float(
        1 << 60
    )
    return -F.log(u) / F.col("weight")


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int = 8,
    num_walks: int = 1,
    seed: str = "w",
    starts: DataFrame | None = None,
    weighted: bool = False,
    directed: bool = True,
) -> DataFrame:
    """Sample ``num_walks`` deterministic truncated random walks of at
    most ``walk_length`` steps from every start vertex.

    ``starts``: one ``id`` column; defaults to every vertex with an
    out-edge. Returns (walk_id, start_id, seq array<string>, length)
    with ``walk_id = start_id # walk_index``; ``length`` counts
    vertices including the start. A walk ends early at a dangling
    vertex. Self-loops are dropped from the edge set.
    """
    e = edges.select("src_id", "dst_id", "weight").filter(
        F.col("src_id") != F.col("dst_id")
    )
    if not directed:
        e = e.unionByName(
            e.select(
                F.col("dst_id").alias("src_id"),
                F.col("src_id").alias("dst_id"),
                "weight",
            )
        )
    if weighted:
        # parallel edges act as one candidate of summed weight
        e = e.groupBy("src_id", "dst_id").agg(F.sum("weight").alias("weight"))
    else:
        e = e.select("src_id", "dst_id").distinct().withColumn(
            "weight", F.lit(1.0)
        )
    e = e.repartition("src_id").persist(StorageLevel.MEMORY_AND_DISK)
    e.count()

    if starts is None:
        starts = e.select(F.col("src_id").alias("id")).distinct()
    # r6 rework (guide §2.3 "shuffle keys, not payloads"): the r5 loop
    # carried the GROWING ``seq`` array through every per-step exchange
    # and re-joined the frontier against the picks each round. But the
    # frontier only needs (walk_id, cur): the next frontier IS the pick
    # table, so the per-step join disappears, the per-step shuffled
    # payload is O(1) per live walk, and the sequences assemble ONCE at
    # the end from the per-step pick tables (sort by step inside one
    # groupBy). Identical picks → bit-identical corpus.
    starts0 = (
        starts.select("id")
        .distinct()
        .select(
            "id",
            F.explode(
                F.sequence(F.lit(0), F.lit(num_walks - 1))
            ).alias("k"),
        )
        .select(
            F.concat_ws("#", "id", "k").alias("walk_id"),
            F.col("id").alias("start_id"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = starts0.select(
        "walk_id", F.col("start_id").alias("cur")
    )

    picks: list[DataFrame] = []
    for t in range(1, walk_length + 1):
        cand = frontier.join(
            e.withColumnRenamed("src_id", "cur").hint("shuffle_hash"), "cur"
        )
        pick = (
            cand.groupBy("walk_id")
            .agg(
                F.min(
                    F.struct(
                        _walk_key(seed, t, weighted).alias("k"),
                        F.col("dst_id").alias("nxt"),
                    )
                ).alias("m")
            )
            .select("walk_id", F.lit(t).alias("t"), F.col("m.nxt").alias("nxt"))
            .localCheckpoint(eager=False)
        )
        # r6: no per-step count — the blocking count per step existed
        # only to exit early once EVERY walk hit a dangling vertex, but
        # an empty pick table contributes nothing to the final union,
        # so the output is identical without it. Dropping it removes
        # walk_length-1 scheduling barriers: the lazy checkpoints
        # materialize back-to-back inside the single assembly job
        # (each still truncates lineage at its step boundary).
        picks.append(pick)
        frontier = pick.select("walk_id", F.col("nxt").alias("cur"))

    if picks:
        steps = reduce(DataFrame.unionByName, picks)
        seqs = steps.groupBy("walk_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "nxt"))),
                lambda s: s["nxt"],
            ).alias("tail")
        )
        out = starts0.join(seqs.hint("shuffle_hash"), "walk_id", "left").select(
            "walk_id",
            "start_id",
            F.concat(
                F.array("start_id"),
                F.coalesce("tail", F.array().cast("array<string>")),
            ).alias("seq"),
        )
    else:
        out = starts0.select(
            "walk_id", "start_id", F.array("start_id").alias("seq")
        )
    e.unpersist()
    return out.select(
        "walk_id", "start_id", "seq", F.size("seq").alias("length")
    )


def node2vec_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int = 8,
    num_walks: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: str = "n2v",
    starts: DataFrame | None = None,
    weighted: bool = False,
    directed: bool = True,
) -> DataFrame:
    """Deterministic node2vec walks (Grover & Leskovec KDD'16): the
    second-order biased extension of :func:`random_walks`. The step
    from ``cur`` (having arrived from ``prev``) to candidate ``dst``
    is drawn with probability proportional to ``w(cur,dst) · α`` where
    ``α = 1/p`` if ``dst == prev`` (return), ``1`` if ``dst`` is a
    neighbor of ``prev`` in the walk's edge orientation (BFS-ish
    stay-local), else ``1/q`` (DFS-ish explore). ``p = q = 1``
    degenerates to the first-order weighted walk and is tested
    bit-identical to ``random_walks(weighted=True)``.

    Sampling is the same hash-derived exponential race as the
    first-order sampler — ``argmin -ln(u)/(w·α)`` with
    ``u = md5(seed|walk_id|t|dst)``-derived — so the corpus is
    bit-reproducible across runs/partitionings/cluster sizes and has
    an exact unrolled-CTE SQL twin (driver oracle ``graph_node2vec``).

    Plan shape per step (the second-order Markov price): ONE
    shuffle-hash join of the live frontier against the persisted
    src-partitioned edge table (candidates = Σ deg(cur) over live
    walks) + ONE existence probe of those candidates against the
    distinct (src,dst) pair set on (prev, dst) — a semi-join-shaped
    left join tagging the α=1 class — + one per-walk map-side-partial
    argmin. No state beyond (prev, cur) per walk ever materializes;
    the first step has no ``prev`` and runs the unbiased race.
    """
    e = edges.select("src_id", "dst_id", "weight").filter(
        F.col("src_id") != F.col("dst_id")
    )
    if not directed:
        e = e.unionByName(
            e.select(
                F.col("dst_id").alias("src_id"),
                F.col("src_id").alias("dst_id"),
                "weight",
            )
        )
    if weighted:
        e = e.groupBy("src_id", "dst_id").agg(F.sum("weight").alias("weight"))
    else:
        e = e.select("src_id", "dst_id").distinct().withColumn(
            "weight", F.lit(1.0)
        )
    e = e.repartition("src_id").persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    # the α=1 membership probe: is (prev, dst) an edge? Persisted ONCE
    # pre-partitioned on the probe key — the r5 plan derived this from
    # `e` (partitioned by src_id) and re-exchanged the |E|-row pair set
    # on (prev, dst_id) EVERY step; now each step exchanges only the
    # candidate rows to the existing layout (r6, guide §2.4 / VERDICT
    # r5 finding #3).
    nbr = (
        e.select(
            F.col("src_id").alias("prev"),
            F.col("dst_id").alias("dst_id"),
            F.lit(True).alias("is_nbr"),
        )
        .repartition("prev", "dst_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nbr.count()

    if starts is None:
        starts = e.select(F.col("src_id").alias("id")).distinct()
    # r6 rework — same shape as :func:`random_walks`: the frontier
    # carries only (walk_id, prev, cur), the next frontier is derived
    # from the pick table (prev = the step's shared ``cur``, carried
    # through the argmin aggregate), and sequences assemble once at the
    # end. Identical picks → bit-identical corpus.
    starts0 = (
        starts.select("id")
        .distinct()
        .select(
            "id",
            F.explode(
                F.sequence(F.lit(0), F.lit(num_walks - 1))
            ).alias("k"),
        )
        .select(
            F.concat_ws("#", "id", "k").alias("walk_id"),
            F.col("id").alias("start_id"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = starts0.select(
        "walk_id",
        F.lit(None).cast("string").alias("prev"),
        F.col("start_id").alias("cur"),
    )

    picks: list[DataFrame] = []
    for t in range(1, walk_length + 1):
        cand = frontier.join(
            e.withColumnRenamed("src_id", "cur").hint("shuffle_hash"), "cur"
        )
        if t == 1:
            # every frontier row starts with prev = NULL (by
            # construction above), so the probe cannot match and alpha
            # falls through to its prev-is-NULL arm — skip the probe
            # exchange entirely for the first step (r6)
            cand = cand.withColumn("is_nbr", F.lit(None).cast("boolean"))
        else:
            cand = cand.join(
                nbr.hint("shuffle_hash"), ["prev", "dst_id"], "left"
            )
        alpha = (
            F.when(F.col("prev").isNull(), F.lit(1.0))
            .when(F.col("dst_id") == F.col("prev"), F.lit(1.0) / F.lit(p))
            .when(F.col("is_nbr"), F.lit(1.0))
            .otherwise(F.lit(1.0) / F.lit(q))
        )
        h = F.md5(
            F.encode(
                F.concat_ws(
                    "|",
                    F.lit(seed),
                    F.col("walk_id"),
                    F.lit(str(t)),
                    F.col("dst_id"),
                ),
                "UTF-8",
            )
        )
        u = (
            F.conv(F.substring(h, 1, 15), 16, 10).cast("double") + 1.0
        ) / float(1 << 60)
        key = -F.log(u) / (F.col("weight") * alpha)
        pick = (
            cand.groupBy("walk_id")
            .agg(
                F.min(
                    F.struct(key.alias("k"), F.col("dst_id").alias("nxt"))
                ).alias("m"),
                # all cand rows of a walk share its current vertex —
                # min() is just a deterministic way to carry it
                F.min("cur").alias("cur"),
            )
            .select(
                "walk_id",
                F.lit(t).alias("t"),
                F.col("cur").alias("prev_next"),
                F.col("m.nxt").alias("nxt"),
            )
            .localCheckpoint(eager=False)
        )
        # r6: no per-step count — same argument as random_walks above
        # (empty picks are no-ops in the final union; one scheduled job
        # instead of walk_length blocking rounds)
        picks.append(pick)
        frontier = pick.select(
            "walk_id",
            F.col("prev_next").alias("prev"),
            F.col("nxt").alias("cur"),
        )

    if picks:
        steps = reduce(DataFrame.unionByName, picks)
        seqs = steps.groupBy("walk_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "nxt"))),
                lambda s: s["nxt"],
            ).alias("tail")
        )
        out = starts0.join(seqs.hint("shuffle_hash"), "walk_id", "left").select(
            "walk_id",
            "start_id",
            F.concat(
                F.array("start_id"),
                F.coalesce("tail", F.array().cast("array<string>")),
            ).alias("seq"),
        )
    else:
        out = starts0.select(
            "walk_id", "start_id", F.array("start_id").alias("seq")
        )
    e.unpersist()
    nbr.unpersist()
    return out.select(
        "walk_id", "start_id", "seq", F.size("seq").alias("length")
    )


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Walk corpus → aggregated skip-gram training pairs
    (center, context, n_pairs): every (seq[i], seq[i+d]) with
    1 ≤ |d| ≤ ``window``, counted across the corpus — the exact input
    a word2vec-style trainer consumes (DeepWalk §4.2).

    No self-join: one ``posexplode`` of the sequence and one bounded
    offset explode, with ``element_at`` picking the context — the
    pair stream is generated map-side and collapsed by the single
    (center, context) groupBy shuffle. At 100 TB the corpus-sized
    pair table never materializes; only the aggregated co-occurrence
    counts shuffle."""
    offs = [d for d in range(-window, window + 1) if d != 0]
    return (
        walks.select(F.posexplode("seq").alias("i", "center"), "seq")
        .select(
            "center",
            F.explode(
                F.filter(
                    F.transform(
                        F.lit(offs),
                        # element_at is 1-based and wraps on negative
                        # indices (ANSI errors out of range) — guard
                        # the window to the sequence bounds
                        lambda d: F.when(
                            (F.col("i") + d >= 0)
                            & (F.col("i") + d < F.size("seq")),
                            F.element_at(
                                "seq", (F.col("i") + d + 1).cast("int")
                            ),
                        ),
                    ),
                    lambda x: x.isNotNull(),
                )
            ).alias("context"),
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def ppmi_scores(pairs: DataFrame, shift: float = 0.0) -> DataFrame:
    """Skip-gram pair counts → PPMI co-occurrence scores
    (center, context, n_pairs, pmi, ppmi).

    Positive pointwise mutual information over the pair distribution
    — ``pmi = ln(#(c,x) · N / (#(c) · #(x)))``, ``ppmi = max(pmi −
    shift, 0)`` — is the classic count-based embedding matrix: Levy &
    Goldberg (NIPS 2014) showed word2vec skip-gram with negative
    sampling implicitly factorizes exactly this matrix (shift =
    ln(k) for k negative samples). Feeding ``skipgram_pairs`` output
    through this gives the statistics a count-based graph-embedding
    trainer (SVD of the PPMI matrix) consumes, with no training loop.

    Scale shape: two map-side-combinable marginal rollups (center,
    context — each O(|V|)) joined back onto the pair table on its own
    keys, one scalar total via a broadcast 1-row cross join. Scores
    round at 6 decimals (the house oracle contract).
    """
    totals = pairs.agg(F.sum("n_pairs").alias("_n"))
    cm = pairs.groupBy("center").agg(F.sum("n_pairs").alias("_nc"))
    xm = pairs.groupBy("context").agg(F.sum("n_pairs").alias("_nx"))
    pmi = F.log(
        F.col("n_pairs") * F.col("_n") / (F.col("_nc") * F.col("_nx"))
    )
    return (
        pairs.join(cm, "center")
        .join(xm, "context")
        .crossJoin(F.broadcast(totals))
        .select(
            "center",
            "context",
            "n_pairs",
            F.round(pmi, 6).alias("pmi"),
            F.round(
                F.greatest(pmi - shift, F.lit(0.0)), 6
            ).alias("ppmi"),
        )
    )
