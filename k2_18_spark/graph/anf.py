"""Approximate neighborhood function / effective diameter (ANF).

The reference computes exact per-vertex metrics on graphs that fit one
process (``viz/graph2metrics.py``); at web scale the standard way to
answer "how many pages are within t clicks of v" and "what is the
effective diameter of the link graph" is the ANF family: per-vertex
Flajolet-Martin bitstring sketches OR-merged along edges once per
superstep (Palmer/Gibbons/Faloutsos, KDD'02; HyperANF, Boldi/Vigna,
WWW'11 — both public literature; nothing comparable exists in the
reference, this is a scale-path extension of its metrics suite).

Spark-first design:

- A sketch is ``registers`` independent FM bitmasks, stored as
  ``registers`` separate BIGINT columns ``s0..s{R-1}`` (columnar, the
  same layout trick as the columnar Brandes): the per-superstep merge
  is then ``registers`` codegen'd ``bit_or`` aggregates in ONE
  groupBy — a single shuffle of the |V|-row sketch vector per round,
  with map-side partial aggregation, so hub in-degrees never skew the
  reduce (OR is associative+commutative; partial agg IS the salt).
- Register init is deterministic and cross-engine replicable: the
  FM bit position for (vertex, register r) is the number of trailing
  zero bits of the 60-bit integer ``conv(substr(md5(id || ':' || r),
  1, 15), 16, 10)`` — the repo's md5-60 idiom, so a DuckDB oracle can
  reproduce every sketch bit-for-bit (``__spark_entry__.graph_anf``).
- The loop is the house superstep contract: AQE off inside the loop,
  edges persisted once partitioned on the join key, lazy
  ``localCheckpoint`` fused with the per-round aggregate (changed
  count + neighborhood-bits total in the SAME job), per-round
  CheckpointStore state + lineage when ``checkpoint_dir`` is given,
  resume from the latest round.
- Convergence is exact saturation (no sketch changed), reached after
  ``diameter`` rounds; ``max_rounds`` caps pathological inputs.

Estimates: a register's FM count statistic is b_r = position of the
lowest ZERO bit; the classic estimator is 2^avg(b_r) / 0.77351.
``nf_bits`` (= Σ_r b_r, an exact integer) is also exposed because it
is hash-stable across engines — the driver oracle compares sketches
and nf_bits bit-exactly and leaves the float estimator to pytest.

Scale notes (100 TB): per-round shuffle is |V| × (8·R + key) bytes —
at 10^9 vertices and R=32 that is ~256 GB spread across the cluster,
the same order as one PageRank superstep's rank vector; R trades
accuracy (std err ≈ 0.78/√R) against shuffle volume linearly. Rounds
= effective diameter (~16-20 on web graphs).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.checkpoint import CheckpointStore
from k2_18_spark.graph.adjacency import vertex_ids

#: md5-60 yields h < 2^60, so trailing-zeros ≤ 59; h == 0 (p = 2^-60)
#: deterministically maps to the cap so both engines agree.
_BIT_CAP = 59
_FM_PHI = 0.77351  # Flajolet-Martin bias correction


def _md5_60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fm_register(id_col: Column, r: int) -> Column:
    """The FM bitmask contributed by one vertex to register ``r``:
    a single bit at the trailing-zeros position of md5-60(id ':' r)."""
    h = _md5_60(F.concat(id_col.cast("string"), F.lit(f":{r}")))
    tz = F.round(F.log2(h.bitwiseAND(-h))).cast("int")
    bit = F.when(h == 0, F.lit(_BIT_CAP)).otherwise(tz)
    # 2^bit is exact in a double up to 2^59, so the cast is lossless
    # (shiftleft's pyspark signature wants a literal shift width)
    return F.pow(F.lit(2.0), bit).cast("long")


def _lowest_zero_bit(name: str) -> Column:
    # ((m + 1) & ~m) isolates the lowest zero bit as a power of two
    return F.round(F.log2(F.expr(f"({name} + CAST(1 AS BIGINT)) & ~{name}"))).cast(
        "int"
    )


@dataclass
class AnfResult:
    """sketches: (id, s0..s{R-1}, nf_bits, nf_estimate); totals: one
    dict per round with exact ``total_bits`` and float ``nf_total``."""

    sketches: DataFrame
    totals: list[dict]
    rounds: int
    registers: int


def anf(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    registers: int = 32,
    max_rounds: int = 64,
    fixed_rounds: int | None = None,
    checkpoint_dir: str | None = None,
    job_name: str = "anf",
    num_partitions: int | None = None,
) -> AnfResult:
    """Out-neighborhood ANF over ``edges`` (src_id, dst_id, ...).

    Round t sketches cover every vertex reachable within t hops along
    edge direction; saturation (= transitive closure) stops the loop.
    ``fixed_rounds=K`` instead runs exactly K rounds (no saturation
    stop) — the bounded "neighborhood within K clicks" query, and the
    deterministic mode scale oracles replicate in SQL.
    """
    from k2_18_spark.session import superstep_conf

    if not 1 <= registers <= 64:
        raise ValueError("registers must be in 1..64")
    with superstep_conf(spark):
        return _anf_loop(
            spark,
            edges,
            nodes,
            registers,
            max_rounds,
            fixed_rounds,
            checkpoint_dir,
            job_name,
            num_partitions,
        )


def harmonic_anf(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    registers: int = 32,
    max_rounds: int = 64,
    fixed_rounds: int | None = None,
    checkpoint_dir: str | None = None,
    job_name: str = "harmonic_anf",
    num_partitions: int | None = None,
) -> AnfResult:
    """HyperBall harmonic-centrality estimate (Boldi/Vigna, the method
    behind Common Crawl's published host rankings): run the FM-sketch
    loop over REVERSED edges (round t covers the in-ball {u: d(u,v)≤t})
    and fold each round's per-vertex ball growth into
    ``h += (N̂_t − N̂_{t−1}) / t`` — an extra double column on the same
    one-shuffle-per-round superstep, nothing else changes. Unweighted
    hop distances; accuracy follows the FM estimator (std err ≈
    0.78/√registers). Exact twin below the CSR ceiling:
    :func:`k2_18_spark.graph.centrality.harmonic_centrality`.

    ``result.sketches`` gains a ``harmonic_estimate`` column.
    """
    from k2_18_spark.session import superstep_conf

    if not 1 <= registers <= 64:
        raise ValueError("registers must be in 1..64")
    rev = edges.select(
        F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")
    )
    with superstep_conf(spark):
        return _anf_loop(
            spark,
            rev,
            nodes,
            registers,
            max_rounds,
            fixed_rounds,
            checkpoint_dir,
            job_name,
            num_partitions,
            harmonic=True,
        )


def _sketch_cols(registers: int) -> list[str]:
    return [f"s{r}" for r in range(registers)]


def _anf_loop(
    spark,
    edges,
    nodes,
    registers,
    max_rounds,
    fixed_rounds,
    checkpoint_dir,
    job_name,
    num_partitions,
    harmonic: bool = False,
) -> AnfResult:
    scols = _sketch_cols(registers)
    hcols = ["h"] if harmonic else []

    verts = vertex_ids(edges, nodes).persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()
    if n == 0:
        empty = spark.createDataFrame(
            [], "id string, " + ", ".join(f"{c} long" for c in scols)
        )
        return AnfResult(empty, [], 0, registers)

    # Directed edge list persisted ONCE, partitioned on dst — the
    # per-round join key — so each superstep shuffles only the sketch
    # vector. (Sketches stay keyed by the original string id: the FM
    # init hash is id-derived, and the R×8-byte payload dominates the
    # key width, so dictionary encoding would not change the shuffle
    # order of magnitude here.)
    e = (
        edges.select(F.col("src_id").alias("src"), F.col("dst_id").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = e.repartition(*([num_partitions, "dst"] if num_partitions else ["dst"]))
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    e.count()

    store = (
        CheckpointStore(
            spark,
            checkpoint_dir,
            job_name,
            state_version="anf-harmonic-md5-60-v1" if harmonic else "anf-md5-60-v1",
        )
        if checkpoint_dir
        else None
    )

    totals: list[dict] = []
    sketches = None
    start_round = 0
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            state = store.load_state(last)
            sketches = state.select("id", *scols, *hcols)
            # markers carry each completed round's totals — rebuild the
            # trajectory so a resumed run returns the same AnfResult
            for it in range(last + 1):
                meta = store.load_marker(it)
                if "total_bits" in meta:
                    totals.append(
                        {
                            "round": it,
                            "total_bits": meta["total_bits"],
                            "nf_total": meta.get("nf_total"),
                        }
                    )
            if store.load_marker(last).get("converged"):
                return AnfResult(
                    _with_estimates(sketches, registers),
                    totals,
                    len(totals),
                    registers,
                )
            start_round = last + 1
    if sketches is None:
        sketches = verts.select(
            "id",
            *[fm_register(F.col("id"), r).alias(c) for r, c in enumerate(scols)],
            *([F.lit(0.0).alias("h")] if harmonic else []),
        ).localCheckpoint(eager=True)

    bits_expr = _sum_bits_expr(scols)
    rounds_limit = fixed_rounds if fixed_rounds is not None else max_rounds
    # changed-sketch frontier (r6, the LPA trick / guide §2.3): a
    # vertex's round-t merge can only gain bits from neighbors whose
    # sketch CHANGED in round t-1 — an unchanged neighbor's sketch was
    # already absorbed the round before (induction from round 1's full
    # join: sk_t[v] ⊇ sk_{t-1}[d] for every out-edge (v,d)). So from
    # round 2 on, the join's sketch side carries only the changed rows;
    # late rounds (the saturation tail — most of a high-diameter
    # graph's rounds) shuffle a shrinking frontier instead of |V|
    # sketch rows. None → full join (round 1, and the first round
    # after a checkpoint resume, where the prior delta is unknown).
    delta: DataFrame | None = None
    for it in range(start_round, rounds_limit):
        join_side = sketches if delta is None else delta
        nbr = (
            e.join(
                join_side.select(F.col("id").alias("dst"), *scols).hint(
                    "shuffle_hash"
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.bit_or(c).alias(f"n_{c}") for c in scols])
        )
        merged = sketches.select(
            "id",
            *[F.col(c).alias(f"o_{c}") for c in scols],
            *([F.col("h").alias("o_h")] if harmonic else []),
        ).join(nbr.hint("shuffle_hash"), "id", "left")
        new = merged.select(
            "id",
            *[
                F.col(f"o_{c}")
                .bitwiseOR(F.coalesce(F.col(f"n_{c}"), F.lit(0)))
                .alias(c)
                for c in scols
            ],
            *[F.col(f"o_{c}") for c in scols],
            *([F.col("o_h")] if harmonic else []),
        )
        if harmonic:
            # HyperBall accumulation: this round's in-ball growth over
            # the FM estimates, weighted by 1/t (t = it+1) — computed
            # from the merged vs old register columns in the same
            # projection chain (Catalyst collapses the selects)
            old_est = _estimate_expr([f"o_{c}" for c in scols])
            new_est = _estimate_expr(scols)
            new = new.select(
                "id",
                *scols,
                *[F.col(f"o_{c}") for c in scols],
                (
                    F.col("o_h")
                    + F.greatest(new_est - old_est, F.lit(0.0))
                    / F.lit(float(it + 1))
                ).alias("h"),
            )
        prev = sketches
        if store is not None:
            new = store.save_state(it, new, rows_in=n)
        else:
            # lazy: the round aggregate below materializes the
            # checkpoint in the SAME job (one scheduling round)
            new = new.localCheckpoint(eager=False)
        diff = [(F.col(c) != F.col(f"o_{c}")).cast("int") for c in scols]
        row = new.agg(
            F.sum(F.greatest(*diff) if len(diff) > 1 else diff[0]).alias("changed"),
            F.sum(bits_expr).alias("total_bits"),
            F.sum(_estimate_expr(scols)).alias("nf_total"),
        ).collect()[0]
        changed = row["changed"] or 0
        totals.append(
            {
                "round": it,
                "total_bits": int(row["total_bits"]),
                "nf_total": float(row["nf_total"]),
            }
        )
        if store is not None:
            store.annotate(
                it,
                total_bits=int(row["total_bits"]),
                nf_total=float(row["nf_total"]),
                converged=changed == 0,
            )
        sketches = new.select("id", *scols, *hcols)
        # next round's frontier: rows whose merged registers differ
        # from their o_* copies — filtered off the just-materialized
        # checkpoint, so it costs one cached scan, no extra shuffle
        changed_pred = diff[0].cast("boolean")
        for d in diff[1:]:
            changed_pred = changed_pred | d.cast("boolean")
        delta = new.filter(changed_pred).select("id", *scols)
        prev.unpersist()
        if changed == 0 and fixed_rounds is None:
            break
    else:
        if fixed_rounds is None:
            raise RuntimeError(f"anf did not saturate in {max_rounds} rounds")

    out = _with_estimates(sketches, registers)
    verts.unpersist()
    e.unpersist()
    return AnfResult(out, totals, len(totals), registers)


def _sum_bits_expr(scols: list[str]) -> Column:
    total = None
    for c in scols:
        b = _lowest_zero_bit(c)
        total = b if total is None else total + b
    return total.cast("long")


def _estimate_expr(scols: list[str]) -> Column:
    """Classic FM estimator 2^avg(b_r) / phi as a column expression."""
    avg_b = _sum_bits_expr(scols) / F.lit(float(len(scols)))
    return F.pow(F.lit(2.0), avg_b) / F.lit(_FM_PHI)


def _with_estimates(sketches: DataFrame, registers: int) -> DataFrame:
    scols = _sketch_cols(registers)
    extra = (
        [F.col("h").alias("harmonic_estimate")]
        if "h" in sketches.columns
        else []
    )
    return sketches.select(
        "id",
        *scols,
        _sum_bits_expr(scols).alias("nf_bits"),
        _estimate_expr(scols).alias("nf_estimate"),
        *extra,
    )


def effective_diameter(totals: list[dict], q: float = 0.9) -> float:
    """Smallest t (interpolated) where the neighborhood function
    reaches ``q`` of its saturation value (HyperANF convention)."""
    if not totals:
        return 0.0
    target = q * totals[-1]["nf_total"]
    prev_v = None
    for t in totals:
        v = t["nf_total"]
        if v >= target:
            if prev_v is None or v == prev_v:
                return float(t["round"])
            # linear interpolation between the two bracketing rounds
            frac = (target - prev_v) / (v - prev_v)
            return t["round"] - 1 + frac
        prev_v = v
    return float(totals[-1]["round"])
