"""TrustRank and link-spam mass estimation over the directed link graph.

Web-spam link analysis, the classic companion to PageRank on web-scale
link graphs (not present in the reference — its closest operator is
weighted PageRank, ``viz/graph2metrics.py:680-760``):

- **TrustRank** (Gyöngyi, Garcia-Molina, Pedersen, "Combating Web Spam
  with TrustRank", VLDB'04): biased PageRank whose teleport vector is
  uniform over a human-vetted trusted seed set. Exactly the
  personalized-PageRank superstep loop (``graph/pagerank.py``) — same
  skew-split rank join, fused delta+dangling aggregate, one driver job
  per superstep, checkpoint/lineage/resume contract.
- **Spam mass** (Gyöngyi, Berkhin, Garcia-Molina, Pedersen, "Link Spam
  Detection Based on Mass Estimation", VLDB'06): the share of a page's
  PageRank that flows through spam. Absolute ``M(v) = PR(v) − TR(v)``
  and relative ``m(v) = M(v) / PR(v)`` — pages whose rank is mostly
  unexplained by trusted sources score near 1.
- **Inverse-PageRank seed selection** (TrustRank §4.2): rank pages by
  PageRank on the REVERSED graph (coverage: how much of the web a
  page's outlinks reach) and vet the top-k.

Scale design: ``spam_mass`` runs BOTH power iterations over ONE shared
:class:`~k2_18_spark.graph.adjacency.Adjacency` — the edge table is
scanned, dictionary-encoded, hub-split, and persisted once; the second
loop reuses the cached encoded edges, so the marginal cost of the trust
pass is its |V|-row supersteps only. The final mass arithmetic is one
hash join of two |V|-row rank vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k2_18_spark.graph.adjacency import build_adjacency
from k2_18_spark.graph.pagerank import pagerank, personalized_pagerank

__all__ = ["trustrank", "spam_mass", "select_trust_seeds"]


def trustrank(
    spark: SparkSession,
    edges: DataFrame,
    trusted: list[str],
    nodes: DataFrame | None = None,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
    checkpoint_dir: str | None = None,
    job_name: str = "trustrank",
    num_partitions: int | None = None,
    hub_top_k: int = 256,
    adj=None,
) -> DataFrame:
    """TrustRank → DataFrame (id, trust).

    Personalized PageRank with the teleport vector uniform over
    ``trusted`` (VLDB'04 eq. 6 with static score distribution d = the
    normalized trust seeds; dangling mass also restarts at the seeds,
    matching nx ``pagerank(personalization=...)`` semantics). Raises
    ``ValueError`` when no trusted id is a vertex of the graph.
    """
    ranks = personalized_pagerank(
        spark,
        edges,
        trusted,
        nodes=nodes,
        alpha=alpha,
        max_iter=max_iter,
        tol=tol,
        checkpoint_dir=checkpoint_dir,
        job_name=job_name,
        num_partitions=num_partitions,
        hub_top_k=hub_top_k,
        adj=adj,
    )
    return ranks.select("id", F.col("rank").alias("trust"))


def spam_mass(
    spark: SparkSession,
    edges: DataFrame,
    trusted: list[str],
    nodes: DataFrame | None = None,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
    num_partitions: int | None = None,
    hub_top_k: int = 256,
) -> DataFrame:
    """Spam-mass estimation → DataFrame (id, rank, trust, spam_mass,
    rel_spam_mass).

    ``spam_mass = rank − trust`` (absolute mass, VLDB'06 eq. 5 with
    both vectors L1-normalized) and ``rel_spam_mass = spam_mass /
    rank`` (eq. 6; rank > 0 always holds because the uniform teleport
    floor is (1−alpha)/n). Trusted hubs can show negative mass — their
    rank is MORE than explained by trust — which the paper thresholds
    away on the caller's side.

    Both power iterations share one Adjacency: the edge table is
    encoded and persisted once, and the trust pass reuses it.
    """
    adj = build_adjacency(
        edges, nodes, num_partitions=num_partitions, hub_top_k=hub_top_k
    )
    try:
        pr = pagerank(
            spark, edges, nodes, alpha=alpha, max_iter=max_iter, tol=tol,
            job_name="spam_mass_pr", adj=adj,
        )
        tr = trustrank(
            spark, edges, trusted, nodes, alpha=alpha, max_iter=max_iter,
            tol=tol, job_name="spam_mass_tr", adj=adj,
        )
        out = (
            pr.join(tr, "id")
            .select(
                "id",
                "rank",
                "trust",
                (F.col("rank") - F.col("trust")).alias("spam_mass"),
                ((F.col("rank") - F.col("trust")) / F.col("rank")).alias(
                    "rel_spam_mass"
                ),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        adj.unpersist()
    return out


def select_trust_seeds(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    nodes: DataFrame | None = None,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
    num_partitions: int | None = None,
    hub_top_k: int = 256,
) -> DataFrame:
    """Inverse-PageRank seed candidates → DataFrame (id, inv_rank),
    the top-``k`` by PageRank on the reversed graph (TrustRank §4.2:
    prefer seeds whose outlinks cover the most of the graph), ties
    broken by id so the candidate list is deterministic.

    Driver-side size is the k-row result only; the ranking itself is
    the standard distributed loop on swapped endpoints.
    """
    rev = edges.select(
        F.col("dst_id").alias("src_id"),
        F.col("src_id").alias("dst_id"),
        *[c for c in edges.columns if c not in ("src_id", "dst_id")],
    )
    inv = pagerank(
        spark, rev, nodes, alpha=alpha, max_iter=max_iter, tol=tol,
        job_name="inverse_pagerank", num_partitions=num_partitions,
        hub_top_k=hub_top_k,
    )
    return (
        inv.select("id", F.col("rank").alias("inv_rank"))
        .orderBy(F.desc("inv_rank"), F.asc("id"))
        .limit(k)
    )
