"""Redirect-chain resolution — follow a crawl's single-hop redirect map
(301/302 src→dst pairs) to each URL's terminal target in
O(log max_hops) supersteps via pointer doubling, the web-graph
equivalent of the components pointer-jumping trick
(``graph/components.py``).

Crawlers cap redirect chains (curl defaults to ~20, browsers ~20);
``max_hops`` mirrors that: a URL whose chain exceeds it — including
every cycle, the degenerate self-redirect among them — comes back
``resolved = false`` with NULL final/hops, exactly what a frontier
scheduler needs to drop the URL.

Contract:

- the input is deduplicated to a FUNCTION ``src → min(dst)``
  (a crawl can record conflicting redirects for one URL across
  fetches; min keeps it deterministic — pass a pre-resolved map to
  override)
- ``resolved = true`` ⇔ a terminal URL (one with no outgoing
  redirect) is reached in ≤ ``max_hops`` hops; then ``final_url`` is
  that terminal and ``hops`` the exact chain length
- otherwise ``resolved = false``, ``final_url``/``hops`` NULL

Why doubling instead of one-hop iteration: chains compose — after r
rounds every pointer has advanced 2^r hops (or landed on its
terminal), so ``⌈log2(max_hops)⌉ + 1`` self-joins settle every chain
the cap admits, vs ``max_hops`` rounds one-hop. Each round is ONE
shuffle-hash self-join on the pointer key; cycle rows stay live all
rounds but their hop counter is capped (no overflow, no blow-up).

``apply_redirects`` then rewrites an edge table's endpoints through
the resolved map — the J2 dedup-map rewrite idiom applied to URLs —
so the link graph PageRank/components run on post-redirect targets.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def resolve_redirects(
    spark: SparkSession,
    redirects: DataFrame,
    max_hops: int = 20,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """Resolve every redirect source to its terminal target →
    (src_url, final_url, hops, resolved). See module contract."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")

    # function-ize: one outgoing pointer per src (deterministic min)
    mapping = (
        redirects.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )

    state = mapping.select(
        "src", F.col("dst").alias("ptr"), F.lit(1).cast("long").alias("hops")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    state.count()

    rounds = max(1, math.ceil(math.log2(max_hops)) + 1)
    cap = F.lit(max_hops + 1).cast("long")
    for _ in range(rounds):
        j = state.select(
            F.col("src").alias("j_src"),
            F.col("ptr").alias("j_ptr"),
            F.col("hops").alias("j_hops"),
        )
        # left join: a miss means ptr is terminal (no outgoing redirect)
        # — the row is absorbed and never changes again. Hop counters
        # are capped at max_hops+1 so cycle rows can't grow unbounded;
        # past the cap the exact value no longer matters (unresolved).
        new_state = (
            state.join(j.hint("shuffle_hash"), state["ptr"] == j["j_src"], "left")
            .select(
                state["src"],
                F.coalesce(j["j_ptr"], state["ptr"]).alias("ptr"),
                F.least(
                    state["hops"] + F.coalesce(j["j_hops"], F.lit(0)), cap
                ).alias("hops"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        new_state.count()
        state.unpersist()
        state = new_state

    srcs = mapping.select(F.col("src").alias("nonterminal"))
    out = (
        state.join(
            srcs.hint("shuffle_hash"),
            state["ptr"] == srcs["nonterminal"],
            "left",
        )
        .select(
            F.col("src").alias(src_col),
            (
                F.col("nonterminal").isNull()
                & (F.col("hops") <= F.lit(max_hops))
            ).alias("resolved"),
            F.col("ptr"),
            F.col("hops").alias("raw_hops"),
        )
        .select(
            src_col,
            F.when(F.col("resolved"), F.col("ptr")).alias("final_url"),
            F.when(F.col("resolved"), F.col("raw_hops")).alias("hops"),
            "resolved",
        )
    )
    return out


def apply_redirects(
    edges: DataFrame,
    resolved: DataFrame,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    url_col: str = "src_url",
) -> DataFrame:
    """Rewrite edge endpoints through a :func:`resolve_redirects`
    result: endpoints with a resolved final_url are replaced by it,
    unresolved redirect sources are DROPPED (their target is
    unknowable), non-redirecting URLs pass through. Output keeps the
    input columns."""
    res = resolved.select(
        F.col(url_col).alias("r_url"), "final_url", "resolved"
    )
    out = edges
    for col in (src_col, dst_col):
        out = (
            out.join(res.hint("shuffle_hash"), out[col] == res["r_url"], "left")
            .filter(F.col("resolved").isNull() | F.col("resolved"))
            .withColumn(col, F.coalesce("final_url", F.col(col)))
            .drop("r_url", "final_url", "resolved")
        )
    return out
