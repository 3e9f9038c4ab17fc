"""Deterministic Bloom filters — the crawl-frontier seen-set sketch.

A 10^12-row frontier cannot anti-join the full fetch history on every
scheduling pass; the standard crawler answer (Heritrix's "already
seen" structure, Broder & Mitzenmacher's survey) is a Bloom filter:
no false negatives (a URL the filter rejects is definitely unseen),
tunable false-positive rate, and union-by-OR so per-partition /
per-day filters merge associatively.

Same derandomized-hash idiom as ``graph/anf.py``'s FM sketches: bit
position ``i`` of item ``x`` is ``md5(x || '#' || i)``'s 60-bit
prefix mod ``n_bits`` (``F.conv(substr(md5, 1, 15), 16, 10)`` ↔
DuckDB ``CAST('0x' || substr(md5, 1, 15) AS BIGINT)``) — every bit is
reproducible cross-engine, cross-run, cross-partitioning, which is
what the ``bloom_urls`` oracle replays bit-for-bit.

Representation: ``n_bits/64`` BIGINT registers OR-merged by
codegen'd ``bit_or`` aggregates (map-side partial — the register
row shrinks to one row per group before the shuffle, so building a
filter over 10^12 items shuffles O(groups · registers), not items).
``bloom_might_contain`` broadcast-joins the register row(s) and
checks the k bits with pure bit arithmetic — no Python, no UDF.

Sizing: FPR ≈ (1 − e^{−k·n/m})^k; the helper ``bloom_fpr`` computes
the plug-in estimate from the built filter's popcount so callers can
alert when a filter saturates.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h60(col: Column, salt: int) -> Column:
    return F.conv(
        F.substring(
            F.md5(F.concat(col.cast("string"), F.lit(f"#{salt}"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def bloom_build(
    items: DataFrame,
    col: str,
    n_bits: int = 1024,
    k: int = 4,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build filter(s) → (group_cols…, regs array<long>, n_items).

    ``n_bits`` must be a multiple of 64. One filter per group (e.g.
    per crawl day / per shard) — filters for the same bit layout can
    later be merged with ``bloom_merge``.
    """
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    n_regs = n_bits // 64
    pos = [F.pmod(_h60(F.col(col), i), F.lit(n_bits)) for i in range(k)]
    # per-item register contribution: for each register r, OR of the
    # k bit values that land in r (an item may hit one register twice)
    reg_vals = [
        F.aggregate(
            F.array(
                *[
                    F.when(
                        (p / 64).cast("int") == r,
                        # shift by a COLUMN: F.shiftleft only takes a
                        # python int, call the SQL function directly
                        F.call_function(
                            "shiftleft",
                            F.lit(1).cast("long"),
                            F.pmod(p, F.lit(64)).cast("int"),
                        ),
                    ).otherwise(F.lit(0).cast("long"))
                    for p in pos
                ]
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc.bitwiseOR(x),
        ).alias(f"_b{r}")
        for r in range(n_regs)
    ]
    gcols = group_cols or []
    prepared = items.select(*gcols, *reg_vals)
    agg = [F.bit_or(f"_b{r}").alias(f"_r{r}") for r in range(n_regs)]
    agg.append(F.count(F.lit(1)).alias("n_items"))
    if gcols:
        built = prepared.groupBy(*gcols).agg(*agg)
    else:
        built = prepared.agg(*agg)
    return built.select(
        *gcols,
        F.array(*[F.coalesce(f"_r{r}", F.lit(0)) for r in range(n_regs)]).alias(
            "regs"
        ),
        "n_items",
    )


def bloom_merge(
    filters: DataFrame,
    n_bits: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union filters (same n_bits/k layout) by element-wise OR —
    associative, so daily filters roll up to monthly ones."""
    gcols = group_cols or []
    zero = F.array(
        *[F.lit(0).cast("long") for _ in range(n_bits // 64)]
    )
    return filters.groupBy(*gcols).agg(
        F.aggregate(
            F.collect_list("regs"),
            zero,
            lambda acc, x: F.zip_with(
                acc, x, lambda a, b: a.bitwiseOR(b)
            ),
        ).alias("regs"),
        F.sum("n_items").alias("n_items"),
    )


def bloom_might_contain(
    items: DataFrame,
    bloom: DataFrame,
    col: str,
    n_bits: int = 1024,
    k: int = 4,
    join_cols: list[str] | None = None,
) -> DataFrame:
    """items + ``might_contain`` boolean. ``bloom`` is one register
    row (or one per ``join_cols`` group). No false negatives:
    might_contain=False proves the item was not in the build set."""
    jcols = join_cols or []
    b = F.broadcast(bloom.select(*jcols, F.col("regs").alias("_regs")))
    joined = items.join(b, jcols) if jcols else items.crossJoin(b)
    cond: Column = F.lit(True)
    for i in range(k):
        p = F.pmod(_h60(F.col(col), i), F.lit(n_bits))
        reg = F.element_at("_regs", (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"),
            F.pmod(p, F.lit(64)).cast("int"),
        )
        cond = cond & (reg.bitwiseAND(bit) != 0)
    return joined.withColumn("might_contain", cond).drop("_regs")


def bloom_fpr(n_items: int, n_bits: int, k: int) -> float:
    """Plug-in false-positive estimate (1 − e^{−kn/m})^k."""
    return (1.0 - math.exp(-k * n_items / n_bits)) ** k
