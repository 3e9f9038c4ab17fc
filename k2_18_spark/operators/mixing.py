"""Training-data mixture sampling and sequence packing.

The last mile of an LLM data pipeline: after cleaning/dedup, the
corpus is (a) MIXED — each source/language stratum is up- or
down-sampled to its target weight (The Pile's per-set epochs, Dolma's
source mixing) — and (b) PACKED — documents are concatenated into
fixed-token-budget training sequences so no context window is wasted.

Both are deterministic here, in the engine's hash idiom:

- ``stratified_sample``: a doc's inclusion draw is the 60-bit hex
  prefix of ``md5(seed | id)`` compared against a per-stratum
  threshold literal (``frac · 16^15`` in hex, computed at plan build).
  A rate of 2.3 yields 2 guaranteed copies plus a third for the 30%
  of ids whose draw lands under the threshold — expected copies =
  rate, exactly reproducible, no RNG state, and replicable in any
  engine that can compare strings (the driver oracle embeds the SAME
  hex literal). Copies carry a ``copy`` index so downstream shuffles
  can decorrelate them.
- ``pack_sequences``: exact greedy packing — docs are ordered
  deterministically (by id within each ``part_col`` group) and
  accumulated first-fit: a doc starts a new sequence exactly when
  adding it would exceed the budget, so NO sequence overfills (an
  oversized doc occupies one alone). The running reset-cumsum is
  inherently sequential, which no window function expresses — this
  is the one op in the module that drops to ``applyInPandas``
  (Arrow-batched, one pass per group; partition keys — shard,
  language, date — bound each group, so groups pack in parallel and
  nothing is sequential ACROSS groups). The driver oracle replays the
  same recurrence as a row-per-step recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _draw(id_col: Column, seed: str) -> Column:
    """15-hex-char (60-bit) uniform draw string for an id."""
    return F.substring(
        F.md5(
            F.encode(
                F.concat_ws("|", F.lit(seed), id_col.cast("string")), "UTF-8"
            )
        ),
        1,
        15,
    )


def _threshold_hex(frac: float) -> str:
    """Hex literal t such that P(draw < t) = frac for a uniform
    60-bit draw. frac >= 1 returns 'g', which sorts above every
    15-char hex draw — format(16**15) would be a 16-char string
    starting '1' and lexicographically drop ~15/16 of draws."""
    if frac >= 1.0:
        return "g"
    return format(int(max(frac, 0.0) * (16 ** 15)), "015x")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum resampling → input rows replicated
    ``⌊rate⌋ (+1 with prob rate-⌊rate⌋)`` times, with a ``copy``
    index column (0-based). Rows in strata absent from ``rates`` use
    ``default_rate``; rate 0 drops the stratum."""
    whole = F.lit(None).cast("int")
    frac_t = F.lit(None).cast("string")
    for name, rate in rates.items():
        whole = F.when(F.col(strata_col) == name, int(rate)).otherwise(whole)
        frac_t = F.when(
            F.col(strata_col) == name, _threshold_hex(rate - int(rate))
        ).otherwise(frac_t)
    whole = F.coalesce(whole, F.lit(int(default_rate)))
    frac_t = F.coalesce(
        frac_t, F.lit(_threshold_hex(default_rate - int(default_rate)))
    )

    n_copies = whole + (
        _draw(F.col(id_col), seed) < frac_t
    ).cast("int")
    return (
        docs.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(0), F.col("_n") - 1))
        )
        .drop("_n")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    part_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact greedy first-fit packing → one row per training sequence
    (part, seq_id, n_docs, n_tokens, doc_ids '>'-joined in pack
    order). No sequence exceeds ``budget`` unless a single doc does;
    seq_id is 0-based per partition key."""
    import pandas as pd

    key = part_col or "_part"
    sel = docs.select(
        (
            F.col(part_col).cast("string") if part_col else F.lit("all")
        ).alias(key),
        F.col(id_col).alias("_id"),
        F.col(token_col).cast("long").alias("_t"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        part = pdf[key].iloc[0]
        rows, acc, seq, ids, tok = [], 0, 0, [], 0
        for _id, t in zip(pdf["_id"], pdf["_t"]):
            t = int(t)
            if ids and acc + t > budget:
                rows.append((part, seq, len(ids), tok, ">".join(ids)))
                seq, acc, ids, tok = seq + 1, 0, [], 0
            acc += t
            tok += t
            ids.append(str(_id))
        if ids:
            rows.append((part, seq, len(ids), tok, ">".join(ids)))
        return pd.DataFrame(
            rows, columns=[key, "seq_id", "n_docs", "n_tokens", "doc_ids"]
        )

    return sel.groupBy(key).applyInPandas(
        pack,
        schema=f"{key} string, seq_id long, n_docs long, n_tokens long,"
        " doc_ids string",
    )


def priority_sample(
    df: DataFrame,
    k: int,
    strata_cols: list[str] | None = None,
    seed: str = "psample",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-k uniform sampling without replacement, deterministic —
    the complement of ``stratified_sample`` (rate-based, expected
    size): keep exactly min(k, |stratum|) rows per stratum, chosen by
    ``md5(seed | id)`` priority order with the id as tie-break.

    Priority sampling by a uniform hash IS a uniform sample without
    replacement (every id's draw is i.i.d. uniform over the hex
    space), and — the property that matters for corpus curation —
    it is STABLE: adding or removing other rows never changes whether
    a surviving row would have been picked among its priority
    predecessors, and re-runs pick byte-identical samples.

    Scale shape: one window over the strata key (a single hash
    partitioning); rank truncation at k means the sort can use a
    per-partition top-k heap (Spark's WindowGroupLimit pushes the
    rank filter down since 3.5). Replayable in any engine with
    row_number.
    """
    pri = F.md5(
        F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))
    )
    from pyspark.sql import Window

    part = strata_cols or []
    w = (
        Window.partitionBy(*part).orderBy(pri, F.col(id_col))
        if part
        else Window.partitionBy(F.lit(1)).orderBy(pri, F.col(id_col))
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
